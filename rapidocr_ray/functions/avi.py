"""Minimal AVI (RIFF) MJPEG demuxer, from the public AVI RIFF form
spec (Microsoft "AVI RIFF File Reference" / OpenDML): RIFF('AVI '
LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' ##dc...)).

The frame WALK is a pure header scan (fourcc + size per chunk — the
temporal-sampling contract of ``frame_scan_sample``); sampled frames
decode through the in-repo from-scratch baseline/progressive JPEG
decoder (``functions/jpeg.py``), so MJPEG-in-AVI is a REAL decode path
with no external codec dependency.  Non-MJPG video streams raise a
typed ``NotImplementedError`` naming the fourcc (the ffmpeg-scope
contract); structural corruption raises ``ValueError``.

A deterministic fixture muxer (``encode_avi_mjpeg``) plays the same
role as the other codec fixture encoders: goldens + registry oracle
synthesis (reference decodes crawl media via cv2 —
python/rapidocr_onnxruntime/utils.py:94-152; this module replaces that
for AVI containers).
"""

from __future__ import annotations

import struct

import numpy as np

from rapidocr_ray.functions.jpeg import decode_jpeg, encode_jpeg


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def _subchunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for the chunk run in
    data[pos:end]; chunks are word-aligned per RIFF."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("avi: truncated chunk body")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def avi_scan(payload: bytes) -> tuple[str, list[tuple[int, int]]]:
    """Header-only walk: -> (video codec fourcc, [(frame_off,
    frame_size), ...]) for the FIRST video ('vids') stream.  No frame
    bytes are touched — O(#chunks) regardless of frame size."""
    if not is_avi(payload):
        raise ValueError("avi: bad RIFF/AVI signature")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)
    handler = None
    stream_no = -1
    movi = None
    n_streams = 0
    for fourcc, body, size in _subchunks(payload, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = payload[body:body + 4]
        if ltype == b"hdrl":
            for sub, sbody, ssize in _subchunks(payload, body + 4, body + size):
                if sub == b"LIST" and payload[sbody:sbody + 4] == b"strl":
                    this_stream = n_streams
                    n_streams += 1
                    for s2, b2, z2 in _subchunks(
                        payload, sbody + 4, sbody + ssize
                    ):
                        if s2 == b"strh" and z2 >= 8:
                            fcc_type = payload[b2:b2 + 4]
                            if fcc_type == b"vids" and handler is None:
                                handler = payload[b2 + 4:b2 + 8]
                                stream_no = this_stream
        elif ltype == b"movi":
            movi = (body + 4, body + size)
    if handler is None:
        raise ValueError("avi: no video stream (vids strh) found")
    if movi is None:
        raise ValueError("avi: missing movi list")
    want = b"%02d" % stream_no
    frames = []
    for fourcc, body, size in _subchunks(payload, movi[0], movi[1]):
        if fourcc[:2] == want and fourcc[2:4] in (b"dc", b"db"):
            frames.append((body, size))
    codec = handler.decode("ascii", "replace").strip("\x00 ").upper() or "RAW"
    return codec, frames


def avi_frame_scan_sample(
    payload: bytes, every_k: int = 2, _decode=None
) -> tuple[int, list[np.ndarray]]:
    """Temporal sampling over an AVI: header-walk every frame chunk,
    DECODE only every k-th (the ``frame_scan_sample`` contract).
    Returns (total_frame_count, sampled gray frames)."""
    codec, frames = avi_scan(payload)
    if codec not in ("MJPG", "MJPEG"):
        raise NotImplementedError(
            f"avi: codec {codec} unavailable (only MJPG decodes)"
        )
    decode = _decode or decode_jpeg
    sampled = []
    for i, (off, size) in enumerate(frames):
        # every frame is marker-validated even when skipped (the RBMP
        # header-scan rule: a corrupt non-sampled frame is a typed
        # error row, never silently-wrong stats)
        if payload[off:off + 3] != b"\xff\xd8\xff":
            raise ValueError("avi: MJPG frame without JPEG SOI marker")
        if i % every_k == 0:
            sampled.append(decode(payload[off:off + size]))
    return len(frames), sampled


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 100
) -> bytes:
    """Deterministic fixture muxer: (h, w) uint8 gray frames -> a
    minimal spec-correct AVI with one MJPG 'vids' stream.  At
    quality=100 (all-ones quant table), 8x8-block-constant frames
    round-trip bit-exactly through the JPEG path — the property the
    registry oracle builds on."""
    if not frames:
        raise ValueError("avi: need at least one frame")
    h, w = frames[0].shape
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec_per_frame = 1_000_000 // max(1, fps)
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        usec_per_frame, max_bytes * fps, 0, 0,  # flags 0: no idx1 chunk
        len(jpegs), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpegs), max_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
