"""Baseline JPEG codec in pure numpy (ITU-T T.81 sequential DCT,
huffman coding) — closes the last codec stub in this environment.

Decoder: SOF0/SOF1 (baseline/extended sequential huffman), 8-bit
samples, grayscale or YCbCr with sampling factors 1-2 (replicated
chroma upsample), restart intervals, multi-table DQT/DHT.  All huffman
and quantization tables are read FROM THE STREAM (nothing built-in is
assumed about the file).  Progressive (SOF2), arithmetic coding and
12-bit precision raise typed ``NotImplementedError``.

Encoder: single-component (grayscale) baseline with the Annex-K-style
luminance quantization table and canonical huffman tables derived from
the embedded counts/values (validity is asserted at import; round-trip
correctness depends only on the tables being a valid prefix code, which
the decoder reads back from the stream).  Quality maps to table scaling
the way libjpeg does (5000/q below 50, 200-2q above); quality 100
yields an all-ones table, i.e. only DCT rounding error.

The IDCT/FDCT are exact float64 separable transforms (one einsum over
all blocks of a component — no per-pixel python).

Reference path parity: the reference loads JPEG via PIL
(python/rapidocr_onnxruntime/utils.py:113-126); output here is the
grayscale collapse used by every other codec in this engine
(functions/codecs.py luma rules).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared transform pieces
# ---------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis M[u, x]; IDCT is M.T @ F @ M."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return m


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks -> (n, 8, 8) samples
    (still level-shifted around 0)."""
    m = _dct_matrix()
    return np.einsum("ux,nuv,vy->nxy", m, coefs, m, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    m = _dct_matrix()
    return np.einsum("ux,nxy,vy->nuv", m, blocks, m, optimize=True)


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude-category decode."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers terminate the current interval."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"jpeg: unexpected marker 0x{nxt:02x} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align_and_skip_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise ValueError("jpeg: expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _Huffman:
    """Canonical huffman decode table from DHT counts + values."""

    def __init__(self, counts: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("jpeg: invalid huffman code")


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB uint8 -> (h, w) uint8 with cv2's exact BGR2GRAY
    fixed-point luma.  This is the engine's ONE definition — codecs.py
    re-exports it (the dependency direction is codecs -> jpeg, so
    defining it here keeps the modules cycle-free)."""
    r = rgb[:, :, 0].astype(np.uint32)
    g = rgb[:, :, 1].astype(np.uint32)
    b = rgb[:, :, 2].astype(np.uint32)
    return ((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w) grayscale uint8 (single-component scans
    return the Y plane; YCbCr collapses through the engine's luma).
    Truncated / corrupt streams raise ValueError (LoadImageError
    analog); unsupported coding modes raise NotImplementedError."""
    try:
        return _decode_jpeg(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"jpeg: truncated or corrupt stream ({exc})") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        while data[pos + 1] == 0xFF:  # fill bytes before a marker
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1:i + 17])
                n = sum(counts)
                values = seg[i + 17:i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huffman(counts, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError(f"jpeg: {prec}-bit precision unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("jpeg: progressive (SOF2) unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF marker 0x{marker:02x} unsupported (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0x0F))
            planes = _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
            return _planes_to_gray(planes, frame, rgb_to_gray)
        pos += seglen
    raise ValueError("jpeg: no scan found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    store = {}
    for comp, _, _ in scan:
        bw = mcus_x * comp["h"]
        bh = mcus_y * comp["v"]
        store[comp["id"]] = {
            "coef": np.zeros((bh * bw, 8, 8), dtype=np.float64),
            "bw": bw,
            "pred": 0,
        }
    br = _BitReader(data, pos)
    n_mcu = mcus_x * mcus_y
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            br.byte_align_and_skip_restart()
            for comp, _, _ in scan:
                store[comp["id"]]["pred"] = 0
        my, mx = divmod(mcu, mcus_x)
        try:
            for comp, dc_id, ac_id in scan:
                st = store[comp["id"]]
                q = qt[comp["tq"]]
                dc_t, ac_t = huff_dc[dc_id], huff_ac[ac_id]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        size = dc_t.decode(br)
                        diff = _extend(br.read_bits(size), size)
                        st["pred"] += diff
                        zz[0] = st["pred"]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZIGZAG] = zz * q
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        st["coef"][row * st["bw"] + col] = blk.reshape(8, 8)
        except _RestartMarker:
            raise ValueError("jpeg: restart marker inside MCU")
    planes = {}
    for comp, _, _ in scan:
        st = store[comp["id"]]
        px = _idct_blocks(st["coef"]) + 128.0
        bh = st["coef"].shape[0] // st["bw"]
        grid = px.reshape(bh, st["bw"], 8, 8).transpose(0, 2, 1, 3)
        plane = np.clip(np.rint(grid.reshape(bh * 8, st["bw"] * 8)), 0, 255)
        planes[comp["id"]] = (plane.astype(np.uint8), comp)
    return planes


def _planes_to_gray(planes, frame, rgb_to_gray):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(planes) == 1:
        plane, _comp = next(iter(planes.values()))
        return plane[:h, :w]
    if len(planes) != 3:
        raise NotImplementedError("jpeg: only 1- or 3-component scans")
    full = []
    for cid, (plane, comp) in planes.items():
        plane = np.repeat(plane, vmax // comp["v"], axis=0)
        plane = np.repeat(plane, hmax // comp["h"], axis=1)
        full.append(plane[:h, :w].astype(np.float64))
    y, cb, cr = full  # component order as in SOF
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.rint(np.dstack([r, g, b])), 0, 255).astype(np.uint8)
    return rgb_to_gray(rgb)


# ---------------------------------------------------------------------------
# encoder (grayscale baseline)
# ---------------------------------------------------------------------------

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALUES = bytes(range(12))
_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALUES = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)
assert sum(_DC_COUNTS) == len(_DC_VALUES)
assert sum(_AC_COUNTS) == len(_AC_VALUES)


def _canonical_codes(counts: list[int], values: bytes) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w) grayscale uint8 -> baseline JPEG bytes (one component,
    no subsampling).  quality 100 => all-ones quant table."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    scale = 5000 // max(1, quality) if quality < 50 else 200 - 2 * quality
    # _Q_LUMA is in natural (row-major) order; DQT stores zigzag order
    q_nat = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255).astype(np.int64)
    q_zig = q_nat[_ZIGZAG]
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(img, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ).astype(np.float64) - 128.0
    coef = _fdct_blocks(blocks)
    quant = np.rint(coef / q_nat.reshape(8, 8)).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, _ZIGZAG]

    dc_codes = _canonical_codes(_DC_COUNTS, _DC_VALUES)
    ac_codes = _canonical_codes(_AC_COUNTS, _AC_VALUES)
    bwr = _BitWriter()
    pred = 0
    for blk in zz:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        size = _category(diff)
        length, code = dc_codes[size]
        bwr.write(length, code)
        if size:
            bwr.write(size, diff if diff >= 0 else diff + (1 << size) - 1)
        run = 0
        last_nz = np.flatnonzero(blk[1:])
        last = (last_nz[-1] + 1) if len(last_nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_codes[0xF0]
                bwr.write(length, code)
                run -= 16
            size = _category(v)
            length, code = ac_codes[(run << 4) | size]
            bwr.write(length, code)
            bwr.write(size, v if v >= 0 else v + (1 << size) - 1)
            run = 0
        if last < 63:
            length, code = ac_codes[0x00]
            bwr.write(length, code)
    bwr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = [b"\xff\xd8"]
    out.append(seg(0xDB, b"\x00" + q_zig.astype(np.uint8).tobytes()))
    out.append(seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])))
    out.append(seg(0xC4, bytes([0x00] + _DC_COUNTS) + _DC_VALUES))
    out.append(seg(0xC4, bytes([0x10] + _AC_COUNTS) + _AC_VALUES))
    out.append(seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])))
    out.append(bytes(bwr.out))
    out.append(b"\xff\xd9")
    return b"".join(out)
