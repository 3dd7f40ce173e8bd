"""Multimodal stages: real RBMP decode, stubbed real-world codecs,
actor-pool plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from rapidocr_ray import glyphs
from rapidocr_ray.stages.multimodal import decode_image


def test_decode_rbmp_real():
    img = glyphs.render_page(["hello"], margin=8)
    out = decode_image(glyphs.encode_rbmp(img))
    assert (out == img).all()


def test_real_codecs_decode_and_audio_stubbed():
    with pytest.raises(NotImplementedError, match="riff"):
        decode_image(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="jpeg"):
        decode_image(b"\xff\xd8\xff\xe0rest")  # truncated -> typed error
    with pytest.raises(ValueError, match="png"):
        decode_image(b"\x89PNGrest")  # corrupt signature -> typed error
    with pytest.raises(ValueError):
        decode_image(b"garbage")
    from rapidocr_ray.functions.codecs import encode_bmp, encode_gif, encode_png

    img = glyphs.render_page(["abc"], margin=8)
    for enc in (encode_png, encode_gif, encode_bmp):
        assert (decode_image(enc(img)) == img).all()


@pytest.fixture()
def mixed_ds(ray_session):
    import ray.data

    img = glyphs.render_page(["some text line"], margin=8)
    tbl = pa.table(
        {
            "url": ["a", "b", "c"],
            "html": [glyphs.encode_rbmp(img), b"\x89PNGxx", b""],
        }
    )
    return ray.data.from_arrow(tbl), img


def test_metadata_pipeline(mixed_ds):
    from rapidocr_ray.stages.multimodal import image_metadata_pipeline

    ds, img = mixed_ds
    out = image_metadata_pipeline(ds).to_pandas().set_index("url")
    assert out.loc["a", "decode_ok"]
    assert out.loc["a", "height"] == img.shape[0]
    assert out.loc["a", "width"] == img.shape[1]
    assert not out.loc["b", "decode_ok"]
    assert "png" in out.loc["b", "decode_err"]
    assert not out.loc["c", "decode_ok"]


def test_feature_pipeline(mixed_ds):
    from rapidocr_ray.stages.multimodal import ImageFeatureStage, image_feature_pipeline

    ds, img = mixed_ds
    rows = {r["url"]: r for r in image_feature_pipeline(ds).take_all()}
    feats = np.asarray(rows["a"]["features"])
    assert feats.shape == (2 * ImageFeatureStage.N_BINS,)
    assert np.isfinite(feats).all()
    assert feats.sum() == pytest.approx(2.0, abs=1e-5)  # two normalized profiles
    assert rows["b"]["features"] is None


def test_wav_decode_roundtrip():
    from rapidocr_ray.functions.codecs import decode_wav, encode_wav

    t = np.linspace(0, 1, 8000, endpoint=False)
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mono, rate, n_ch = decode_wav(encode_wav(sig, 8000))
    assert rate == 8000 and n_ch == 1
    assert mono.shape == sig.shape
    assert np.abs(mono - sig).max() < 1e-3  # 16-bit quantization

    # stereo downmix by mean
    stereo = np.stack([sig, -sig], axis=1)
    mono2, rate2, n_ch2 = decode_wav(encode_wav(stereo, 8000, n_channels=2))
    assert n_ch2 == 2 and np.abs(mono2).max() < 1e-3


def test_wav_typed_errors():
    from rapidocr_ray.functions.codecs import decode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio")
    # valid RIFF/WAVE but an mp3-in-RIFF tag (0x55): typed stub
    import struct as _s

    fmt = _s.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 0)
    body = (
        b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"data" + _s.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    data = b"RIFF" + _s.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="format tag 85"):
        decode_wav(data)


_IMA_STEP_REF = None


def _ima_tables():
    from rapidocr_ray.functions.codecs import _IMA_INDEX, _IMA_STEP

    return _IMA_STEP, _IMA_INDEX


def _ima_enc_step(sample, pred, idx, step_t, index_t):
    """Scalar reference IMA ADPCM encoder step (public-spec algorithm)."""
    step = int(step_t[idx])
    delta = int(sample) - pred
    nib = 0
    if delta < 0:
        nib = 8
        delta = -delta
    if delta >= step:
        nib |= 4
        delta -= step
    if delta >= step >> 1:
        nib |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nib |= 1
    diff = step >> 3
    if nib & 4:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step
    pred = max(-32768, min(32767, pred + (-diff if nib & 8 else diff)))
    idx = max(0, min(88, idx + int(index_t[nib & 7])))
    return nib, pred, idx


def _ima_dec_step(nib, pred, idx, step_t, index_t):
    """Scalar reference decoder step (mirrors the spec, independent of
    the vectorized implementation under test)."""
    step = int(step_t[idx])
    diff = step >> 3
    if nib & 4:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step
    pred = max(-32768, min(32767, pred + (-diff if nib & 8 else diff)))
    idx = max(0, min(88, idx + int(index_t[nib & 7])))
    return pred, idx


def _ima_encode_mono(samples, block_align):
    """Encode int16 mono samples into IMA ADPCM data-chunk bytes and a
    scalar-decoded reference, block layout per the WAVE spec."""
    import struct as _s

    step_t, index_t = _ima_tables()
    per_block = (block_align - 4) * 2 + 1
    assert len(samples) % per_block == 0
    data = bytearray()
    ref = []
    idx = 0
    for b0 in range(0, len(samples), per_block):
        block = samples[b0:b0 + per_block]
        pred = int(block[0])
        data += _s.pack("<hBB", pred, idx, 0)
        ref.append(pred)
        nibs = []
        for s in block[1:]:
            nib, pred, idx = _ima_enc_step(s, pred, idx, step_t, index_t)
            nibs.append(nib)
            ref.append(pred)
        for i in range(0, len(nibs), 2):
            data.append(nibs[i] | (nibs[i + 1] << 4))
    return bytes(data), np.array(ref, dtype=np.int16)


def _wav_container(fmt_tag, n_ch, rate, block_align, bits, data, fact_frames=None):
    import struct as _s

    fmt = _s.pack("<HHIIHH", fmt_tag, n_ch, rate, rate, block_align, bits)
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
    if fact_frames is not None:
        body += b"fact" + _s.pack("<I", 4) + _s.pack("<I", fact_frames)
    body += b"data" + _s.pack("<I", len(data)) + data
    return b"RIFF" + _s.pack("<I", len(body)) + body


def test_ima_adpcm_mono_bit_exact_vs_scalar_reference():
    """The vectorized-across-blocks decoder reproduces the scalar
    public-spec reference decode bit-for-bit over multiple blocks of a
    noisy signal, and tracks the original within quantization error."""
    from rapidocr_ray.functions.codecs import decode_wav

    rng = np.random.RandomState(5)
    block_align = 36  # 65 samples/block
    per_block = (block_align - 4) * 2 + 1
    t = np.arange(per_block * 6)
    sig = (
        8000 * np.sin(2 * np.pi * t / 50) + rng.randint(-500, 500, len(t))
    ).astype(np.int16)
    data, ref = _ima_encode_mono(sig, block_align)
    wav = _wav_container(0x11, 1, 8000, block_align, 4, data)
    mono, rate, n_ch = decode_wav(wav)
    assert rate == 8000 and n_ch == 1
    got = np.round(mono * 32768.0).astype(np.int16)
    assert np.array_equal(got, ref)  # bit-exact vs scalar reference
    # steady-state tracking stays tight; the first ~16 samples ramp the
    # step index from 0 against a steep sine (inherent ADPCM attack)
    assert np.abs(got.astype(np.int32) - sig.astype(np.int32))[16:].max() < 2500


def test_ima_adpcm_stereo_interleave_and_fact_trim():
    """Stereo 4-byte group round-robin: each channel decodes to its own
    scalar reference; the downmix is their exact mean; a fact chunk
    trims trailing frames."""
    import struct as _s

    from rapidocr_ray.functions.codecs import decode_wav

    step_t, index_t = _ima_tables()
    rng = np.random.RandomState(9)
    frames_per_block = 65  # header + 64 nibbles per channel
    n_blocks = 3
    n = frames_per_block * n_blocks
    left = (6000 * np.sin(2 * np.pi * np.arange(n) / 40)).astype(np.int16)
    right = rng.randint(-7000, 7000, n).astype(np.int16)
    data = bytearray()
    refs = {0: [], 1: []}
    state = {0: 0, 1: 0}  # step index per channel
    for b0 in range(0, n, frames_per_block):
        preds = {}
        for c, sig in ((0, left), (1, right)):
            preds[c] = int(sig[b0])
            data += _s.pack("<hBB", preds[c], state[c], 0)
            refs[c].append(preds[c])
        nibs = {0: [], 1: []}
        for c, sig in ((0, left), (1, right)):
            pred, idx = preds[c], state[c]
            for s in sig[b0 + 1:b0 + frames_per_block]:
                nib, pred, idx = _ima_enc_step(s, pred, idx, step_t, index_t)
                nibs[c].append(nib)
                refs[c].append(pred)
            state[c] = idx
        for g in range(0, len(nibs[0]), 8):
            for c in (0, 1):
                for i in range(g, g + 8, 2):
                    data.append(nibs[c][i] | (nibs[c][i + 1] << 4))
    block_align = 8 + (frames_per_block - 1)  # 2 headers + 64 nib-pairs/2 *2ch
    n_keep = n - 5
    wav = _wav_container(0x11, 2, 16000, block_align, 4, bytes(data), fact_frames=n_keep)
    mono, rate, n_ch = decode_wav(wav)
    assert rate == 16000 and n_ch == 2 and len(mono) == n_keep
    want = (
        np.stack([np.array(refs[0]), np.array(refs[1])], axis=1)[:n_keep]
        .astype(np.float32)
        .mean(axis=1)
        / 32768.0
    )
    assert np.allclose(mono, want, atol=0)


def test_ima_adpcm_typed_errors():
    """Corrupt ADPCM payloads raise typed ValueError; MS ADPCM (tag 2)
    stays the named stub; odd bit width stays a named stub."""
    from rapidocr_ray.functions.codecs import decode_wav

    with pytest.raises(ValueError, match="block_align"):
        decode_wav(_wav_container(0x11, 1, 8000, 7, 4, b"\x00" * 14))
    with pytest.raises(ValueError, match="shorter than one block"):
        decode_wav(_wav_container(0x11, 1, 8000, 36, 4, b"\x00" * 10))
    bad_idx = b"\x00\x00\x60\x00" + b"\x00" * 32  # step index 96 > 88
    with pytest.raises(ValueError, match="step index"):
        decode_wav(_wav_container(0x11, 1, 8000, 36, 4, bad_idx))
    with pytest.raises(NotImplementedError, match="IMA ADPCM with 8-bit"):
        decode_wav(_wav_container(0x11, 1, 8000, 36, 8, b"\x00" * 36))


def _tile_frames(n, seed=0):
    rng = np.random.RandomState(seed)
    frames = []
    for _ in range(n):
        tiles = rng.randint(0, 256, (2, 3), dtype=np.uint8)
        frames.append(np.kron(tiles, np.ones((8, 8), dtype=np.uint8)))
    return frames


def test_g711_decode_reference_values_and_roundtrip():
    """mu-law / A-law (WAVE tags 7/6): decode tables match the
    published G.711 reference points (mu 0xFF -> 0, full-scale
    +/-32124; A-law 0xD5 -> 8, full-scale +/-32256), codes are
    sign-symmetric, and a wav container decodes through the table."""
    from rapidocr_ray.functions.codecs import _ALAW_TABLE, _ULAW_TABLE, decode_wav

    assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x00] == -32124
    assert _ULAW_TABLE[0x80] == 32124
    assert _ALAW_TABLE[0xD5] == 8 and _ALAW_TABLE[0x2A] == -32256
    for b in range(256):
        assert _ULAW_TABLE[b] == -_ULAW_TABLE[b ^ 0x80]
        assert _ALAW_TABLE[b] == -_ALAW_TABLE[b ^ 0x80]
    codes = bytes(range(256))
    mono, rate, n_ch = decode_wav(_wav_container(7, 1, 8000, 1, 8, codes))
    assert rate == 8000 and n_ch == 1
    assert np.array_equal(
        np.round(mono * 32768.0).astype(np.int16), _ULAW_TABLE[np.arange(256)]
    )
    mono_a, _, _ = decode_wav(_wav_container(6, 1, 8000, 1, 8, codes))
    assert np.array_equal(
        np.round(mono_a * 32768.0).astype(np.int16), _ALAW_TABLE[np.arange(256)]
    )


def _ms_ref_decode_mono(raw, block_align):
    """Scalar reference MS ADPCM decoder (spec pseudo-code, independent
    of the vectorized implementation)."""
    import struct as _s

    from rapidocr_ray.functions.codecs import _MS_ADAPT, _MS_COEF1, _MS_COEF2

    def trunc256(x):
        return x // 256 if x >= 0 else -((-x) // 256)

    out = []
    for b0 in range(0, len(raw) - len(raw) % block_align, block_align):
        blk = raw[b0:b0 + block_align]
        pred = blk[0]
        delta, s1, s2 = _s.unpack_from("<hhh", blk, 1)
        c1, c2 = int(_MS_COEF1[pred]), int(_MS_COEF2[pred])
        out += [s2, s1]
        for byte in blk[7:]:
            for n in (byte >> 4, byte & 0x0F):
                p = trunc256(s1 * c1 + s2 * c2)
                signed = n if n < 8 else n - 16
                samp = max(-32768, min(32767, p + signed * delta))
                s2, s1 = s1, samp
                delta = max(16, trunc256(int(_MS_ADAPT[n]) * delta))
                out.append(samp)
    return np.array(out, dtype=np.int16)


def test_ms_adpcm_mono_bit_exact_vs_scalar_reference():
    """MS ADPCM (tag 2 — previously the named stub): the vectorized
    decoder matches the scalar spec reference bit-for-bit over multiple
    blocks encoded with a simple predictor-0 quantizer."""
    import struct as _s

    from rapidocr_ray.functions.codecs import _MS_ADAPT, decode_wav

    def trunc256(x):
        return x // 256 if x >= 0 else -((-x) // 256)

    rng = np.random.RandomState(13)
    block_align = 32  # 2 + 50 samples per block
    per_block = 2 + (block_align - 7) * 2
    sig = (
        7000 * np.sin(2 * np.pi * np.arange(per_block * 4) / 60)
        + rng.randint(-300, 300, per_block * 4)
    ).astype(np.int16)
    data = bytearray()
    for b0 in range(0, len(sig), per_block):
        blk = sig[b0:b0 + per_block]
        s2, s1 = int(blk[0]), int(blk[1])
        delta = 128
        data += _s.pack("<Bhhh", 0, delta, s1, s2)  # predictor 0: coef 256/0
        nibs = []
        for s in blk[2:]:
            p = trunc256(s1 * 256)
            n = max(-8, min(7, int(round((int(s) - p) / delta)))) & 0x0F
            signed = n if n < 8 else n - 16
            samp = max(-32768, min(32767, p + signed * delta))
            s2, s1 = s1, samp
            delta = max(16, trunc256(int(_MS_ADAPT[n]) * delta))
            nibs.append(n)
        for i in range(0, len(nibs), 2):
            data.append((nibs[i] << 4) | nibs[i + 1])
    wav = _wav_container(2, 1, 8000, block_align, 4, bytes(data))
    mono, rate, n_ch = decode_wav(wav)
    got = np.round(mono * 32768.0).astype(np.int16)
    ref = _ms_ref_decode_mono(bytes(data), block_align)
    assert np.array_equal(got, ref)
    # the predictor-0 quantizer tracks the signal reasonably
    assert np.abs(got.astype(np.int32) - sig.astype(np.int32)).max() < 4000


def test_ms_adpcm_stereo_alternating_nibbles():
    """Stereo MS ADPCM: nibbles alternate channels per sample frame
    (high=left, low=right); the vectorized decoder matches a scalar
    two-state reference bit-for-bit and yields the full frame count
    (a half-length regression here means the channel loop is eating
    the nibble budget)."""
    import struct as _s

    from rapidocr_ray.functions.codecs import _MS_ADAPT, decode_wav

    def trunc256(x):
        return x // 256 if x >= 0 else -((-x) // 256)

    rng = np.random.RandomState(17)
    block_align = 32  # 14-byte stereo header + 18 data bytes
    frames_per_block = 2 + (block_align - 14) * 2 // 2
    n = frames_per_block * 3
    left = (5000 * np.sin(2 * np.pi * np.arange(n) / 30)).astype(np.int16)
    right = rng.randint(-6000, 6000, n).astype(np.int16)
    data = bytearray()
    ref = {0: [], 1: []}
    for b0 in range(0, n, frames_per_block):
        st = {}
        for c, sig in ((0, left), (1, right)):
            st[c] = {"s2": int(sig[b0]), "s1": int(sig[b0 + 1]), "d": 96}
        data += _s.pack("<BB", 0, 0)  # predictor 0 both channels
        data += _s.pack("<hh", st[0]["d"], st[1]["d"])
        data += _s.pack("<hh", st[0]["s1"], st[1]["s1"])
        data += _s.pack("<hh", st[0]["s2"], st[1]["s2"])
        for c in (0, 1):
            ref[c] += [st[c]["s2"], st[c]["s1"]]
        nibs = []
        for f in range(2, frames_per_block):
            for c, sig in ((0, left), (1, right)):
                s = st[c]
                p = trunc256(s["s1"] * 256)  # coef 256/0
                nv = max(-8, min(7, int(round((int(sig[b0 + f]) - p) / s["d"])))) & 0x0F
                signed = nv if nv < 8 else nv - 16
                samp = max(-32768, min(32767, p + signed * s["d"]))
                s["s2"], s["s1"] = s["s1"], samp
                s["d"] = max(16, trunc256(int(_MS_ADAPT[nv]) * s["d"]))
                nibs.append(nv)
                ref[c].append(samp)
        for i in range(0, len(nibs), 2):
            data.append((nibs[i] << 4) | nibs[i + 1])
    wav = _wav_container(2, 2, 8000, block_align, 4, bytes(data))
    mono, rate, n_ch = decode_wav(wav)
    assert n_ch == 2 and len(mono) == n  # full frame count, not half
    want = (
        np.stack([np.array(ref[0]), np.array(ref[1])], axis=1)
        .astype(np.float32)
        .mean(axis=1)
        / 32768.0
    )
    assert np.allclose(mono, want, atol=0)


def test_avi_skipped_frame_corruption_is_typed():
    """A corrupt SOI on a NON-sampled frame still raises the typed
    ValueError (the RBMP header-scan rule)."""
    from rapidocr_ray.functions.avi import avi_frame_scan_sample, encode_avi_mjpeg

    avi = encode_avi_mjpeg(_tile_frames(4), quality=100)
    # corrupt the SECOND frame's SOI (skipped at every_k=2)
    first = avi.find(b"\xff\xd8\xff")
    second = avi.find(b"\xff\xd8\xff", first + 3)
    bad = bytearray(avi)
    bad[second:second + 3] = b"\x00\x00\x00"
    with pytest.raises(ValueError, match="SOI"):
        avi_frame_scan_sample(bytes(bad), every_k=2)


def test_ms_adpcm_typed_errors():
    from rapidocr_ray.functions.codecs import decode_wav

    with pytest.raises(ValueError, match="block_align"):
        decode_wav(_wav_container(2, 1, 8000, 7, 4, b"\x00" * 14))
    with pytest.raises(ValueError, match="predictor index"):
        decode_wav(_wav_container(2, 1, 8000, 32, 4, b"\x09" + b"\x00" * 31))
    with pytest.raises(NotImplementedError, match="MS ADPCM with 8-bit"):
        decode_wav(_wav_container(2, 1, 8000, 32, 8, b"\x00" * 32))


def test_avi_mjpeg_roundtrip_and_sampling():
    """Mux -> demux: block-constant frames at quality=100 round-trip
    bit-exactly; every-k sampling decodes exactly the sampled indices."""
    from rapidocr_ray.functions.avi import (
        avi_frame_scan_sample,
        avi_scan,
        encode_avi_mjpeg,
    )

    frames = _tile_frames(7)
    avi = encode_avi_mjpeg(frames, quality=100)
    codec, spans = avi_scan(avi)
    assert codec == "MJPG" and len(spans) == 7
    total, sampled = avi_frame_scan_sample(avi, every_k=3)
    assert total == 7 and len(sampled) == 3
    for i, s in enumerate(sampled):
        assert np.array_equal(s, frames[3 * i])


def test_avi_skipped_frames_never_decoded():
    """The demux walk is header-only: with every_k=4 over 8 frames,
    the decode hook fires exactly twice (frames 0 and 4)."""
    from rapidocr_ray.functions.avi import avi_frame_scan_sample, encode_avi_mjpeg
    from rapidocr_ray.functions.jpeg import decode_jpeg

    avi = encode_avi_mjpeg(_tile_frames(8), quality=100)
    calls = []

    def hook(b):
        calls.append(len(b))
        return decode_jpeg(b)

    total, sampled = avi_frame_scan_sample(avi, every_k=4, _decode=hook)
    assert total == 8 and len(sampled) == 2 and len(calls) == 2


def test_avi_dispatches_through_frame_scan_sample(ray_session):
    """The stage entry point sniffs RIFF/AVI and decodes through the
    JPEG path; the FrameSampleStage pipeline emits exact ink sums."""
    import ray.data

    from rapidocr_ray.functions.avi import encode_avi_mjpeg
    from rapidocr_ray.stages.multimodal import frame_scan_sample, frame_stats_pipeline

    frames = _tile_frames(4, seed=3)
    avi = encode_avi_mjpeg(frames, quality=100)
    total, sampled = frame_scan_sample(avi, every_k=2)
    assert total == 4 and len(sampled) == 2
    ds = ray.data.from_items([{"doc_id": 0, "video": avi}])
    out = frame_stats_pipeline(ds, payload_col="video", every_k=2).to_pandas()
    want_ink = sum(int(f.sum(dtype=np.int64)) for f in (frames[0], frames[2]))
    assert out.iloc[0].n_frames == 4 and out.iloc[0].ink_sampled == want_ink


def test_avi_typed_errors():
    """Structural corruption -> ValueError; foreign codec -> the named
    NotImplementedError stub; non-JPEG frame bytes -> ValueError; all
    stay inside the stage's typed-error contract."""
    import struct as _s

    import pytest as _pytest

    from rapidocr_ray.functions.avi import avi_frame_scan_sample, encode_avi_mjpeg

    avi = encode_avi_mjpeg(_tile_frames(2), quality=100)
    # foreign codec fourcc
    bad = bytearray(avi)
    i = avi.find(b"vids") + 4
    bad[i:i + 4] = b"H264"
    with _pytest.raises(NotImplementedError, match="codec H264"):
        avi_frame_scan_sample(bytes(bad))
    # truncated chunk body inside movi
    with _pytest.raises(ValueError, match="truncated chunk"):
        avi_frame_scan_sample(avi[:-10])
    # no video stream: strh type flipped to auds
    bad2 = bytearray(avi)
    bad2[avi.find(b"vids"):avi.find(b"vids") + 4] = b"auds"
    with _pytest.raises(ValueError, match="no video stream"):
        avi_frame_scan_sample(bytes(bad2))
    # frame bytes that are not JPEG
    soi = avi.find(b"\xff\xd8\xff")
    bad3 = bytearray(avi)
    bad3[soi:soi + 3] = b"\x00\x00\x00"
    with _pytest.raises(ValueError, match="SOI"):
        avi_frame_scan_sample(bytes(bad3), every_k=1)
    # bad signature
    with _pytest.raises(ValueError, match="signature"):
        avi_frame_scan_sample(b"RIFF\x00\x00\x00\x00WAVE")


def test_avi_odd_size_frame_alignment():
    """RIFF word alignment: an odd-length JPEG chunk gets a pad byte
    and the walk stays in sync for every following frame."""
    from rapidocr_ray.functions.avi import avi_frame_scan_sample, encode_avi_mjpeg

    # hunt a frame set with at least one odd-size encoded JPEG
    for seed in range(20):
        frames = _tile_frames(5, seed=seed)
        avi = encode_avi_mjpeg(frames, quality=90)
        total, sampled = avi_frame_scan_sample(avi, every_k=1)
        assert total == 5 and len(sampled) == 5
        for s, f in zip(sampled, frames):
            assert s.shape == f.shape


def test_gif_animation_sampling_lossless():
    """Animated GIF: exact (lossless) frame round-trip, every-k
    sampling, and skipped frames never reach the LZW decoder."""
    from rapidocr_ray.functions import codecs

    rng = np.random.RandomState(4)
    frames = [rng.randint(0, 256, (24, 18), dtype=np.uint8) for _ in range(6)]
    anim = codecs.encode_gif_animation(frames)
    total, sampled = codecs.gif_frame_scan_sample(anim, every_k=2)
    assert total == 6 and len(sampled) == 3
    for i, s in enumerate(sampled):
        assert np.array_equal(s, frames[2 * i])
    # decode_gif (image path) still returns the FIRST frame
    assert np.array_equal(codecs.decode_gif(anim), frames[0])
    # skipped frames: the LZW decoder runs only for sampled indices
    calls = []
    orig = codecs._gif_lzw_decode
    codecs._gif_lzw_decode = lambda *a: (calls.append(1), orig(*a))[1]
    try:
        codecs.gif_frame_scan_sample(anim, every_k=3)
    finally:
        codecs._gif_lzw_decode = orig
    assert len(calls) == 2


def test_gif_animation_typed_errors():
    """Sampled partial-placement or transparent frames raise the named
    compositing stub; structural truncation raises ValueError."""
    import struct as _s

    from rapidocr_ray.functions import codecs

    frames = [np.full((8, 8), 100, dtype=np.uint8) for _ in range(2)]
    anim = codecs.encode_gif_animation(frames)
    # shift the second frame's descriptor to a partial placement
    desc2 = anim.rindex(b"\x2c")
    partial = bytearray(anim)
    partial[desc2 + 1:desc2 + 3] = _s.pack("<H", 2)  # left=2
    with pytest.raises(NotImplementedError, match="partial-frame"):
        codecs.gif_frame_scan_sample(bytes(partial), every_k=1)
    # but with every_k=2 the partial frame is skipped -> no error
    total, sampled = codecs.gif_frame_scan_sample(bytes(partial), every_k=2)
    assert total == 2 and len(sampled) == 1
    # transparency flag on a sampled frame
    gce = anim.index(b"\x21\xf9\x04")
    trans = bytearray(anim)
    trans[gce + 3] = 1  # transparent-color flag
    with pytest.raises(NotImplementedError, match="transparent"):
        codecs.gif_frame_scan_sample(bytes(trans), every_k=1)
    with pytest.raises(ValueError):
        codecs.gif_frame_scan_sample(anim[:-12], every_k=1)


def test_audio_feature_pipeline(ray_session):
    import ray.data

    from rapidocr_ray.functions.codecs import encode_wav
    from rapidocr_ray.stages.multimodal import audio_feature_pipeline

    sig = np.full(16000, 0.5, dtype=np.float32)  # 2 s of DC at 8 kHz
    tbl = pa.table(
        {
            "url": ["a", "b"],
            "html": [encode_wav(sig, 8000), b"\x89PNG not audio"],
        }
    )
    out = audio_feature_pipeline(ray.data.from_arrow(tbl)).to_pandas().set_index("url")
    assert out.loc["a", "decode_ok"]
    assert out.loc["a", "sample_rate"] == 8000
    assert out.loc["a", "duration_us"] == 2_000_000
    assert abs(out.loc["a", "rms_scaled"] - 500_000) <= 20  # ~0.5 RMS
    assert not out.loc["b", "decode_ok"]


def test_frame_sample():
    from rapidocr_ray.stages.multimodal import frame_sample

    frames = [glyphs.render_page([f"frame {i}"], margin=4) for i in range(5)]
    video = b"".join(glyphs.encode_rbmp(f) for f in frames)
    sampled = frame_sample(video, every_k=2)
    assert len(sampled) == 3  # frames 0, 2, 4
    for got, want in zip(sampled, frames[::2]):
        assert np.array_equal(got, want)
    with pytest.raises(NotImplementedError, match="video codec"):
        frame_sample(b"\x00\x00\x00 mp4ftyp")


def test_frame_scan_sample_skips_decode():
    """Skipped frames must never be decoded (VERDICT r4 #3): the walk
    header-scans every frame but the decode hook fires only for
    sampled indices — counted via the _decode test hook on a
    ragged-size frame stream (so a wrong skip offset would also
    misalign and fail the equality checks)."""
    from rapidocr_ray.stages.multimodal import frame_scan_sample

    frames = [
        glyphs.render_page([f"f{i}" * (i + 1)], margin=2 + i) for i in range(7)
    ]
    video = b"".join(glyphs.encode_rbmp(f) for f in frames)
    calls = []

    def counting_decode(payload):
        calls.append(payload)
        return glyphs.decode_rbmp(payload)

    total, sampled = frame_scan_sample(video, every_k=3, _decode=counting_decode)
    assert total == 7
    assert len(sampled) == 3  # frames 0, 3, 6
    assert len(calls) == 3  # ONLY the sampled frames were decoded
    for got, want in zip(sampled, frames[::3]):
        assert np.array_equal(got, want)


def test_frame_scan_rejects_corrupt_skipped_frames():
    """Header-scan sampling must still REJECT corrupt payloads the old
    full-decode path rejected — even when the corruption sits in a
    frame that sampling would skip (review finding r5)."""
    from rapidocr_ray.stages.multimodal import frame_scan_sample

    frames = [glyphs.render_page([f"f{i}"], margin=4) for i in range(3)]
    video = b"".join(glyphs.encode_rbmp(f) for f in frames)
    # truncate inside the LAST frame (skipped at every_k=2? no: idx 2 IS
    # sampled; use every_k=3 so only frame 0 decodes)
    with pytest.raises(ValueError, match="truncated"):
        frame_scan_sample(video[:-5], every_k=3)
    # corrupt the magic of frame 1 (never decoded at every_k=3)
    hdr1 = len(glyphs.encode_rbmp(frames[0]))
    bad = bytearray(video)
    bad[hdr1:hdr1 + 4] = b"XXXX"
    with pytest.raises(ValueError, match="magic"):
        frame_scan_sample(bytes(bad), every_k=3)
    # trailing garbage shorter than a header: typed error, not struct.error
    with pytest.raises(ValueError, match="truncated"):
        frame_scan_sample(video + b"\x01\x02\x03", every_k=1)


def test_frame_stage_corrupt_rows_are_error_rows(ray_session):
    """One corrupt video row must become a typed error row, never abort
    the Ray task."""
    import pyarrow as pa
    import ray

    from rapidocr_ray.stages.multimodal import frame_stats_pipeline

    good = b"".join(
        glyphs.encode_rbmp(glyphs.render_page([f"g{i}"], margin=4)) for i in range(2)
    )
    tbl = pa.table(
        {
            "url": ["good", "truncated", "garbage-tail"],
            "video": [good, good[:-7], good + b"\x00\x01"],
        }
    )
    out = (
        frame_stats_pipeline(ray.data.from_arrow(tbl), payload_col="video", every_k=2)
        .to_pandas()
        .set_index("url")
    )
    assert out.loc["good", "decode_ok"]
    assert not out.loc["truncated", "decode_ok"]
    assert not out.loc["garbage-tail", "decode_ok"]
