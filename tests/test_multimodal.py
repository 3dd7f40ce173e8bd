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
    # valid RIFF/WAVE but ADPCM (tag 2): typed stub
    import struct as _s

    fmt = _s.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    body = (
        b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"data" + _s.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    data = b"RIFF" + _s.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_wav(data)


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
