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
