"""HTTP serving shim (ocrweb + ocrweb_multi route parity) and the
draw_ocr_box_txt-analog debug renderer."""

import base64
import io
import json

import numpy as np
import pytest

from rapidocr_ray import glyphs
from rapidocr_ray.sources.writers import render_page_with_text

flask = pytest.importorskip("flask")

from rapidocr_ray.serving import create_app, parse_bool  # noqa: E402


def _page_payload(lines=("hello", "world")):
    # line_gap=32 matches the synthetic corpus layout (sources/pages.py);
    # the default 8-px gap is tighter than the det unclip expansion.
    return glyphs.encode_rbmp(glyphs.render_page(list(lines), line_gap=32))


@pytest.fixture(scope="module")
def client():
    app = create_app()
    app.testing = True
    return app.test_client()


def test_parse_bool():
    assert parse_bool("true") and parse_bool("1") and parse_bool("Yes")
    assert not parse_bool("false") and not parse_bool("0")
    assert parse_bool(True) and not parse_bool(None)


def test_index_and_lang(client):
    assert client.get("/").status_code == 200
    r = client.get("/lang")
    assert r.status_code == 200
    data = r.get_json()
    assert data["msg"] == "OK"
    codes = {d["code"] for d in data["data"]}
    assert {"en", "ch"} <= codes


def test_ocr_data_url_roundtrip(client):
    payload = _page_payload()
    url = "data:image/rbmp;base64," + base64.b64encode(payload).decode()
    r = client.post("/ocr", json={"file": url})
    assert r.status_code == 200
    data = r.get_json()
    rec = json.loads(data["rec_res"])
    assert [t for _i, t, _s in rec] == ["hello", "world"]
    # rendered image round-trips and carries burned-in outlines
    img = glyphs.decode_rbmp(base64.b64decode(data["image"]))
    assert (img == 128).any()
    assert float(data["total_elapse"]) >= 0
    assert len(data["elapse_part"].split(",")) == 3


def test_ocr_missing_body(client):
    assert client.post("/ocr", json={}).status_code == 400


def test_api_ocr_multipart(client):
    payload = _page_payload(("abc",))
    r = client.post(
        "/api/ocr",
        data={"image": (io.BytesIO(payload), "page.rbmp")},
        content_type="multipart/form-data",
    )
    assert r.status_code == 200
    data = r.get_json()
    assert data["msg"] == "OK"
    assert [s["text"] for s in data["data"]["results"]] == ["abc"]
    assert data["data"]["ts"] >= 0


def test_api_ocr_no_image(client):
    assert client.post("/api/ocr", data={}).status_code == 400


def test_api_ocr_detect_false(client):
    """detect=false routes around det (whole page = one band)."""
    payload = _page_payload(("xy",))
    r = client.post(
        "/api/ocr?detect=false",
        data={"image": (io.BytesIO(payload), "p.rbmp")},
        content_type="multipart/form-data",
    )
    assert r.status_code == 200
    results = r.get_json()["data"]["results"]
    assert len(results) == 1 and results[0]["text"] == "xy"


def test_api_ocr_token_auth():
    app = create_app(token="s3cret")
    app.testing = True
    c = app.test_client()
    payload = _page_payload(("a",))
    assert (
        c.post(
            "/api/ocr",
            data={"image": (io.BytesIO(payload), "p.rbmp")},
            content_type="multipart/form-data",
        ).status_code
        == 403
    )
    r = c.post(
        "/api/ocr?token=s3cret",
        data={"image": (io.BytesIO(payload), "p.rbmp")},
        content_type="multipart/form-data",
    )
    assert r.status_code == 200


class TestRenderPageWithText:
    def _spans(self):
        return [
            {"box": [[4, 4], [40, 4], [40, 18], [4, 18]], "text": "hi", "score": 0.9},
            {"box": [[4, 24], [40, 24], [40, 38], [4, 38]], "text": "lo", "score": 0.2},
        ]

    def test_layout_and_score_filter(self):
        img = np.zeros((48, 60), dtype=np.uint8)
        out = render_page_with_text(img, self._spans(), text_score=0.5)
        assert out.shape == (48, 120)
        left, right = out[:, :60], out[:, 60:]
        # left: first box interior blended toward its color, second too
        # (boxes always drawn); right: only the >=0.5 span carries text
        assert not np.array_equal(left, img)
        # text ink (dark pixels inside the first box region, off-outline)
        assert (right[6:16, 6:38] < 255).any()
        # skipped span: interior of second box stays white on the right
        assert (right[26:36, 6:38] == 255).all()

    def test_vertical_text_branch(self):
        img = np.zeros((80, 40), dtype=np.uint8)
        spans = [{"box": [[10, 4], [22, 4], [22, 70], [10, 70]], "text": "ab", "score": 1.0}]
        out = render_page_with_text(img, spans)
        right = out[:, 40:]
        assert (right < 255).any()

    def test_unknown_chars_dropped(self):
        img = np.zeros((30, 30), dtype=np.uint8)
        spans = [{"box": [[2, 2], [28, 2], [28, 16], [2, 16]], "text": "éé", "score": 1.0}]
        out = render_page_with_text(img, spans)  # must not raise
        assert out.shape == (30, 60)


def test_ocr_png_data_url_renders_png(client):
    """A real-container request: PNG in, recognized text out, rendered
    raster returned as PNG with burned-in outlines."""
    from rapidocr_ray.functions.codecs import decode_png, encode_png
    from rapidocr_ray.glyphs import decode_rbmp

    page = decode_rbmp(_page_payload())
    url = "data:image/png;base64," + base64.b64encode(encode_png(page)).decode()
    r = client.post("/ocr", json={"file": url})
    assert r.status_code == 200
    data = r.get_json()
    rec = json.loads(data["rec_res"])
    assert [t for _i, t, _s in rec] == ["hello", "world"]
    img = decode_png(base64.b64decode(data["image"]))
    assert img.shape == page.shape
    assert (img == 128).any()  # outlines burned in
