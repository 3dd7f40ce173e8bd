"""Reference-compatible RapidOCR()(img) call-shape shim."""

import numpy as np

from rapidocr_ray import glyphs
from rapidocr_ray.compat import RapidOCR


def test_bitmap_call_shape():
    ocr = RapidOCR()
    page = glyphs.render_page(["hello world", "second line"], margin=28, line_gap=32)
    result, elapses = ocr(page)
    assert len(result) == 2
    box, text, score = result[0]
    assert text == "hello world"
    assert isinstance(score, str)  # rapid_ocr_api.py:105 stringified score
    assert np.asarray(box).shape == (4, 2)
    assert len(elapses) == 3


def test_none_none_on_empty():
    ocr = RapidOCR()
    result, elapses = ocr(np.zeros((100, 200), dtype=np.uint8))
    assert result is None and elapses is None


def test_html_input():
    from rapidocr_ray.functions.html import make_page_html

    ocr = RapidOCR()
    result, _ = ocr(make_page_html(["main content block goes here"]))
    assert result[0][1] == "main content block goes here"


def test_override_kwargs():
    ocr = RapidOCR(text_score=0.5)
    page = glyphs.render_page(["some words"], margin=8)
    result, _ = ocr(glyphs.encode_rbmp(page), text_score=1.1)
    assert result is None  # per-call override filters everything
