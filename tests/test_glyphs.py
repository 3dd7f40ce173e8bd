"""Glyph alphabet + RBMP container invariants (the engine's 'weights',
SURVEY.md §7.0)."""

import numpy as np
import pytest

from rapidocr_ray import glyphs


def test_alphabet_distinct():
    seen = {g.tobytes() for g in glyphs.GLYPHS.values()}
    assert len(seen) == len(glyphs.CHARSET)


def test_glyph_anchors():
    """Every non-space glyph: ink at (0,0), (0,W-1), (H-1,W-1), per-column
    top-heaviness — the invariants the rec/cls kernels rely on."""
    for ch, g in glyphs.GLYPHS.items():
        if ch == " ":
            assert g.sum() == 0
            continue
        assert g[0, 0] == 1 and g[0, glyphs.GLYPH_W - 1] == 1
        assert g[glyphs.GLYPH_H - 1, glyphs.GLYPH_W - 1] == 1
        assert g[glyphs.GLYPH_TOP_ROWS:glyphs.GLYPH_H - 1].sum() == 0  # middle blank
        for col in range(glyphs.GLYPH_W):
            assert g[:glyphs.GLYPH_TOP_ROWS, col].sum() >= 2


def test_glyphs_deterministic():
    g1 = glyphs._make_glyph("q")
    g2 = glyphs._make_glyph("q")
    assert (g1 == g2).all()
    assert (g1 == glyphs.GLYPHS["q"]).all()


def test_rbmp_roundtrip():
    img = glyphs.render_page(["hello world"], margin=8)
    payload = glyphs.encode_rbmp(img)
    assert glyphs.is_rbmp(payload)
    back = glyphs.decode_rbmp(payload)
    assert (back == img).all()


@pytest.mark.parametrize("payload", [b"", b"RBM", b"RBMP\x01\x00\x01\x00" + b"xx"])
def test_rbmp_errors(payload):
    with pytest.raises(ValueError):
        glyphs.decode_rbmp(payload)


def test_render_line_width():
    im = glyphs.render_line("abc")
    assert im.shape == (glyphs.GLYPH_H, 3 * glyphs.GLYPH_ADVANCE - glyphs.GLYPH_GAP)


def test_render_page_rotate():
    up = glyphs.render_page(["ab"], margin=8)
    rot = glyphs.render_page(["ab"], margin=8, rotate180=True)
    assert (rot == up[::-1, ::-1]).all()
