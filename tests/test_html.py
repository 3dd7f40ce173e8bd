"""HTML fast-path extraction: block scoring, boilerplate/link-ratio
filters, reading-order concat (SURVEY.md §7.1 step 2)."""

import pytest

from rapidocr_ray.config import HtmlConfig
from rapidocr_ray.functions.html import (
    extract_blocks,
    extract_main_text,
    make_page_html,
)


def test_roundtrip_single_block():
    text = "key agg row scan slow fast table value part hash"
    assert extract_main_text(make_page_html([text])) == text


def test_roundtrip_multi_block_joined_in_order():
    blocks = ["first block of content here ok", "second block follows along too"]
    assert extract_main_text(make_page_html(blocks)) == "\n".join(blocks)


def test_boilerplate_blocks_dropped():
    html = make_page_html(["real content with enough characters"])
    out = extract_main_text(html)
    assert "copyright" not in out
    assert "sidebar" not in out
    assert "home" not in out


def test_link_farm_dropped_by_ratio():
    html = make_page_html(["real content with enough characters"], link_farm=8)
    out = extract_main_text(html)
    assert "related article" not in out


def test_short_noise_dropped_by_score():
    html = make_page_html(["real content with enough characters"])
    out = extract_main_text(html)
    assert "ad" != out.split("\n")[0]
    assert "menu" not in out.split("\n")


def test_zero_content_returns_none():
    html = make_page_html([])  # boilerplate only
    assert extract_main_text(html) is None
    assert extract_main_text("<html><body></body></html>") is None


def test_escaped_entities_unescaped():
    text = "a < b & c > d 'quoted'"
    html = make_page_html([text])
    assert extract_main_text(html) == text


def test_malformed_html_no_raise():
    assert extract_main_text("<div><p>unclosed block with enough text to score") is not None
    assert extract_main_text("<<<>>>") is None


def test_skip_tags_ignored():
    html = (
        "<html><head><title>ignored title text</title>"
        "<style>p { color: red; }</style></head><body>"
        "<script>var x = 'script text should vanish';</script>"
        "<p>visible content block with enough characters</p></body></html>"
    )
    out = extract_main_text(html)
    assert out == "visible content block with enough characters"


def test_link_chars_counted():
    html = '<p>abcdefghij<a href="/x">0123456789</a></p>'
    [blk] = [b for b in extract_blocks(html) if b.text]
    assert blk.link_chars == 10
    assert len(blk.text) == 20


def test_config_threshold_tunable():
    html = "<p>tiny</p>"
    assert extract_main_text(html) is None  # score 4 < 10
    cfg = HtmlConfig(min_block_score=2.0)
    assert extract_main_text(html, cfg) == "tiny"
