"""HTML fast path: DOM-heuristic main-content extraction.

The graft analog of the det-box scoring chain (SURVEY.md §7.1 step 2):
per-block text-density + link-ratio scoring over a parsed tag tree
(M6/M15 analog: per-block score, threshold filter), then reading-order
concatenation with '\\n' (A5, cpp/RapidOCRCPP/src/OcrLite.cpp:206-210).

Implementation is stdlib ``html.parser`` (no lxml/bs4 in this
environment), one pass, O(bytes).  Deterministic: the same function is
the kernel inside the Ray ``map_batches`` stage and inside the
single-process oracle.

Also hosts the deterministic page *generator* used by the synthetic
corpus (sources/pages.py): boilerplate nav / link-farm / footer wrapped
around known main-content blocks, so extraction is verifiable
byte-for-byte against the source text.
"""

from __future__ import annotations

import html as html_mod
from dataclasses import dataclass
from html.parser import HTMLParser

from rapidocr_ray.config import HtmlConfig

BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li td th pre blockquote article section".split()
)
BOILER_TAGS = frozenset("nav footer header aside".split())
SKIP_TAGS = frozenset("script style head title template noscript".split())
VOID_TAGS = frozenset("br hr img meta link input area base col embed source track wbr".split())


@dataclass
class Block:
    order: int
    text_parts: list
    link_chars: int = 0
    boiler: bool = False

    @property
    def text(self) -> str:
        return "".join(self.text_parts)


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._stack: list[Block] = []
        self._link_depth = 0
        self._boiler_depth = 0
        self._skip_depth = 0
        self._order = 0

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            return
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in BOILER_TAGS:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            blk = Block(order=self._order, text_parts=[], boiler=self._boiler_depth > 0)
            self._order += 1
            self._stack.append(blk)
            self.blocks.append(blk)

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in BOILER_TAGS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in BLOCK_TAGS and self._stack:
            self._stack.pop()

    def handle_data(self, data):
        if self._skip_depth > 0 or not data:
            return
        if self._stack:
            blk = self._stack[-1]
            blk.text_parts.append(data)
            if self._link_depth > 0:
                blk.link_chars += len(data)


def extract_blocks(html_text: str) -> list[Block]:
    parser = _BlockParser()
    parser.feed(html_text)
    parser.close()
    return parser.blocks


def score_block(blk: Block, cfg: HtmlConfig) -> float:
    """Text-density score — the det box-score analog (A3/M6): character
    mass discounted by link ratio; boilerplate ancestors zero it."""
    total = len(blk.text.strip())
    if total == 0 or blk.boiler:
        return 0.0
    link_ratio = blk.link_chars / max(1, len(blk.text))
    return total * (1.0 - link_ratio)


def extract_main_text(html_text: str, cfg: HtmlConfig | None = None) -> str | None:
    """HTML -> main-content text, or None when nothing survives (the
    M18 empty-result analog: the url row stays alive with null text)."""
    cfg = cfg or HtmlConfig()
    kept: list[str] = []
    for blk in extract_blocks(html_text):
        total = len(blk.text.strip())
        if total < cfg.min_text_len:
            continue
        link_ratio = blk.link_chars / max(1, len(blk.text))
        if blk.boiler or link_ratio > cfg.max_link_ratio:
            continue
        if score_block(blk, cfg) < cfg.min_block_score:
            continue
        kept.append(blk.text)
    if not kept:
        return None
    return cfg.join_sep.join(kept)


# ---------------------------------------------------------------------------
# Deterministic page generator (synthesis side)
# ---------------------------------------------------------------------------

_NAV = (
    '<nav><a href="/">home</a> <a href="/about">about</a> '
    '<a href="/contact">contact</a> <a href="/login">login</a></nav>'
)
_FOOTER = (
    '<footer><p>copyright 2026 example corp <a href="/terms">terms</a> '
    '<a href="/privacy">privacy</a></p></footer>'
)


def make_page_html(
    content_blocks: list[str],
    title: str = "page",
    link_farm: int = 6,
    short_noise: bool = True,
) -> str:
    """Wrap main-content blocks in realistic boilerplate.  Content is
    HTML-escaped; each block becomes exactly one <p> with no extra
    whitespace, so extraction recovers it byte-for-byte."""
    parts = ["<html><head><title>", html_mod.escape(title), "</title></head><body>", _NAV]
    if short_noise:
        parts.append("<div><p>ad</p><p>menu</p></div>")
    # a high-link-ratio block that is NOT inside a boilerplate tag —
    # exercises the link-ratio rule specifically
    if link_farm > 0:
        farm = "".join(
            f'<a href="/rel/{i}">related article number {i} read more now</a>'
            for i in range(link_farm)
        )
        parts.append(f'<div class="related">{farm}</div>')
    parts.append('<div id="main">')
    for blk in content_blocks:
        parts.append("<p>" + html_mod.escape(blk) + "</p>")
    parts.append("</div>")
    parts.append('<aside><a href="/x">sidebar widget link</a></aside>')
    parts.append(_FOOTER)
    parts.append("</body></html>")
    return "".join(parts)
