"""Deterministic glyph bitmaps + the RBMP page container.

The reference ships no model weights (python/rapidocr_onnxruntime/models/
holds only .gitkeep) and this sandbox has no network, so — per SURVEY.md
§7.0 — the det/cls/rec forward passes are deterministic seeded kernels
behind the same stage interfaces, while every *observable* rule
(resize rounding, DB post-process, CTC decode, thresholds, ordering)
is implemented faithfully.  This module is the "weights": a fixed,
seed-derived glyph alphabet that both the page synthesizer (which
renders text into bitmaps standing in for rasterized PDFs) and the rec
stage's matched-filter "CRNN" share.

Glyph invariants enforced at build time (deterministically):
- pairwise-distinct patterns (unique argmax in the rec matched filter);
- ink anchors at (0,0), (0,W-1) and (W-1 col, last row) so every
  rendered line's tight ink bounding box is exactly the GLYPH_H-row
  band aligned on glyph boundaries (the rec matched filter depends on
  this to recover alignment without search);
- ink mass concentrated in the top rows (rows 0..5 dense, rows 6..10
  blank, row 11 a single anchor pixel), making the orientation
  statistic the cls stage keys on — the analog of the angle-net's
  learned 0/180 feature (ch_ppocr_v2_cls/utils.py:14-29) — robust
  under the M10 resize's row/column resampling.

RBMP container (our stand-in for image payloads in the ``html: binary``
column): b"RBMP" | uint16 h | uint16 w | h*w uint8 (0 = background,
255 = ink), little-endian.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# char dictionary: the reference builds ['blank'] + keys + [' ']
# (ch_ppocr_v3_rec/utils.py:24,43-45).  KEYS excludes space; space is
# appended exactly like the reference does.
KEYS = "abcdefghijklmnopqrstuvwxyz0123456789.,:;!?()'\"-"
CHARSET = KEYS + " "          # renderable characters
BLANK_IDX = 0                  # CTC blank prepended at index 0

GLYPH_H = 12
GLYPH_W = 8
GLYPH_GAP = 1                  # blank column between glyphs
GLYPH_ADVANCE = GLYPH_W + GLYPH_GAP
GLYPH_TOP_ROWS = 6             # rows 0..5 carry the random pattern

MAGIC = b"RBMP"
_HEADER_FMT = "<4sHH"  # plain format string: module must stay picklable
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


def _char_rng(ch: str) -> np.random.Generator:
    digest = hashlib.sha256(("rapidocr_ray-glyph-v1:" + ch).encode()).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "little"))


def _make_glyph(ch: str) -> np.ndarray:
    """Deterministic GLYPH_H x GLYPH_W binary pattern for one char.

    Layout: rows 0..GLYPH_TOP_ROWS-1 hold a random dense pattern with
    at least 2 ink pixels per column; rows 6..10 are blank; row 11 has
    a single anchor pixel at the last column.  Corners (0,0) and
    (0,W-1) are always ink."""
    if ch == " ":
        return np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    rng = _char_rng(ch)
    g = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    top = (rng.random((GLYPH_TOP_ROWS, GLYPH_W)) > 0.4).astype(np.uint8)
    # per-column minimum of 2 ink pixels (keeps every sampled column
    # top-heavy under M10's column subsampling)
    for col in range(GLYPH_W):
        need = 2 - int(top[:, col].sum())
        if need > 0:
            order = rng.permutation(GLYPH_TOP_ROWS)
            for r in order:
                if top[r, col] == 0:
                    top[r, col] = 1
                    need -= 1
                    if need == 0:
                        break
    top[0, 0] = 1                   # col-0 / row-0 anchor
    top[0, GLYPH_W - 1] = 1         # last-col top anchor
    g[:GLYPH_TOP_ROWS] = top
    g[GLYPH_H - 1, GLYPH_W - 1] = 1  # row-11 anchor (single bottom pixel)
    return g


def _build_alphabet() -> dict[str, np.ndarray]:
    glyphs: dict[str, np.ndarray] = {}
    seen: dict[bytes, str] = {}
    for ch in CHARSET:
        g = _make_glyph(ch)
        key = g.tobytes()
        if key in seen:  # pragma: no cover — sha-seeded collision, astronomically unlikely
            raise RuntimeError(f"glyph collision {ch!r} vs {seen[key]!r}")
        seen[key] = ch
        glyphs[ch] = g
    return glyphs


GLYPHS = _build_alphabet()

# stacked templates in char-dict order (index i -> CHARSET[i]); used by
# the rec matched filter.  float32 once, here, so every actor shares
# identical constants.
TEMPLATES = np.stack([GLYPHS[c] for c in CHARSET]).astype(np.float32)
TEMPLATE_INK = TEMPLATES.reshape(len(CHARSET), -1).sum(axis=1)  # per-char ink count


def render_line(text: str) -> np.ndarray:
    """Render one text line -> (GLYPH_H, n*ADVANCE-GAP) uint8 {0,255}."""
    if not text:
        return np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    cols = []
    for i, ch in enumerate(text):
        if ch not in GLYPHS:
            raise ValueError(f"char {ch!r} not in glyph charset")
        cols.append(GLYPHS[ch] * 255)
        if i != len(text) - 1:
            cols.append(np.zeros((GLYPH_H, GLYPH_GAP), dtype=np.uint8))
    return np.concatenate(cols, axis=1)


def render_page(
    lines: list[str],
    margin: int = 8,
    line_gap: int = 8,
    rotate180: bool = False,
    min_width: int = 64,
) -> np.ndarray:
    """Render text lines onto a page bitmap (uint8, 0=bg, 255=ink).

    Lines are laid out top-to-bottom at a fixed left margin — the
    ground-truth reading order that sorted_boxes (M8,
    rapid_ocr_api.py:152-174) must recover.
    """
    imgs = [render_line(ln) for ln in lines]
    width = max([min_width] + [im.shape[1] for im in imgs]) + 2 * margin
    height = margin * 2 + sum(im.shape[0] for im in imgs) + line_gap * max(0, len(imgs) - 1)
    page = np.zeros((height, width), dtype=np.uint8)
    y = margin
    for im in imgs:
        page[y:y + im.shape[0], margin:margin + im.shape[1]] = im
        y += im.shape[0] + line_gap
    if rotate180:
        page = page[::-1, ::-1].copy()
    return page


def encode_rbmp(img: np.ndarray) -> bytes:
    """uint8 2-D image -> RBMP bytes."""
    h, w = img.shape
    return struct.pack(_HEADER_FMT, MAGIC, h, w) + img.astype(np.uint8).tobytes()


def decode_rbmp(payload: bytes) -> np.ndarray:
    """RBMP bytes -> uint8 2-D image.  Raises ValueError on bad payloads
    (the engine's LoadImageError analog, utils.py:154 — callers catch it
    and set the row's error column instead of aborting the job)."""
    if len(payload) < _HEADER_SIZE:
        raise ValueError("payload too short for RBMP header")
    magic, h, w = struct.unpack_from(_HEADER_FMT, payload)
    if magic != MAGIC:
        raise ValueError("not an RBMP payload")
    body = payload[_HEADER_SIZE:]
    if len(body) != h * w:
        raise ValueError(f"RBMP size mismatch: header {h}x{w}, body {len(body)}")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w)


def is_rbmp(payload: bytes) -> bool:
    return payload[:4] == MAGIC
