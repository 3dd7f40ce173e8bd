"""Text-analysis kernels for the training-data pipeline extensions:
language ID, quality scoring, token counting, fingerprinting.

All kernels are deterministic and vectorization-friendly (called per
batch inside ``map_batches``); the SQL-expressible ones mirror their
DuckDB oracle exactly (same tokenizer: split on single spaces, same
stopword list) so the driver's value-hash comparison holds.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# shared with the SQL oracles in pipelines/queries.py — keep in sync
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# tiny per-language stopword profiles for the n-gram/stopword language
# ID heuristic (the graft's model-registry routing analog feeds on the
# lang column; this recovers it from text when absent)
LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the and of to is in it a for on with as".split()),
    "de": frozenset("der die das und ist ein eine nicht mit von zu".split()),
    "fr": frozenset("le la les et est un une pas avec de du".split()),
    "es": frozenset("el la los las y es un una no con de del".split()),
    "zh": frozenset("de shi le bu wo zai you ta men zhe".split()),
}


def tokenize(text: str) -> list[str]:
    """Single-space split — matches DuckDB string_split(text, ' ')."""
    return text.split(" ")


def token_count(text: str) -> int:
    return len(tokenize(text))


def stopword_ratio(text: str) -> float:
    toks = tokenize(text)
    if not toks:
        return 0.0
    hits = sum(1 for t in toks if t in STOPWORDS)
    return hits / len(toks)


def avg_word_len(text: str) -> float:
    toks = tokenize(text)
    if not toks:
        return 0.0
    return sum(len(t) for t in toks) / len(toks)


def quality_stats(text: str) -> dict:
    """Length / word / stopword quality features (SQL-mirrored)."""
    toks = tokenize(text)
    n_tokens = len(toks)
    n_chars = len(text)
    sw = sum(1 for t in toks if t in STOPWORDS)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_word_len": (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0,
        "stopword_ratio": (sw / n_tokens) if n_tokens else 0.0,
    }


def lang_id(text: str) -> str:
    """Stopword-profile language ID: argmax profile hit-rate, ties by
    profile name order.  Deterministic heuristic (rows-only check)."""
    toks = set(tokenize(text.lower()))
    best_lang, best_score = "und", 0
    for lang in sorted(LANG_PROFILES):
        score = len(toks & LANG_PROFILES[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def _pad_tokens(texts: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """' '+text+' ' with inner spaces doubled, so every token — including
    adjacent ones — is flanked by its OWN space pair and a non-overlapping
    substring count of ``' word '`` equals the per-token match count."""
    doubled = pc.replace_substring(texts, " ", "  ")
    return pc.binary_join_element_wise(pa.scalar(" "), doubled, pa.scalar(" "), "")


def quality_stats_batch(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Columnar ``quality_stats`` over a whole string column: Arrow
    kernels only, bit-identical outputs to the row-wise form.

    Identities used (single-space tokenizer): n_tokens = n_spaces + 1;
    sum(len(token)) = n_chars - n_spaces; stopword hits counted via the
    doubled-space padding trick (see ``_pad_tokens``)."""
    n_chars = pc.utf8_length(texts)
    n_spaces = pc.count_substring(texts, " ")
    n_tokens = pc.add(n_spaces, 1)
    ftok = pc.cast(n_tokens, pa.float64())
    avg = pc.divide(pc.cast(pc.subtract(n_chars, n_spaces), pa.float64()), ftok)
    padded = _pad_tokens(texts)
    hits = None
    for w in STOPWORDS:
        c = pc.count_substring(padded, f" {w} ")
        hits = c if hits is None else pc.add(hits, c)
    return {
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "avg_word_len": avg,
        "stopword_ratio": pc.divide(pc.cast(hits, pa.float64()), ftok),
    }


def lang_id_batch(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Columnar ``lang_id``: per-profile-word PRESENCE (distinct-token
    semantics) summed per language, argmax with ties broken by profile
    name order — identical to the row-wise heuristic."""
    padded = _pad_tokens(pc.utf8_lower(texts))
    n = len(texts)
    best_score = np.zeros(n, dtype=np.int64)
    best_lang = np.full(n, "und", dtype=object)
    for lang in sorted(LANG_PROFILES):
        score = np.zeros(n, dtype=np.int64)
        for w in sorted(LANG_PROFILES[lang]):
            present = pc.greater(pc.count_substring(padded, f" {w} "), 0)
            score += present.to_numpy(zero_copy_only=False)
        better = score > best_score
        best_lang[better] = lang
        best_score = np.maximum(best_score, score)
    return best_lang


def fingerprint_md5(text: str) -> str:
    """Content fingerprint = md5 hex — matches DuckDB md5(text)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


_ROLL_BASE = 1000003
_ROLL_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Winnowing-style document fingerprint: min of rolling polynomial
    hashes over byte windows (deterministic, order-sensitive).  Two
    documents sharing ANY byte window share a candidate fingerprint —
    the winnowing property; near-identical docs therefore collide by
    design."""
    data = text.encode("utf-8")
    if len(data) < window:
        data = data + b"\x00" * (window - len(data))
    top_pow = pow(_ROLL_BASE, window - 1, _ROLL_MOD)
    h = 0
    for b in data[:window]:
        h = (h * _ROLL_BASE + b) % _ROLL_MOD
    best = h
    for i in range(window, len(data)):
        h = ((h - data[i - window] * top_pow) * _ROLL_BASE + data[i]) % _ROLL_MOD
        if h < best:
            best = h
    return best


def rolling_window_hashes(text: str, window: int = 16) -> list[int]:
    """ALL distinct rolling window hashes of a document (the
    fingerprint above keeps only the min) — the candidate set for
    exact substring-share dedup: two docs share a >=``window``-byte
    substring iff they share a window hash (modulo 2^-61 collisions).
    Docs shorter than the window have no full window and return []."""
    data = text.encode("utf-8")
    if len(data) < window:
        return []
    top_pow = pow(_ROLL_BASE, window - 1, _ROLL_MOD)
    h = 0
    for b in data[:window]:
        h = (h * _ROLL_BASE + b) % _ROLL_MOD
    out = {h}
    for i in range(window, len(data)):
        h = ((h - data[i - window] * top_pow) * _ROLL_BASE + data[i]) % _ROLL_MOD
        out.add(h)
    return sorted(out)
