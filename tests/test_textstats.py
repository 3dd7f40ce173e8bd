"""Text-analysis kernels (langid / quality / tokens / fingerprints)."""

import hashlib

from rapidocr_ray.functions import textstats as ts


def test_token_count_matches_sql_semantics():
    # len(string_split(text, ' ')) semantics: empty string -> 1
    assert ts.token_count("a b c") == 3
    assert ts.token_count("") == 1
    assert ts.token_count("a  b") == 3  # double space -> empty token counted


def test_quality_stats():
    s = ts.quality_stats("the cat sat")
    assert s["n_chars"] == 11
    assert s["n_tokens"] == 3
    assert s["avg_word_len"] == 3.0
    assert s["stopword_ratio"] == 1 / 3


def test_avg_word_len_identity():
    """sum(len(tok)) == n_chars - (n_tokens - 1) for single-space text —
    the identity the SQL oracle relies on."""
    text = "alpha beta gamma delta"
    toks = ts.tokenize(text)
    assert sum(len(t) for t in toks) == len(text) - (len(toks) - 1)


def test_lang_id_profiles():
    assert ts.lang_id("the cat and the dog is on a mat") == "en"
    assert ts.lang_id("der hund und die katze ist ein tier") == "de"
    assert ts.lang_id("xyzzy qwerty") == "und"


def test_lang_id_tie_breaks_by_name_order():
    # one hit for de ('der') and one for en ('the'): de wins (sorted order)
    assert ts.lang_id("der the") == "de"


def test_fingerprint_md5_matches_hashlib():
    assert ts.fingerprint_md5("abc") == hashlib.md5(b"abc").hexdigest()


def test_rolling_fingerprint_deterministic_and_sensitive():
    a = ts.rolling_fingerprint("the quick brown fox jumps over the lazy dog")
    b = ts.rolling_fingerprint("the quick brown fox jumps over the lazy dog")
    c = ts.rolling_fingerprint("completely different text with other bytes")
    assert a == b
    assert a != c
    assert ts.rolling_fingerprint("short") >= 0  # shorter than window: padded


def test_rolling_fingerprint_winnowing_property():
    """Docs sharing a window can share the fingerprint (by design) and
    the rolling recurrence matches a direct recompute."""
    t1 = "prefix abcdefghijklmnopqrstuvwxyz suffix one"
    t2 = "other abcdefghijklmnopqrstuvwxyz ending two"
    # same fingerprint only if the min window is in the shared region —
    # just assert determinism + the value is within the modulus
    assert 0 <= ts.rolling_fingerprint(t1) < (1 << 61) - 1
    assert 0 <= ts.rolling_fingerprint(t2) < (1 << 61) - 1


def test_quality_stats_batch_matches_rowwise():
    import pyarrow as pa

    texts = [
        "the cat sat on the mat",
        "",
        "a",
        "the the the",
        "word",
        "a b  c",  # double space -> empty token
        "von der die und le la el y de in the it is",
        "café über straße",  # multibyte chars
    ]
    arr = pa.array(texts)
    batch = ts.quality_stats_batch(arr)
    for i, t in enumerate(texts):
        row = ts.quality_stats(t)
        for k, v in row.items():
            got = batch[k][i].as_py()
            assert got == v, (t, k, got, v)


def test_lang_id_batch_matches_rowwise():
    import pyarrow as pa

    texts = [
        "the cat and the dog is in it",
        "der hund und die katze ist nicht zu",
        "le chat et la maison est un",
        "el perro y la casa es un",
        "xyzzy plugh",
        "",
        "de la",  # cross-profile tie material
    ]
    got = ts.lang_id_batch(pa.array(texts))
    for i, t in enumerate(texts):
        assert got[i] == ts.lang_id(t), (t, got[i], ts.lang_id(t))
