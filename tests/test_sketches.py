"""Distributed sketch operators: Misra-Gries heavy hitters (exact
output via verify pass, bounded per-task memory) and HyperLogLog
distinct counting (mergeable registers, estimator accuracy)."""

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# Misra-Gries kernel
# ---------------------------------------------------------------------------


def test_mg_compress_lower_bound_and_capacity():
    from rapidocr_ray.stages.sketches import mg_compress

    rng = np.random.default_rng(3)
    true = {f"t{i}": int(w) for i, w in enumerate(rng.integers(1, 200, 500))}
    tokens = np.array(list(true), dtype=object)
    weights = np.array([true[t] for t in tokens], dtype=np.int64)
    t, w, dec = mg_compress(tokens, weights, m=32)
    assert len(t) < 32 and dec > 0
    kept = dict(zip(t, w))
    for tok, n in true.items():
        # every surviving weight is a lower bound, undercut by <= dec
        assert kept.get(tok, 0) >= n - dec
        if tok in kept:
            assert kept[tok] <= n


def test_mg_compress_noop_below_capacity():
    from rapidocr_ray.stages.sketches import mg_compress

    tokens = np.array(["a", "b"], dtype=object)
    weights = np.array([5, 3], dtype=np.int64)
    t, w, dec = mg_compress(tokens, weights, m=10)
    assert dec == 0 and list(t) == ["a", "b"] and list(w) == [5, 3]


def test_mg_heavy_hitters_exact_with_tiny_summary(ray_session):
    """m far below the vocabulary forces real decrements in every
    partial; the verify pass must still return the EXACT answer."""
    import ray.data

    from rapidocr_ray.stages.sketches import misra_gries_heavy_hitters

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    # two genuinely heavy tokens + a long random tail
    docs = []
    for _ in range(200):
        words = ["hot"] * 4 + ["warm"] * 2 + list(rng.choice(vocab, 24))
        rng.shuffle(words)
        docs.append(" ".join(words))
    ds = ray.data.from_arrow(pa.table({"text": docs})).repartition(8)
    out = (
        misra_gries_heavy_hitters(ds, m=64, fraction=0.05)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    # exact truth
    from collections import Counter

    c = Counter(w for d in docs for w in d.split(" "))
    total = sum(c.values())
    truth = sorted((t, n) for t, n in c.items() if n >= 0.05 * total)
    assert list(zip(out.token, out.n)) == truth
    assert "hot" in set(out.token) and "warm" in set(out.token)


# ---------------------------------------------------------------------------
# HyperLogLog kernel
# ---------------------------------------------------------------------------


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 64, n, dtype=np.uint64)


@pytest.mark.parametrize("true_n", [50, 1000, 20000])
def test_hll_estimate_accuracy(true_n):
    from rapidocr_ray.stages.sketches import hll_estimate, hll_registers

    regs = hll_registers(_hashes(true_n, seed=true_n), p=12)
    est = hll_estimate(regs)
    assert abs(est - true_n) <= max(5.0, 3 * 1.04 / np.sqrt(4096) * true_n)


def test_hll_merge_equals_single_pass():
    """Elementwise-max merge of partial registers must equal the
    registers of the union stream — the mergeability property the
    distributed groupby relies on."""
    from rapidocr_ray.stages.sketches import hll_registers

    h = _hashes(5000, seed=7)
    parts = np.array_split(h, 7)
    merged = np.maximum.reduce([hll_registers(p, 12) for p in parts])
    assert np.array_equal(merged, hll_registers(h, 12))


def test_hll_registers_rho_edges():
    from rapidocr_ray.stages.sketches import hll_registers

    p = 12
    # hash with all-zero top field -> rho = (64-p)+1 (capped max)
    regs = hll_registers(np.array([0], dtype=np.uint64), p)
    assert regs[0] == (64 - p) + 1
    # top bit set -> rho = 1
    regs = hll_registers(np.array([np.uint64(1) << np.uint64(63)], dtype=np.uint64), p)
    assert regs[0] == 1


def test_hll_distinct_per_key_dataset(ray_session):
    import ray.data

    from rapidocr_ray.stages.sketches import hll_distinct_tokens_per_key

    rng = np.random.default_rng(5)
    rows = []
    for lang, vocab_n in (("en", 40), ("zh", 120)):
        vocab = [f"{lang}_{i}" for i in range(vocab_n)]
        for _ in range(50):
            rows.append({"lang": lang, "text": " ".join(rng.choice(vocab, 30))})
    ds = ray.data.from_items(rows).repartition(4)
    out = hll_distinct_tokens_per_key(ds, key_col="lang").to_pandas()
    got = dict(zip(out.lang, out.n_distinct))
    # exact distinct = tokens actually drawn (not the full vocab)
    expect = {
        lang: len({w for r in rows if r["lang"] == lang for w in r["text"].split(" ")})
        for lang in ("en", "zh")
    }
    assert got == expect
    assert bool(out.hll_ok.all())


def test_mg_heavy_hitters_refuses_unsafe_fraction(ray_session):
    """Review finding: when fraction*N <= global decrement the MG
    candidate set can silently drop a true heavy hitter; the operator
    must refuse loudly instead of returning a wrong 'exact' answer."""
    import ray.data

    from rapidocr_ray.stages.sketches import misra_gries_heavy_hitters

    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(400)]
    docs = [" ".join(rng.choice(vocab, 40)) for _ in range(100)]
    ds = ray.data.from_arrow(pa.table({"text": docs})).repartition(4)
    with pytest.raises(ValueError, match="global decrement"):
        misra_gries_heavy_hitters(ds, m=8, fraction=1e-4).to_pandas()
