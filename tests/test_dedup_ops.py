"""Dedup operator stages (exact / minhash-LSH / simhash / ngram-jaccard
/ embedding-cosine) against small in-memory oracles."""

import numpy as np
import pyarrow as pa
import pytest

from rapidocr_ray.functions.hashing import jaccard, shingle_set_hashes


def docs_table():
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota lambda",  # near-dup of 0
        "completely different content about query engines and rays",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # exact dup of 0
        "unrelated short text",
    ]
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(docs_table())


def test_exact_dedup(docs_ds):
    from rapidocr_ray.stages.dedup import exact_dedup

    out = exact_dedup(docs_ds).to_pandas()
    assert sorted(out.doc_id) == [0, 1, 2, 4]  # doc 3 deduped to 0


def test_ngram_jaccard_pairs_matches_oracle(docs_ds):
    from rapidocr_ray.stages.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(docs_ds, k=3, threshold=0.2).to_pandas()
    # oracle: exact jaccard on shingle hash sets
    texts = docs_table().column("text").to_pylist()
    sets = [shingle_set_hashes(t, 3) for t in texts]
    expect = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            jc = jaccard(sets[i], sets[j])
            if jc >= 0.2:
                expect[(i, j)] = jc
    got = {(int(r.doc_a), int(r.doc_b)): r.jaccard for r in out.itertuples()}
    assert set(got) == set(expect)
    for key in expect:
        assert got[key] == pytest.approx(expect[key], abs=1e-12)


def test_minhash_finds_exact_and_near_dups(docs_ds):
    from rapidocr_ray.stages.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()
    pairs = {(int(r.doc_a), int(r.doc_b)) for r in out.itertuples()}
    assert (0, 3) in pairs  # exact dup: est_jaccard 1.0
    assert (0, 1) in pairs or (1, 3) in pairs  # near-dup found
    assert all(a < b for a, b in pairs)


def test_simhash_signatures(docs_ds):
    from rapidocr_ray.functions.hashing import hamming64
    from rapidocr_ray.stages.dedup import simhash_signatures

    out = simhash_signatures(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "simhash"] == out.loc[3, "simhash"]  # identical text
    near = hamming64(int(out.loc[0, "simhash"]), int(out.loc[1, "simhash"]))
    far = hamming64(int(out.loc[0, "simhash"]), int(out.loc[2, "simhash"]))
    assert near < far


def test_embedding_cosine_pairs(ray_session):
    import ray.data

    from rapidocr_ray.stages.dedup import embedding_cosine_pairs

    rng = np.random.default_rng(3)
    base = rng.normal(size=8)
    vecs = [base, base + rng.normal(scale=0.01, size=8), rng.normal(size=8), -base]
    tbl = pa.table(
        {
            "vec_id": list(range(4)),
            "embedding": [list(map(float, v)) for v in vecs],
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = embedding_cosine_pairs(ds, threshold=0.95).to_pandas()
    pairs = {(int(r.vec_a), int(r.vec_b)) for r in out.itertuples()}
    assert pairs == {(0, 1)}


def test_dup_groups_100k_pairs_distributed(ray_session):
    """Connected components over 1e5 random pairs match a union-find
    oracle — exercises the bucketed label-join path (the label table is
    never collected to the driver) and pointer-jump convergence on a
    graph with a giant component."""
    import ray.data

    from rapidocr_ray.stages.dedup import dup_groups

    rng = np.random.default_rng(0)
    n = 60000
    a = rng.integers(0, n, 100000)
    b = rng.integers(0, n, 100000)
    mask = a != b
    lo = np.minimum(a, b)[mask].astype(np.int64)
    hi = np.maximum(a, b)[mask].astype(np.int64)

    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(lo, hi):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    comp: dict[int, list[int]] = {}
    for x in set(lo.tolist()) | set(hi.tolist()):
        comp.setdefault(find(x), []).append(x)
    truth = {}
    for r, nodes in comp.items():
        m = min(min(nodes), r)
        for x in nodes:
            truth[x] = m

    pairs = ray.data.from_arrow(pa.table({"doc_a": lo, "doc_b": hi}))
    out = dup_groups(pairs).to_pandas()
    got = dict(zip(out.doc_id, out.group_id))
    assert got == truth
