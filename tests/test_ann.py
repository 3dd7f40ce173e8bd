"""Similarity search: brute-force exact baseline vs numpy oracle, IVF
recall sanity."""

import numpy as np
import pyarrow as pa
import pytest


def _corpus(n=64, d=16, seed=9):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d))
    return np.arange(n, dtype=np.int64), mat


@pytest.fixture()
def corpus_ds(ray_session):
    import ray.data

    ids, mat = _corpus()
    tbl = pa.table(
        {"vec_id": ids.tolist(), "embedding": [list(map(float, v)) for v in mat]}
    )
    return ray.data.from_arrow(tbl)


def _numpy_topk(ids, mat, q_ids, q_mat, k):
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    sims = qn @ n.T
    out = {}
    for qi, qid in enumerate(q_ids):
        mask = ids != qid
        cand, s = ids[mask], sims[qi][mask]
        order = np.lexsort((cand, -s))[:k]
        out[int(qid)] = [int(cand[j]) for j in order]
    return out


def test_brute_force_matches_numpy(corpus_ds):
    from rapidocr_ray.stages.ann import brute_force_topk

    ids, mat = _corpus()
    q_ids, q_mat = ids[:5], mat[:5]
    out = brute_force_topk(corpus_ds, q_ids, q_mat, k=4).to_pandas()
    expect = _numpy_topk(ids, mat, q_ids, q_mat, 4)
    for qid, nbrs in expect.items():
        got = (
            out[out.query_id == qid].sort_values("rank").neighbor_id.astype(int).tolist()
        )
        assert got == nbrs, qid


def test_brute_force_excludes_self(corpus_ds):
    from rapidocr_ray.stages.ann import brute_force_topk

    ids, mat = _corpus()
    out = brute_force_topk(corpus_ds, ids[:3], mat[:3], k=5).to_pandas()
    assert not any(out.query_id == out.neighbor_id)


def test_ivf_recall_reasonable(corpus_ds):
    from rapidocr_ray.stages.ann import brute_force_topk, ivf_topk

    ids, mat = _corpus()
    q_ids, q_mat = ids[:8], mat[:8]
    exact = brute_force_topk(corpus_ds, q_ids, q_mat, k=5).to_pandas()
    approx = ivf_topk(
        corpus_ds, q_ids, q_mat, k=5, n_centroids=8, n_probe=4
    ).to_pandas()
    hits = total = 0
    for qid in q_ids:
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.5  # n_probe/n_centroids = half the space


def test_kmeans_lite_deterministic():
    from rapidocr_ray.stages.ann import kmeans_lite

    _, mat = _corpus()
    c1 = kmeans_lite(mat, 8, seed=11)
    c2 = kmeans_lite(mat, 8, seed=11)
    assert np.array_equal(c1, c2)


def test_seeded_ivf_full_probe_matches_brute_force(corpus_ds):
    """With n_probe == n_centroids every bucket is scanned, so the
    deterministic-quantizer IVF must reproduce brute force exactly."""
    from rapidocr_ray.stages.ann import brute_force_topk, seeded_ivf_topk

    ids, mat = _corpus()
    q_ids, q_mat = ids[:6], mat[:6]
    seed_mat = mat[:8]
    exact = (
        brute_force_topk(corpus_ds, q_ids, q_mat, k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    full = (
        seeded_ivf_topk(corpus_ds, q_ids, q_mat, seed_mat, k=5, n_probe=8)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert exact.equals(full)


def test_seeded_ivf_deterministic_and_self_excluding(corpus_ds):
    from rapidocr_ray.stages.ann import seeded_ivf_topk

    ids, mat = _corpus()
    q_ids, q_mat = ids[:4], mat[:4]
    seed_mat = mat[:8]
    runs = [
        seeded_ivf_topk(corpus_ds, q_ids, q_mat, seed_mat, k=5, n_probe=3)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
        for _ in range(2)
    ]
    assert runs[0].equals(runs[1])
    assert not any(runs[0].query_id == runs[0].neighbor_id)
