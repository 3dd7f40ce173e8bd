"""Deduplication operators over a documents-style table
(id + text columns) — the training-data-pipeline extensions.

Every operator is Ray-Data-first and scale-shaped.  A recurring design
rule here: **never groupby into millions of tiny python groups**.
High-cardinality keys (shingle, band-hash) are folded into a bounded
number of hash buckets first; within a bucket the work is a vectorized
pandas merge; cross-bucket combination is a C-level
``groupby().aggregate``.  The only per-group python calls left are on
small, low-cardinality groups.

Operators:
- exact dedup: content-hash column (vectorized map_batches) ->
  groupby(hash) keep-first.
- MinHash-LSH near-dup: signatures (actor pool) -> band explode ->
  bucket merge -> candidate pairs -> signature-estimated jaccard >= t.
- SimHash: 64-bit signature + bit-prefix bucket key.
- n-gram Jaccard (exact): shingle explode -> bucketed co-occurrence
  count -> exact jaccard.  SQL-expressible; backs the DuckDB oracle.
- embedding cosine near-dup: blockwise float64 matmul against a
  broadcast normalized matrix (brute-force baseline; bucketed scale
  path in stages/ann.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rapidocr_ray.functions.hashing import (
    MinHasher,
    SimHasher,
    _stable_hash64,
    shingle_set_hashes,
)
from rapidocr_ray.functions.textstats import fingerprint_md5
from rapidocr_ray.util import ensure_worker_importable

N_BUCKETS = 256  # bounded shuffle fan-in for high-cardinality keys


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    return batch.append_column(
        "content_hash", pa.array([fingerprint_md5(t) for t in texts])
    )


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id row per distinct text (hash-partitioned)."""
    ensure_worker_importable()
    ds = ds.map_batches(lambda t: add_content_hash(t, text_col), batch_format="pyarrow")

    def keep_first(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        return group.take(idx[:1])

    return ds.groupby("content_hash").map_groups(keep_first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup
# ---------------------------------------------------------------------------


class MinHashSignatures:
    """Actor-pool stage: seeded permutations built once per actor."""

    def __init__(self, n_perm: int = 128, k: int = 3, seed: int = 7):
        self.hasher = MinHasher(n_perm=n_perm, seed=seed)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        sigs, sizes = [], []
        for t in texts:
            sh = shingle_set_hashes(t, self.k)
            sizes.append(sh.size)
            sigs.append(self.hasher.signature(sh).tolist())
        return pa.table(
            {"doc_id": ids, "sig": sigs, "n_shingles": sizes},
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("sig", pa.list_(pa.uint64())),
                    ("n_shingles", pa.int64()),
                ]
            ),
        )


def minhash_signatures(ds, n_perm: int = 128, k: int = 3, seed: int = 7):
    ensure_worker_importable()
    return ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"n_perm": n_perm, "k": k, "seed": seed},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def minhash_lsh_pairs(
    ds,
    n_perm: int = 128,
    n_bands: int = 32,
    k: int = 3,
    threshold: float = 0.5,
    seed: int = 7,
):
    """documents -> candidate near-dup pairs (doc_a, doc_b, est_jaccard)
    with est_jaccard (signature agreement fraction) >= threshold.

    Scale shape: signatures are n_perm*8 bytes/doc regardless of doc
    size; band rows shuffle by a bounded bucket key; candidate pairing
    is a vectorized merge per bucket; the final per-pair reduction is a
    C-level groupby max."""
    hasher = MinHasher(n_perm=n_perm, seed=seed)
    sig_ds = minhash_signatures(ds, n_perm=n_perm, k=k, seed=seed)

    def explode_bands(batch: pa.Table) -> pa.Table:
        rows_doc, rows_hash, rows_bucket, rows_sig = [], [], [], []
        for i in range(batch.num_rows):
            doc = batch.column("doc_id")[i].as_py()
            sig = np.array(batch.column("sig")[i].as_py(), dtype=np.uint64)
            for _band, bh in hasher.band_keys(sig, n_bands):
                rows_doc.append(doc)
                rows_hash.append(bh)
                rows_bucket.append(bh % N_BUCKETS)
                rows_sig.append(sig.tolist())
        return pa.table(
            {
                "doc_id": rows_doc,
                "band_hash": rows_hash,
                "bucket": rows_bucket,
                "sig": rows_sig,
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("band_hash", pa.uint64()),
                    ("bucket", pa.uint64()),
                    ("sig", pa.list_(pa.uint64())),
                ]
            ),
        )

    band_ds = sig_ds.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["doc_id", "band_hash"]].drop_duplicates()
        m = g.merge(g, on="band_hash", suffixes=("_a", "_b"))
        m = m[m.doc_id_a < m.doc_id_b][["doc_id_a", "doc_id_b"]].drop_duplicates()
        if m.empty:
            return pd.DataFrame(columns=["doc_a", "doc_b", "est_jaccard"])
        sig_map = {
            r.doc_id: np.asarray(r.sig, dtype=np.uint64)
            for r in group[["doc_id", "sig"]].drop_duplicates("doc_id").itertuples()
        }
        out = []
        for a, b in zip(m.doc_id_a.to_numpy(), m.doc_id_b.to_numpy()):
            est = float((sig_map[a] == sig_map[b]).mean())
            if est >= threshold:
                out.append({"doc_a": int(a), "doc_b": int(b), "est_jaccard": est})
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "est_jaccard"])

    pair_ds = band_ds.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")

    from ray.data.aggregate import Max

    return pair_ds.groupby(["doc_a", "doc_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(ds, prefix_bits: int = 16):
    """documents -> (doc_id, simhash, bucket = top prefix_bits) — the
    bucket column is the LSH partition key for near-neighbor search."""
    ensure_worker_importable()
    hasher = SimHasher()

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        sigs = [hasher.signature(t) for t in texts]
        buckets = [s >> (64 - prefix_bits) for s in sigs]
        return pa.table(
            {"doc_id": ids, "simhash": sigs, "bucket": buckets},
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("simhash", pa.uint64()),
                    ("bucket", pa.uint64()),
                ]
            ),
        )

    return ds.map_batches(sign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (SQL-mirrored)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(ds, k: int = 3, threshold: float = 0.5, max_shingle_df: int | None = None):
    """Exact all-pairs Jaccard >= threshold, mirroring the DuckDB
    oracle: same shingling (word k-grams as strings), same float64
    division.

    Plan: per-doc distinct shingles explode (with per-doc set size
    carried), bucket by shingle hash -> vectorized self-merge per
    bucket -> per-pair co-occurrence Sum (C-level groupby) -> jaccard
    filter.  Shuffled bytes ~ shingle rows, bounded fan-in.

    ``max_shingle_df``: candidate generation cost is sum over shingles
    of df^2, which explodes on corpus-hot shingles (boilerplate
    n-grams).  Setting a df cap drops hotter shingles from the
    CANDIDATE merge only — pairs are still scored with exact set sizes,
    but pairs whose every common shingle is hot can be missed, so this
    is the documented approximate knob for web-scale corpora (the exact
    default backs the DuckDB oracle)."""
    ensure_worker_importable()

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_sh, out_n, out_b = [], [], [], []
        for doc, text in zip(ids, texts):
            words = text.split(" ")
            if len(words) < k:
                shingles = {" ".join(words)}
            else:
                shingles = {
                    " ".join(words[i:i + k]) for i in range(len(words) - k + 1)
                }
            n = len(shingles)
            for s in shingles:
                out_id.append(doc)
                out_sh.append(s)
                out_n.append(n)
                out_b.append(_stable_hash64(s) % N_BUCKETS)
        return pa.table(
            {"doc_id": out_id, "shingle": out_sh, "n_sh": out_n, "bucket": out_b},
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("shingle", pa.string()),
                    ("n_sh", pa.int64()),
                    ("bucket", pa.uint64()),
                ]
            ),
        )

    sh_ds = ds.map_batches(explode, batch_format="pyarrow")

    def bucket_cooccur(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["doc_id", "shingle", "n_sh"]]
        if max_shingle_df is not None:
            df_counts = g.groupby("shingle")["doc_id"].transform("size")
            g = g[df_counts <= max_shingle_df]
        m = g.merge(g, on="shingle", suffixes=("_a", "_b"))
        m = m[m.doc_id_a < m.doc_id_b]
        if m.empty:
            return pd.DataFrame(columns=["doc_a", "doc_b", "na", "nb", "c"])
        agg = (
            m.groupby(["doc_id_a", "doc_id_b", "n_sh_a", "n_sh_b"])
            .size()
            .reset_index(name="c")
        )
        return agg.rename(
            columns={
                "doc_id_a": "doc_a",
                "doc_id_b": "doc_b",
                "n_sh_a": "na",
                "n_sh_b": "nb",
            }
        )

    pair_ds = sh_ds.groupby("bucket").map_groups(bucket_cooccur, batch_format="pandas")

    from ray.data.aggregate import Sum

    counts = pair_ds.groupby(["doc_a", "doc_b", "na", "nb"]).aggregate(
        Sum("c", alias_name="c")
    )

    def score(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        j = df.c / (df.na + df.nb - df.c)
        keep = df[j >= threshold].copy()
        keep["jaccard"] = j[j >= threshold].astype(np.float64)
        out = keep[["doc_a", "doc_b", "jaccard"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    return counts.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicate groups: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def dup_groups(pairs_ds, max_iters: int = 10):
    """(doc_a, doc_b) pair Dataset -> (doc_id, group_id) where group_id
    is the MIN doc id reachable through the pair graph (connected
    components by iterative min-label propagation — ray_guide LSH
    pattern).

    Each round is one groupby shuffle over (node, candidate_label)
    rows; rounds needed = graph diameter (near-dup clusters are
    shallow).  Runs a fixed max_iters bound; deterministic."""
    import ray

    ensure_worker_importable()

    def seed_labels(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("doc_a").to_pylist(), dtype=np.int64)
        b = np.asarray(batch.column("doc_b").to_pylist(), dtype=np.int64)
        # emit (node, label) for both endpoints, label = min endpoint
        lab = np.minimum(a, b)
        return pa.table(
            {
                "doc_id": np.concatenate([a, b]),
                "label": np.concatenate([lab, lab]),
            },
            schema=pa.schema([("doc_id", pa.int64()), ("label", pa.int64())]),
        )

    from ray.data.aggregate import Min

    edges = pairs_ds.map_batches(
        lambda t: pa.table(
            {
                "doc_a": pc_cast_int64(t.column("doc_a")),
                "doc_b": pc_cast_int64(t.column("doc_b")),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # small pair set; reused every round

    labels = (
        edges.map_batches(seed_labels, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("label", alias_name="label"))
    ).materialize()

    for _ in range(max_iters):
        lmap = {
            r["doc_id"]: r["label"] for r in labels.take_all()
        }  # labels are one row per doc in the pair graph — small by
        # construction (dup clusters), broadcastable; at larger scale
        # swap for a bucketed join on doc_id
        ref = ray.put(lmap)

        def propagate(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)
            a = batch.column("doc_a").to_pylist()
            b = batch.column("doc_b").to_pylist()
            out_doc, out_lab = [], []
            for x, y in zip(a, b):
                lx, ly = m[x], m[y]
                low = min(lx, ly)
                out_doc.extend((x, y))
                out_lab.extend((low, low))
            return pa.table(
                {"doc_id": out_doc, "label": out_lab},
                schema=pa.schema([("doc_id", pa.int64()), ("label", pa.int64())]),
            )

        new_labels = (
            edges.map_batches(propagate, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Min("label", alias_name="label"))
        ).materialize()
        new_map = {r["doc_id"]: r["label"] for r in new_labels.take_all()}
        if new_map == lmap:
            break
        labels = new_labels

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "group_id": batch.column("label")},
            schema=pa.schema([("doc_id", pa.int64()), ("group_id", pa.int64())]),
        )

    return labels.map_batches(rename, batch_format="pyarrow")


def pc_cast_int64(arr):
    import pyarrow.compute as pc

    return pc.cast(arr, pa.int64())


# ---------------------------------------------------------------------------
# embedding cosine near-dup (brute-force baseline)
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(ds, threshold: float = 0.45):
    """embeddings(vec_id, embedding) -> pairs with cosine >= threshold.

    Broadcast pattern: the normalized full matrix is put in the object
    store ONCE; each batch computes a [batch, N] float64 matmul against
    it.  At cluster scale swap the broadcast for the IVF bucketing in
    stages/ann.py."""
    import ray

    ensure_worker_importable()
    mat_tbl = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = mat_tbl["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(mat_tbl["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat_n = mat / np.where(norms == 0, 1, norms)
    ref = ray.put((ids, mat_n))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        b_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        b_mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch.column("embedding").to_pylist()]
        )
        bn = np.linalg.norm(b_mat, axis=1, keepdims=True)
        b_n = b_mat / np.where(bn == 0, 1, bn)
        sims = b_n @ all_mat.T
        hit_r, hit_c = np.where(sims >= threshold)
        out_a, out_b = [], []
        for r, h in zip(hit_r, hit_c):
            if all_ids[h] > b_ids[r]:  # each unordered pair once
                out_a.append(int(b_ids[r]))
                out_b.append(int(all_ids[h]))
        return pa.table(
            {"vec_a": out_a, "vec_b": out_b},
            schema=pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())]),
        )

    return ds.map_batches(pairs, batch_format="pyarrow")
