"""Deduplication operators over a documents-style table
(id + text columns) — the training-data-pipeline extensions.

Every operator is Ray-Data-first and scale-shaped:

- exact dedup: add a content-hash column in a vectorized map_batches,
  hash-partition groupby(hash) keep-first — one shuffle over (hash,id),
  not over full text when ``project=True``.
- MinHash-LSH near-dup: signature per doc (map_batches, actor pool for
  the seeded permutations) -> explode to (band_id, band_hash, doc)
  rows -> groupby bucket -> candidate pairs -> exact-Jaccard verify.
  Only signatures and candidate pairs shuffle; raw text is re-read
  only for the verified candidates (small side, broadcast join).
- SimHash: 64-bit signature per doc + bucket by bit-prefix for
  near-neighbor candidate generation.
- n-gram Jaccard (exact): shingle explode -> groupby shingle ->
  per-shingle pair emission with per-doc set sizes carried along ->
  groupby pair -> exact jaccard.  This is the exact (non-probabilistic)
  path; SQL-expressible, so it backs the DuckDB oracle.
- embedding cosine near-dup: normalized-vector blocks, all-pairs cosine
  by blockwise matmul against a broadcast matrix (brute-force baseline;
  see stages/ann.py for the bucketed scale path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rapidocr_ray.functions.hashing import (
    MinHasher,
    SimHasher,
    jaccard,
    shingle_set_hashes,
)
from rapidocr_ray.functions.textstats import fingerprint_md5


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    return batch.append_column("content_hash", pa.array([fingerprint_md5(t) for t in texts]))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id row per distinct text (hash-partitioned)."""
    ds = ds.map_batches(
        lambda t: add_content_hash(t, text_col), batch_format="pyarrow"
    )

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
        sigs = []
        sizes = []
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


def minhash_lsh_pairs(
    ds,
    n_perm: int = 128,
    n_bands: int = 32,
    k: int = 3,
    threshold: float = 0.5,
    seed: int = 7,
):
    """documents Dataset -> verified near-dup pairs
    (doc_a, doc_b, jaccard >= threshold), jaccard estimated from the
    MinHash signatures of the candidate pair (no second text pass).

    Scale shape: signatures ~ n_perm*8 bytes/doc regardless of doc
    size; the bucket groupby shuffles only (band_hash, doc_id, sig)."""
    hasher = MinHasher(n_perm=n_perm, seed=seed)
    sig_ds = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"n_perm": n_perm, "k": k, "seed": seed},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        rows_doc, rows_band, rows_hash, rows_sig = [], [], [], []
        for i in range(batch.num_rows):
            doc = batch.column("doc_id")[i].as_py()
            sig = np.array(batch.column("sig")[i].as_py(), dtype=np.uint64)
            for band, bh in hasher.band_keys(sig, n_bands):
                rows_doc.append(doc)
                rows_band.append(band)
                rows_hash.append(bh)
                rows_sig.append(sig.tolist())
        return pa.table(
            {
                "doc_id": rows_doc,
                "band": rows_band,
                "band_hash": rows_hash,
                "sig": rows_sig,
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("band", pa.int32()),
                    ("band_hash", pa.uint64()),
                    ("sig", pa.list_(pa.uint64())),
                ]
            ),
        )

    band_ds = sig_ds.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        docs = group.sort_values("doc_id").to_dict("records")
        out = []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                a, b = docs[i], docs[j]
                if a["doc_id"] == b["doc_id"]:
                    continue
                sa = np.asarray(a["sig"], dtype=np.uint64)
                sb = np.asarray(b["sig"], dtype=np.uint64)
                est = float((sa == sb).mean())
                if est >= threshold:
                    out.append(
                        {"doc_a": a["doc_id"], "doc_b": b["doc_id"], "est_jaccard": est}
                    )
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "est_jaccard"])

    pair_ds = band_ds.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return pair_ds.groupby(["doc_a", "doc_b"]).map_groups(
        dedup_pairs, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(ds, prefix_bits: int = 16):
    """documents -> (doc_id, simhash, bucket = top prefix_bits) — the
    bucket column is the LSH partition key for near-neighbor search."""
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


def ngram_jaccard_pairs(ds, k: int = 3, threshold: float = 0.2):
    """Exact all-pairs Jaccard >= threshold via shingle-explode +
    co-occurrence counting: shuffle key = shingle string, then pair.

    Mirrors the DuckDB oracle exactly (same shingles, same float64
    division)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_sh, out_n = [], [], []
        for doc, text in zip(ids, texts):
            words = text.split(" ")
            if len(words) < k:
                shingles = {" ".join(words)}
            else:
                shingles = {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}
            for s in shingles:
                out_id.append(doc)
                out_sh.append(s)
                out_n.append(len(shingles))
        return pa.table(
            {"doc_id": out_id, "shingle": out_sh, "n_sh": out_n},
            schema=pa.schema(
                [("doc_id", pa.int64()), ("shingle", pa.string()), ("n_sh", pa.int64())]
            ),
        )

    sh_ds = ds.map_batches(explode, batch_format="pyarrow")

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        docs = group[["doc_id", "n_sh"]].drop_duplicates().sort_values("doc_id")
        recs = docs.to_dict("records")
        out = []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                out.append(
                    {
                        "doc_a": recs[i]["doc_id"],
                        "doc_b": recs[j]["doc_id"],
                        "na": recs[i]["n_sh"],
                        "nb": recs[j]["n_sh"],
                    }
                )
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "na", "nb"])

    pair_ds = sh_ds.groupby("shingle").map_groups(emit_pairs, batch_format="pandas")

    def score_pairs(group: pd.DataFrame) -> pd.DataFrame:
        c = len(group)
        row = group.iloc[0]
        j = c / (row.na + row.nb - c)
        if j >= threshold:
            return pd.DataFrame(
                [{"doc_a": row.doc_a, "doc_b": row.doc_b, "jaccard": float(j)}]
            )
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])

    return pair_ds.groupby(["doc_a", "doc_b"]).map_groups(
        score_pairs, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (brute-force baseline)
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(ds, threshold: float = 0.95):
    """embeddings(vec_id, embedding) -> pairs with cosine >= threshold.

    Broadcast pattern: the (normalized) full matrix is put in the
    object store ONCE; each batch computes a [batch, N] float64 matmul
    against it.  At cluster scale replace the broadcast with the IVF
    bucketing in stages/ann.py."""
    import ray

    mat_tbl = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = mat_tbl["vec_id"].to_numpy()
    mat = np.stack(mat_tbl["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat_n = mat / np.where(norms == 0, 1, norms)
    ref = ray.put((ids, mat_n))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        b_ids = np.asarray(batch.column("vec_id").to_pylist())
        b_mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch.column("embedding").to_pylist()])
        bn = np.linalg.norm(b_mat, axis=1, keepdims=True)
        b_n = b_mat / np.where(bn == 0, 1, bn)
        sims = b_n @ all_mat.T
        out_a, out_b = [], []
        for r in range(sims.shape[0]):
            hits = np.where(sims[r] >= threshold)[0]
            for h in hits:
                if all_ids[h] > b_ids[r]:  # each unordered pair once
                    out_a.append(int(b_ids[r]))
                    out_b.append(int(all_ids[h]))
        return pa.table(
            {"vec_a": out_a, "vec_b": out_b},
            schema=pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())]),
        )

    return ds.map_batches(pairs, batch_format="pyarrow")
