"""Per-partition checkpoint manifests + the resumable runner.

North rule: "resumable from checkpoint with per-partition lineage +
metrics".  The unit of resume is an INPUT shard (one parquet file or an
explicit file group): each shard's extraction output is written to its
own directory, atomically (write to ``<dir>.tmp`` then rename), with a
JSON manifest carrying lineage:

    {partition_id, input_files, input_span, row_count, n_spans,
     routes, elapses, content_hash, engine_version}

On resume, ``run_resumable`` lists existing manifests, skips finished
partitions, and processes only the remainder — a failed run at shard
k restarts at shard k, never recomputing earlier shards.

Scale shape: the shard's output NEVER materializes on the driver.  The
pipeline streams straight into ``Dataset.write_parquet`` (worker-side
block writes into the ``.tmp`` dir), then manifest metrics and the
content hash are computed by one narrow-column remote task per written
file and merged on the driver as tiny dicts.  The content hash is a
COMMUTATIVE digest (sum of per-row sha256(url || text) mod 2^256), so
per-file partials merge associatively regardless of block order — the
table-at-once ``write_partition`` path and the streamed path produce
identical hashes by construction (covered by tests/test_manifest.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MANIFEST_NAME = "manifest.json"

_HASH_MOD = 1 << 256

# narrow projection sufficient for metrics + content hash — the spans /
# payload-adjacent columns are never re-read
_METRIC_COLUMNS = [
    "url",
    "extracted_text",
    "route",
    "n_spans",
    "det_elapse",
    "cls_elapse",
    "rec_elapse",
]


def partition_dir(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, f"part-{partition_id:05d}")


def manifest_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(partition_dir(out_dir, partition_id), MANIFEST_NAME)


def completed_partitions(out_dir: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part-") and not name.endswith(".tmp"):
            mpath = os.path.join(out_dir, name, MANIFEST_NAME)
            if os.path.isfile(mpath):
                done.add(int(name.split("-")[1]))
    return done


def _partial_metrics(table: pa.Table, key: str = "url", value: str = "extracted_text") -> dict:
    """Mergeable metrics + hash partial for one table/batch.

    The hash term per row is sha256(key \\x00 value) read as a 256-bit
    int; partials combine by modular addition, so any partitioning of
    the rows yields the same final digest (duplicates accumulate — a
    repeated row shifts the sum, unlike XOR which would cancel pairs).
    """
    routes: dict[str, int] = {}
    if "route" in table.schema.names:
        vc = pc.value_counts(table.column("route"))
        for item in vc:
            k = item["values"].as_py()
            routes[k or "null"] = routes.get(k or "null", 0) + item["counts"].as_py()
    n_spans = 0
    if "n_spans" in table.schema.names:
        s = pc.sum(table.column("n_spans"))
        n_spans = int(s.as_py() or 0)
    elapses = {}
    for col in ("det_elapse", "cls_elapse", "rec_elapse"):
        if col in table.schema.names:
            s = pc.sum(table.column(col))
            elapses[col] = float(s.as_py() or 0.0)
    joined = pc.binary_join_element_wise(
        pc.fill_null(pc.cast(table.column(key), pa.string()), "None"),
        pc.fill_null(pc.cast(table.column(value), pa.string()), "None"),
        "\x00",
    )
    h = 0
    for v in joined.to_pylist():
        h = (h + int.from_bytes(hashlib.sha256(v.encode("utf-8")).digest(), "big")) % _HASH_MOD
    return {
        "row_count": table.num_rows,
        "n_spans": n_spans,
        "routes": routes,
        "elapses": elapses,
        "hash_int": h,
    }


def _merge_partials(partials: list[dict]) -> dict:
    routes: dict[str, int] = {}
    elapses: dict[str, float] = {}
    rows = spans = h = 0
    for p in partials:
        rows += p["row_count"]
        spans += p["n_spans"]
        h = (h + p["hash_int"]) % _HASH_MOD
        for k, v in p["routes"].items():
            routes[k] = routes.get(k, 0) + v
        for k, v in p["elapses"].items():
            elapses[k] = elapses.get(k, 0.0) + v
    return {
        "row_count": rows,
        "n_spans": spans,
        "routes": routes,
        "elapses": {k: round(v, 6) for k, v in elapses.items()},
        "content_hash": format(h, "064x"),
    }


def _file_metrics(path: str) -> dict:
    """Remote-task body: metrics partial for one written parquet file,
    reading only the narrow metric columns."""
    t = pq.read_table(path, columns=_METRIC_COLUMNS)
    return _partial_metrics(t)


def content_hash(table: pa.Table, key: str = "url", value: str = "extracted_text") -> str:
    """Order-insensitive digest of (key, value) pairs — the lineage
    field a verifier uses to compare reruns without re-reading rows."""
    return _merge_partials([_partial_metrics(table, key=key, value=value)])["content_hash"]


def _write_manifest(tmp: str, final: str, manifest: dict) -> None:
    with open(os.path.join(tmp, MANIFEST_NAME), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)


def write_partition(
    out_dir: str,
    partition_id: int,
    table: pa.Table,
    input_files: list[str],
    input_span: tuple[int, int] | None = None,
) -> dict:
    """Atomic table-at-once write: parquet + manifest into <part>.tmp,
    then rename.  For small in-memory results; the streamed path in
    ``run_resumable`` covers shards that must never fit on one node."""
    final = partition_dir(out_dir, partition_id)
    tmp = final + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(table, os.path.join(tmp, "data.parquet"))
    manifest = {
        "partition_id": partition_id,
        "input_files": input_files,
        "input_span": list(input_span) if input_span else None,
        "written_at": time.time(),
        **_merge_partials([_partial_metrics(table)]),
    }
    _write_manifest(tmp, final, manifest)
    return manifest


def _sink_reported_rows(result) -> int | None:
    """Row count the Ray datasink itself reported having written —
    independent of which files are VISIBLE to the driver.  On a
    multi-node cluster with a node-local out_dir, driver-node workers'
    blocks are visible while other nodes' blocks are silently lost;
    comparing sink-reported rows against the merged per-file partials
    catches that partial-visibility case, not only the all-lost one
    (ADVICE r3).  Best-effort (reads the executed write sub-dataset's
    cached result blocks — no recompute); returns None if the internal
    layout changes."""
    try:
        import ray as _ray

        write_ds = result._write_ds
        raw = _ray.get(write_ds._plan.execute().block_refs)
        return int(sum(r["num_rows"].sum() for r in raw))
    except Exception as exc:  # pragma: no cover — private-API drift
        # loud, not silent: a Ray upgrade that changes these internals
        # disarms the multi-node partial-visibility guard — make that
        # visible in run output (ADVICE r4).
        import logging

        logging.getLogger(__name__).warning(
            "sink row-count cross-check disarmed (Ray private-API drift: %s); "
            "multi-node partial-visibility losses will NOT be detected",
            exc,
        )
        return None


def write_partition_streamed(
    out_dir: str,
    partition_id: int,
    result,
    input_files: list[str],
    input_span: tuple[int, int] | None = None,
) -> dict:
    """Atomic streamed write of a Dataset partition.

    The Dataset streams worker-side into ``<part>.tmp`` via
    ``write_parquet`` (one file per output block — resumable output,
    never one giant file), then one remote task per written file
    computes the metrics/hash partial over the narrow columns and the
    driver merges the tiny partial dicts.  Driver memory is O(#files),
    independent of partition row count."""
    import ray

    from rapidocr_ray.stages.ray_stages import FINAL_SCHEMA

    final = partition_dir(out_dir, partition_id)
    tmp = final + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    result.write_parquet(tmp)
    expected_rows = _sink_reported_rows(result)
    files = sorted(
        os.path.join(tmp, name)
        for name in os.listdir(tmp)
        if name.endswith(".parquet")
    )
    if not files:
        # Either the stream was genuinely empty, or the workers wrote
        # to a filesystem the driver cannot see (write_parquet writes
        # worker-side; a local out_dir on a multi-node cluster is NOT
        # shared).  Distinguish loudly: a silent empty manifest over a
        # non-empty partition would be masked data loss.  Re-executing
        # the (deterministic) lineage for the count only happens on
        # this edge path.
        if result.count() > 0:
            raise RuntimeError(
                "write_partition_streamed: workers wrote parquet blocks "
                f"but none are visible at {tmp!r} — out_dir must be on "
                "a filesystem shared between driver and workers (NFS / "
                "object store); a node-local path silently drops data"
            )
        # genuinely empty stream: keep the partition readable with an
        # explicit empty file
        empty = os.path.join(tmp, "data.parquet")
        pq.write_table(FINAL_SCHEMA.empty_table(), empty)
        files = [empty]
    task = ray.remote(num_cpus=1)(_file_metrics)
    partials = ray.get([task.remote(f) for f in files])
    visible_rows = sum(p["row_count"] for p in partials)
    if expected_rows is not None and visible_rows != expected_rows:
        raise RuntimeError(
            f"write_partition_streamed: sink reported {expected_rows} rows "
            f"written but only {visible_rows} are visible at {tmp!r} — "
            "out_dir must be on a filesystem shared between driver and "
            "workers (NFS / object store); a node-local path silently "
            "drops non-driver nodes' blocks"
        )
    manifest = {
        "partition_id": partition_id,
        "input_files": input_files,
        "input_span": list(input_span) if input_span else None,
        "written_at": time.time(),
        "output_files": [os.path.basename(f) for f in files],
        **_merge_partials(partials),
    }
    _write_manifest(tmp, final, manifest)
    return manifest


def run_resumable(
    input_files: list[str],
    out_dir: str,
    cfg=None,
    files_per_partition: int = 1,
    dedup: bool = True,
    partition_parallelism: int = 1,
) -> dict:
    """Extraction over parquet shards with skip-finished semantics.

    Returns the run report: per-partition manifests + totals.  Note the
    dedup scope: latest-capture-wins runs WITHIN a partition (url is
    the partition key of the upstream sharding at production scale, so
    cross-shard duplicates do not occur when inputs are url-sharded;
    for unsharded inputs pass files_per_partition=len(input_files)).

    ``partition_parallelism > 1`` submits that many partitions' pipelines
    concurrently (driver threads; Ray interleaves their tasks on the one
    cluster).  At production shard counts this hides the per-partition
    ramp (pool spin-up, winners pass) behind the previous partition's
    compute; each concurrent partition's cascade pool is sized to its
    1/k slice of the session so k pipelines never oversubscribe."""
    from rapidocr_ray.config import PipelineConfig
    from rapidocr_ray.pipelines.extract import (
        DEFAULT_ROWS_PER_BLOCK,
        build_extract_pipeline,
        read_pages,
    )
    from rapidocr_ray.util import harden_lazy_imports

    harden_lazy_imports()
    os.makedirs(out_dir, exist_ok=True)
    groups = [
        input_files[i:i + files_per_partition]
        for i in range(0, len(input_files), files_per_partition)
    ]
    done = completed_partitions(out_dir)
    base_cfg = cfg or PipelineConfig()
    k = max(1, min(partition_parallelism, len(groups)))
    slice_cap = None
    if k > 1:
        import ray as _ray

        try:
            cpus = int(_ray.cluster_resources().get("CPU", 8))
        except Exception:  # pragma: no cover — session not up yet
            cpus = 8
        # each concurrent partition needs >= 2 cascade actors plus
        # headroom for its read tasks; on tiny sessions concurrency
        # degrades to serial rather than deadlocking the scheduler
        k = max(1, min(k, cpus // 6))
        if k > 1:
            slice_cap = max(2, cpus // k - 1)

    import threading

    build_lock = threading.Lock()

    def run_partition(pid: int, group: list[str]) -> dict:
        # one footer scan per group: read_pages reuses the total
        total = sum(pq.ParquetFile(f).metadata.num_rows for f in group)
        # size the cascade pool to the partition's WORK, not the
        # session width: each actor is a fresh process (imports + by-
        # value module ship, ~1s), so an actor must amortize its
        # spin-up over several blocks or ramp dominates (measured on
        # the 19-block bench partition: pool 15 -> 8.3s, pool 6 ->
        # 3.8s end-to-end).  At production partition sizes n_blocks is
        # huge and the concurrency/slice caps bind instead — this only
        # throttles partitions too small to use a wide pool anyway.
        # Block-count estimate derives from the SAME rows_per_block
        # constant read_pages uses (ADVICE r3: no silent drift).
        n_blocks = max(len(group), total // DEFAULT_ROWS_PER_BLOCK)
        pool_cap = min(
            base_cfg.Ray.cascade_concurrency, max(2, n_blocks // 3)
        )
        if slice_cap is not None:
            pool_cap = min(pool_cap, slice_cap)
        part_cfg = base_cfg.with_overrides(ray_cascade_concurrency=pool_cap)
        with build_lock:
            # dataset BUILD (path resolution, plan construction) hits
            # lazy imports inside Ray/pyarrow that are not thread-safe;
            # building is milliseconds, so serializing it costs nothing
            # while the EXECUTIONS still overlap
            ds = read_pages(group, total_rows=total)
            result = build_extract_pipeline(
                ds, cfg=part_cfg, dedup=dedup, winners_files=group
            )
        return write_partition_streamed(out_dir, pid, result, group)

    manifests_by_pid: dict[int, dict] = {}
    skipped = []
    pending: list[tuple[int, list[str]]] = []
    for pid, group in enumerate(groups):
        if pid in done:
            skipped.append(pid)
            with open(manifest_path(out_dir, pid), encoding="utf-8") as f:
                manifests_by_pid[pid] = json.load(f)
        else:
            pending.append((pid, group))
    if k > 1 and len(pending) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=k) as pool:
            futs = {
                pid: pool.submit(run_partition, pid, group)
                for pid, group in pending
            }
        for pid, fut in futs.items():
            manifests_by_pid[pid] = fut.result()
    else:
        for pid, group in pending:
            manifests_by_pid[pid] = run_partition(pid, group)
    manifests = [manifests_by_pid[pid] for pid in sorted(manifests_by_pid)]
    return {
        "out_dir": out_dir,
        "n_partitions": len(groups),
        "skipped": skipped,
        "row_count": sum(m["row_count"] for m in manifests),
        "manifests": manifests,
    }
