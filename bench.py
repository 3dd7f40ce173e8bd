"""Benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "throughput": {...docs_per_s...}}

``--scaling``: runs the headline extraction pipeline in two fresh
subprocesses (num_cpus=8 and num_cpus=32) on the same input and prints
both throughputs plus scaling efficiency = t8/(4*t32) — the sandbox
substitute for N vs 4N Ray nodes (SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray():
    # keep idle worker processes alive between Dataset executions: a
    # steady-state cluster amortizes worker startup across jobs, but
    # local mode reaps idle workers within seconds, so every new actor
    # pool would cold-fork ~cpu-count python processes (measured: 1.4s
    # vs 9-17s for a 28-actor pool creation).  Must be set before init.
    os.environ.setdefault("RAY_kill_idle_workers_interval_ms", "0")
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    return ray


def bench_extract(sf_dir: str) -> tuple[float, int]:
    """Headline: full extraction pipeline (dedup -> route -> html fast
    path + det/cls/rec cascade -> assembly) over a pages PARQUET
    directory (synthesized once from documents.parquet, then read the
    way production would read a crawl dump — streaming off storage with
    the winners fast path)."""
    import glob
    import pyarrow.parquet as pq

    from rapidocr_ray.pipelines.extract import build_extract_pipeline, read_pages
    from rapidocr_ray.sources.pages import pages_from_documents, write_pages_parquet

    pages_dir = os.path.join(
        "/tmp", f"rapidocr_ray_bench_pages_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    marker = os.path.join(pages_dir, "done")
    if not os.path.isfile(marker):
        docs = pq.read_table(f"{sf_dir}/documents.parquet")
        write_pages_parquet(pages_from_documents(docs), pages_dir, n_files=8)
        open(marker, "w").close()
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    best = float("inf")
    n = 0
    for _ in range(2):  # best-of-2: shared-host load spikes
        t0 = time.perf_counter()
        ds = build_extract_pipeline(read_pages(files), dedup=True, winners_files=files)
        n = 0
        for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
            n += batch.num_rows
        best = min(best, time.perf_counter() - t0)
    return best, n


def bench_extract_multiline(sf_dir: str) -> tuple[float, int]:
    """Det-path stress: synthetic multi-line/rotated bitmap corpus."""
    from rapidocr_ray.pipelines.extract import extract_pages_table
    from rapidocr_ray.sources.pages import synth_pages

    n_pages = 1000 if sf_dir.endswith("0.1") else 200
    pages = synth_pages(n_pages, seed=42)
    best = float("inf")
    n = 0
    for _ in range(2):
        t0 = time.perf_counter()
        ds = extract_pages_table(pages, dedup=True)
        n = 0
        for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
            n += batch.num_rows
        best = min(best, time.perf_counter() - t0)
    return best, n


def _consume(ds) -> int:
    if not hasattr(ds, "iter_batches"):  # driver-side pa.Table results
        return ds.num_rows
    n = 0
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        n += batch.num_rows
    return n


def main() -> None:
    _init_ray()
    from rapidocr_ray.pipelines import queries as q

    # warm the OS page cache so we measure compute + shuffle, not
    # first-read disk latency
    import pyarrow.parquet as pq

    for t in ("documents", "lineitem", "events", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    # host-speed calibration (untimed, no Ray): the shared VM's
    # effective CPU speed swings ~2x on a minutes timescale WITHOUT
    # showing as steal; this pins each artifact to the window it ran
    # in.  Quiet-window reference: ~220 docs/s (4 procs x ~55);
    # bench lines inflate roughly proportionally when this is lower.
    host_calib = round(_mp_cascade_rate(4, pin_cores=4), 1)
    cpu0 = _cpu_counters()

    timings: dict[str, float] = {}
    throughput: dict[str, float] = {}

    sec, n_docs = bench_extract(SF_DIR)
    timings["extract_pages"] = round(sec, 3)
    throughput["extract_docs_per_s"] = round(n_docs / sec, 2)

    sec, n_multi = bench_extract_multiline(SF_DIR)
    timings["extract_multiline"] = round(sec, 3)
    throughput["extract_multiline_docs_per_s"] = round(n_multi / sec, 2)

    for name in (
        "lineitem_agg",
        "events_window",
        "minhash_lsh_pairs",
        "ann_topk",
        "quality_scores",
        # round-5 curation family: the three shuffle-bearing members
        # (paragraph hash shuffle; Bloom build + verify semi-join;
        # vocab merge + broadcast scoring) — the vectorized no-shuffle
        # members (pii/domain/canon/range) track quality_scores' cost
        "paragraph_dedup",
        "incremental_dedup",
        "unigram_logprob",
        # round-5 additions: exact global terciles on the LM score
        # (unigram scorer + two bounded histogram passes) and the
        # integer-pinned BM25 retrieval (tokenize-once projection +
        # tiny top-k merge)
        "ccnet_buckets",
        "bm25_topk",
        # distributed NB train+classify: the heaviest round-5 widening
        # op (vocab-grid bucket merge + broadcast (V x L) scoring)
        "nb_classify",
        # iterative BPE trainer: 3 full recount passes over the corpus
        # (the k-pass distributed-trainer shape, cost ~ 3x a count op)
        "bpe_train_merges",
        # link-graph family: edge derivation is two bounded shuffles
        # (the real cost at toy scale); the 5-round rank loop
        # auto-selects the driver-local tier on this 60-edge graph
        "domain_pagerank",
        # apples-to-apples container-cost pair: both lines synthesize
        # pages per batch and run the full cascade single-shot; their
        # delta is the WARC encode+parse layer (the flagship
        # extract_pages line above reads pre-materialized parquet
        # best-of-2, so it is NOT the comparator for warc)
        "extract_pages_synth",
        "warc_extract_pages",
        # same pair discipline for the PDF layer: per-batch synthesis
        # (filter chains rotating per doc) + parse + cascade on the
        # scanned third — its delta vs extract_pages_synth is the PDF
        # encode+decode transport cost
        "pdf_extract_pages",
    ):
        fn = q.QUERIES["extract_pages"] if name == "extract_pages_synth" else q.QUERIES[name]
        # the two cascade-heavy pair lines run best-of-2 (same
        # discipline as the flagship lines) so the actor-pool cold
        # ramp lands on the first iteration, not on whichever of the
        # pair happens to run first
        iters = 2 if name.endswith("extract_pages") or name == "extract_pages_synth" else 1
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            _consume(fn(SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # exact all-pairs jaccard over the FULL corpus — the ppjoin-style
    # prefix+positional filtering keeps candidate cost ~ sum of
    # prefix-df^2 (hot shingles are ordered out of prefixes), so the
    # exact op no longer needs a sample cap
    t0 = time.perf_counter()
    _consume(q.QUERIES["ngram_jaccard_pairs"](SF_DIR))
    timings["ngram_jaccard_pairs"] = round(time.perf_counter() - t0, 3)

    # resumable partitioned-parquet sink: flagship output written via
    # the per-partition manifest runner (the 100-TB restart story)
    import tempfile

    from rapidocr_ray.sources.pages import pages_from_documents, write_pages_parquet
    from rapidocr_ray.state.manifest import run_resumable

    with tempfile.TemporaryDirectory(prefix="bench_sink_") as tmp:
        docs = pq.read_table(f"{SF_DIR}/documents.parquet")
        pages_dir = os.path.join(tmp, "pages")
        write_pages_parquet(pages_from_documents(docs), pages_dir, n_files=8)
        files = sorted(
            os.path.join(pages_dir, f) for f in os.listdir(pages_dir)
            if f.endswith(".parquet")
        )
        # 2 partitions: enough to exercise the per-partition manifest +
        # skip layout; at production scale partitions are hours of work
        # and the per-partition pipeline spin-up amortizes away.
        # best-of-2 into separate out dirs — the same discipline as
        # bench_extract: the first run can pay one-time actor-pool
        # spin-up (worker fork + by-value module ship) that an aged
        # session makes 10x worse (BENCH_r03's 22.7s first partition);
        # partition_parallelism=2 additionally overlaps the two
        # partitions' ramp with each other's compute.
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            run_resumable(
                files,
                os.path.join(tmp, f"out{i}"),
                files_per_partition=4,
                partition_parallelism=2,
            )
            best = min(best, time.perf_counter() - t0)
        timings["extract_write_resumable"] = round(best, 3)
        # second invocation over the same out dir must SKIP all
        # finished partitions (the mid-job restart story) — near-zero
        t0 = time.perf_counter()
        report = run_resumable(
            files, os.path.join(tmp, "out1"), files_per_partition=4,
            partition_parallelism=2,
        )
        assert len(report["skipped"]) == report["n_partitions"], report
        timings["extract_resume_skip"] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "e2e extraction + ops suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "throughput": throughput,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "num_cpus": NUM_CPUS,
                "host": {
                    "calib_cascade_docs_per_s_4proc": host_calib,
                    "calib_quiet_reference": 220.0,
                    "steal_pct_window": _steal_pct(cpu0, _cpu_counters()),
                },
            }
        )
    )
    import ray

    ray.shutdown()


SCALING_CORPUS = os.environ.get("GRAFT_SCALING_CORPUS", "/tmp/rapidocr_ray_scaling_corpus")
# large enough that SUSTAINED cascade compute dominates the fixed costs
# (pool ramp ~1.4s + wave-quantization tail): at 32k docs those fixed
# shares cost ~12% of the 32-cpu wall (measured r4), at 64k ~6% — the
# larger corpus is the closer model of a production shard, where a
# partition is hours of work and ramp amortizes to nothing
SCALING_DOCS = int(os.environ.get("GRAFT_SCALING_DOCS", "65536"))


def _synth_scaling_chunk(args: tuple) -> bytes:
    """Subprocess body: render one chunk of the scaling corpus and
    return it as serialized arrow IPC (deterministic per index, so the
    chunking does not affect content)."""
    start, count = args
    import io

    import numpy as np
    import pyarrow as pa

    from rapidocr_ray import glyphs
    from rapidocr_ray.sources.pages import PAGES_SCHEMA, _rand_text, _ts, wrap_lines

    urls, tss, payloads, texts, langs = [], [], [], [], []
    for i in range(start, start + count):
        rng = np.random.default_rng(990_001 + i)
        text = _rand_text(rng, int(rng.integers(24, 56)))
        lines = wrap_lines(text, width=48)
        page = glyphs.render_page(lines, margin=28, line_gap=32,
                                  rotate180=bool(rng.random() < 0.2))
        urls.append(f"https://scale.example/p/{i}")
        tss.append(_ts(i))
        payloads.append(glyphs.encode_rbmp(page))
        texts.append(text)
        langs.append(["en", "zh", "es", "de", "fr"][i % 5])
    table = pa.table(
        {"url": urls, "warc_ts": tss, "html": payloads, "text": texts, "lang": langs},
        schema=PAGES_SCHEMA,
    )
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def ensure_scaling_corpus() -> str:
    """Deterministic det-path-heavy corpus (multi-line bitmap pages),
    written to parquet ONCE and read by both scaling runs.  Synthesis
    is chunked across a process pool (glyph rendering is CPU-bound;
    determinism is per-document, so chunking cannot change content)."""
    import pyarrow as pa

    from rapidocr_ray.sources.pages import write_pages_parquet

    marker = os.path.join(SCALING_CORPUS, f"done-{SCALING_DOCS}")
    if os.path.isfile(marker):
        return SCALING_CORPUS
    from concurrent.futures import ProcessPoolExecutor

    chunk = 2048
    spans = [
        (s, min(chunk, SCALING_DOCS - s)) for s in range(0, SCALING_DOCS, chunk)
    ]
    with ProcessPoolExecutor(max_workers=min(16, os.cpu_count() or 8)) as pool:
        blobs = list(pool.map(_synth_scaling_chunk, spans))
    tables = [pa.ipc.open_stream(b).read_all() for b in blobs]
    table = pa.concat_tables(tables)
    write_pages_parquet(table, SCALING_CORPUS, n_files=32)
    open(marker, "w").close()
    return SCALING_CORPUS


def _mp_cascade_rate(n_procs: int, pin_cores: int | None) -> float:
    """Hardware-ceiling probe: the cascade kernel in plain
    multiprocessing (no Ray, pages in-process) at the same process
    counts the Ray pools use.  The ratio of these rates is the
    single-box scaling ceiling the Ray number should be read against
    (a real N vs 4N cluster has 4x the memory bandwidth; one box does
    not)."""
    import shutil
    import subprocess

    code = (
        "import multiprocessing as mp, time, sys\n"
        "def work(n_docs, q):\n"
        "    import sys; sys.path.insert(0, %r)\n"
        "    import numpy as np\n"
        "    from rapidocr_ray import glyphs\n"
        "    from rapidocr_ray.sources.pages import _rand_text, wrap_lines\n"
        "    from rapidocr_ray.stages.cascade import TextDetector, TextRecognizer, TextClassifier\n"
        "    from rapidocr_ray.config import PipelineConfig\n"
        "    from rapidocr_ray.functions.imgproc import crop_box, sorted_boxes\n"
        "    pages = []\n"
        "    for i in range(20):\n"
        "        r = np.random.default_rng(990_001+i)\n"
        "        text = _rand_text(r, int(r.integers(24,56)))\n"
        "        pages.append(glyphs.render_page(wrap_lines(text, width=48), margin=28, line_gap=32))\n"
        "    cfg = PipelineConfig(); det = TextDetector(cfg.Det); cls = TextClassifier(cfg.Cls); rec = TextRecognizer(cfg.Rec)\n"
        "    for p in pages[:2]:\n"
        "        b = sorted_boxes(det(p)); c = [crop_box(p, np.asarray(x)) for x in b]; c, _ = cls(c); rec(c)\n"
        "    t0 = time.perf_counter(); done = 0\n"
        "    while done < n_docs:\n"
        "        p = pages[done %% 20]\n"
        "        b = sorted_boxes(det(p)); c = [crop_box(p, np.asarray(x)) for x in b]; c, _ = cls(c); rec(c)\n"
        "        done += 1\n"
        "    q.put(done / (time.perf_counter() - t0))\n"
        "if __name__ == '__main__':\n"
        "    k = int(sys.argv[1])\n"
        "    q = mp.Queue()\n"
        "    ps = [mp.Process(target=work, args=(200, q)) for _ in range(k)]\n"
        "    for p in ps: p.start()\n"
        "    rates = [q.get() for _ in ps]\n"
        "    for p in ps: p.join()\n"
        "    print(sum(rates))\n"
    ) % os.path.dirname(os.path.abspath(__file__))
    path = "/tmp/rapidocr_ray_ceiling_probe.py"
    with open(path, "w") as f:
        f.write(code)
    cmd = [sys.executable, path, str(n_procs)]
    taskset = shutil.which("taskset")
    if pin_cores and taskset:
        cmd = [taskset, "-c", f"0-{pin_cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True).stdout
    return float(out.strip().splitlines()[-1])


def _cpu_counters() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def _steal_pct(before: list[int], after: list[int]) -> float:
    d = [y - x for x, y in zip(before, after)]
    total = sum(d) or 1
    return round(100.0 * d[7] / total, 1)  # field 8 = steal


def scaling() -> None:
    """Two fresh processes at 8 and 32 CPUs over the same input.

    Records hypervisor steal%% during each child: this box is a shared
    VM (measured up to ~16%% steal under load), so single-run efficiency
    jitters — read the efficiency together with the steal columns."""
    ensure_scaling_corpus()
    import shutil

    taskset = shutil.which("taskset")
    results = {}
    steal = {}
    # 32-wide FIRST: the shared VM's full-width capacity degrades in
    # minutes-long phases, and the wide run is the sensitive side (the
    # pinned 8-cpu run tracks its own probe at ~100% in every recorded
    # window) — running it immediately maximizes the chance it lands in
    # the same window the caller gated on
    for ncpu in (32, 8):
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR, GRAFT_HEADLINE="1"
        )
        cmd = [sys.executable, os.path.abspath(__file__)]
        if taskset and ncpu < (os.cpu_count() or ncpu):
            # pin the small run to ncpu hardware threads: an N-node
            # cluster has N nodes' worth of cores and memory bandwidth;
            # letting the "small cluster" borrow the big machine's idle
            # cores would understate true scaling
            cmd = [taskset, "-c", f"0-{ncpu - 1}"] + cmd
        c0 = _cpu_counters()
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True
        ).stdout
        steal[ncpu] = _steal_pct(c0, _cpu_counters())
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    t8 = results[8]["value"]
    t32 = results[32]["value"]
    eff = (t8 / t32) / (32 / 8)
    # same-run hardware ceiling at the pool sizes the two runs used
    # (7 actors on 8 pinned cores, 30 on 32)
    ceil_small = _mp_cascade_rate(7, pin_cores=8)
    ceil_big = _mp_cascade_rate(30, pin_cores=None)
    ceiling = (ceil_big / ceil_small) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (8 -> 32 cpus, same input)",
                "sec_8cpu": t8,
                "sec_32cpu": t32,
                "docs_per_s_8cpu": results[8]["throughput"]["extract_docs_per_s"],
                "docs_per_s_32cpu": results[32]["throughput"]["extract_docs_per_s"],
                "scaling_efficiency": round(eff, 3),
                "steal_pct_8cpu_window": steal[8],
                "steal_pct_32cpu_window": steal[32],
                "hardware_ceiling_efficiency": round(ceiling, 3),
                "ceiling_docs_per_s_7procs": round(ceil_small, 1),
                "ceiling_docs_per_s_30procs": round(ceil_big, 1),
            }
        )
    )


def headline_only() -> None:
    """Inner run for --scaling: cascade-heavy extraction over the
    pre-written parquet corpus, one JSON line."""
    import glob

    _init_ray()
    import ray
    import ray.data

    from rapidocr_ray.pipelines.extract import build_extract_pipeline

    corpus = ensure_scaling_corpus()
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    # warm page cache (untimed read)
    import pyarrow.parquet as pq

    for f in files:
        pq.read_table(f)
    # untimed warm-up execution: starts Ray worker processes, ships the
    # by-value module code, imports numpy in every worker — session
    # fixed costs that a steady-state cluster would have amortized
    from rapidocr_ray.pipelines.extract import read_pages as _rp

    warm = build_extract_pipeline(_rp(files[:2]), dedup=True)
    for _ in warm.iter_batches(batch_format="pyarrow", batch_size=4096):
        pass
    from rapidocr_ray.pipelines.extract import read_pages

    # best of 3 timed iterations: the host is a shared VM (steal
    # spikes) and the 32-cpu wall jitters ~±1s run-to-run; the minimum
    # over identical full-work iterations is the steady-state figure
    sec = float("inf")
    n = 0
    n_iters = 3 if SCALING_DOCS <= 32000 else 2
    for _ in range(n_iters):
        t0 = time.perf_counter()
        ds = build_extract_pipeline(read_pages(files), dedup=True, winners_files=files)
        # sink-style consumption: drain result blocks where they live
        # (object store) instead of pulling every batch into the driver
        # heap — what a write_parquet sink does; iter_batches costs a
        # measured ~15% of wall in driver-side block fetch+conversion
        n = 0
        for bundle in ds.iter_internal_ref_bundles():
            n += bundle.num_rows() or 0
        sec = min(sec, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "extraction wall time (det-path corpus)",
                "value": round(sec, 3),
                "unit": "sec",
                "throughput": {"extract_docs_per_s": round(n / sec, 2)},
                "num_cpus": NUM_CPUS,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif os.environ.get("GRAFT_HEADLINE"):
        headline_only()
    else:
        main()
