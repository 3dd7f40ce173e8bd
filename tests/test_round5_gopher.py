"""Gopher-rule quality filter: per-rule edges + randomized oracle parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rapidocr_ray.pipelines import queries as q


def _docs_dir(tmp_path, ids, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": texts,
            "lang": ["en"] * len(ids),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _oracle(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(q.ORACLE_SQL["gopher_quality_filter"]).df()


def _compare(got, want_df):
    df = got.to_pandas()
    cols = sorted(df.columns)
    assert cols == sorted(want_df.columns), (cols, sorted(want_df.columns))
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = want_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    return df


def test_gopher_rules_per_rule_edges(ray_session, tmp_path):
    texts = [
        "the quick brown fox jumps",        # 0: clean -> keep
        "the cat",                           # 1: too short (n_words < 5)
        "x y z w v u the",                   # 2: mean word len 1000 < 2000
        "1 22 333 4444 55555 6666",          # 3: no alpha words, no stopword
        "spam ham spam ham spam ham the x",  # 4: duplicated 2-grams dominate
        "the word the word the word",        # 5: dup pairs + stopwords
        "single",                            # 6: one word, no pairs
        "",                                  # 7: empty -> '' token
    ]
    d = _docs_dir(tmp_path, list(range(len(texts))), texts)
    df = _compare(q.QUERIES["gopher_quality_filter"](d), _oracle(d))
    r = df.set_index("doc_id")
    assert bool(r.loc[0, "keep"])
    assert not bool(r.loc[1, "keep"]) and r.loc[1, "n_words"] == 2
    assert not bool(r.loc[2, "keep"]) and r.loc[2, "mean_word_len_milli"] < 2000
    assert not bool(r.loc[3, "keep"]) and r.loc[3, "frac_alpha_milli"] == 0
    assert r.loc[3, "stopword_hits"] == 0
    assert not bool(r.loc[4, "keep"]) and r.loc[4, "dup2gram_milli"] > 600
    # doc 5: 'the word' x3 and 'word the' x2 -> every pair duplicated
    assert r.loc[5, "dup2gram_milli"] == 1000
    assert r.loc[6, "dup2gram_milli"] == 0  # no pairs at all
    assert r.loc[7, "n_words"] == 1  # '' splits to one empty token


def test_gopher_dup2gram_exact_value(ray_session, tmp_path):
    """Hand-computed fraction: 'a b a b c' has pairs [a b],[b a],[a b],
    [b c]; 'a b' duplicated -> dup chars = len(a)+len(a) = 2 of total
    len(a)+len(b)+len(a)+len(b) = 4 -> 500 milli."""
    d = _docs_dir(tmp_path, [0], ["a b a b c"])
    df = _compare(q.QUERIES["gopher_quality_filter"](d), _oracle(d))
    assert df.dup2gram_milli.iloc[0] == 500


def test_gopher_randomized_cross_check(ray_session, tmp_path):
    rng = np.random.default_rng(20260820)
    vocab = np.array(
        [f"w{i}" for i in range(25)]
        + ["the", "a", "of", "in"]
        + ["123", "45", "!!!", "---"]
    )
    n = 250
    texts = []
    for i in range(n):
        k = int(rng.integers(1, 30))
        ws = list(rng.choice(vocab, size=k))
        if i % 7 == 0 and k >= 4:  # plant heavy pair repetition
            ws = ws[:2] * (k // 2)
        texts.append(" ".join(ws))
    texts[0] = ""
    d = _docs_dir(tmp_path, list(range(n)), texts)
    _compare(q.QUERIES["gopher_quality_filter"](d), _oracle(d))


def test_user_event_gaps_lag_semantics(ray_session, tmp_path):
    """Sub-second timestamps: the exact-microsecond LAG delta must match
    DuckDB (date_diff('microsecond')) including the -1 first-event
    sentinel and the (ts, event_id) tiebreak on equal timestamps."""
    rows = [
        (1, "2026-01-01T00:00:00.900000", 7, "view"),
        (2, "2026-01-01T00:00:01.000000", 7, "view"),   # 100ms gap
        (3, "2026-01-01T00:00:01.000000", 7, "click"),  # tie -> event_id order
        (4, "2026-01-01T00:00:05.000000", 9, "view"),   # other user: sentinel
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[1], "us") for r in rows], type=pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([1.0] * len(rows), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = con.execute(q.ORACLE_SQL["user_event_gaps"]).df()
    df = _compare(q.QUERIES["user_event_gaps"](str(d)), want)
    r = df.set_index("event_id").gap_us
    assert r[1] == -1 and r[4] == -1
    assert r[2] == 100_000  # 100 ms in exact microseconds
    assert r[3] == 0  # equal ts, tiebreak by event_id


def test_snapshot_full_outer_all_three_regions(ray_session, tmp_path):
    """Hand-planted snapshot diff: a key only in PRIOR (doc_id%3==0), a
    key only in NEW, and a shared key — full-outer zero-fill on both
    engines; docs sharing the first 8 words collapse to one key."""
    texts = [
        "gone gone gone",              # 0 (prior): prior-only key
        "fresh fresh fresh",           # 1 (new): new-only key
        "same same same",              # 2 (new): shared key ...
        "same same same",              # 3 (prior): ... also in prior
        "fresh fresh fresh",           # 4 (new): second new hit
        "w1 w2 w3 w4 w5 w6 w7 w8 TAIL DIFFERS",   # 5 (new): 8-word prefix ...
        "w1 w2 w3 w4 w5 w6 w7 w8 OTHER TAIL",     # 6 (prior): ... same key
    ]
    d = _docs_dir(tmp_path, [0, 1, 2, 3, 4, 5, 6], texts)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(q.ORACLE_SQL["snapshot_full_outer"]).df()
    df = _compare(q.QUERIES["snapshot_full_outer"](d), want)
    by = df.set_index("fp_md5")
    assert len(df) == 4
    counts = sorted(map(tuple, df[["n_prior", "n_new"]].to_numpy().tolist()))
    # (prior, new): gone=(1,0), fresh=(0,2), same=(1,1), w1..w8=(1,1)
    assert counts == [(0, 2), (1, 0), (1, 1), (1, 1)]


def test_events_cube_four_grouping_sets(ray_session, tmp_path):
    """Two types x two hours: the cube must emit exactly fine(≤4) +
    by-type(2) + by-hour(2) + total(1) rows with consistent sums, and
    match GROUP BY CUBE bit-for-bit."""
    rows = [
        (1, "2026-01-01T03:10:00", 1, "view", 2.5),
        (2, "2026-01-01T03:20:00", 1, "click", 1.0),
        (3, "2026-01-01T07:30:00", 2, "view", 4.0),
        (4, "2026-01-01T07:40:00", 2, "view", 0.5),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[1], "us") for r in rows], type=pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = con.execute(q.ORACLE_SQL["events_cube"]).df()
    df = _compare(q.QUERIES["events_cube"](str(d)), want)
    # 3 fine cells + 2 type subtotals + 2 hour subtotals + 1 total
    assert len(df) == 8
    total = df[(df.event_type == "ALL") & (df.hour == -1)]
    assert total.n_events.iloc[0] == 4 and total.value_cents.iloc[0] == 800
    hour7 = df[(df.event_type == "ALL") & (df.hour == 7)]
    assert hour7.n_events.iloc[0] == 2 and hour7.value_cents.iloc[0] == 450


def test_salted_running_totals_hot_key(ray_session, tmp_path):
    """One user owns 95% of events spread over many hours (the skew case
    the salted plan exists for), with boundary ties and same-ts rows —
    the range-salted prefix plan must equal the window oracle exactly."""
    rows = []
    eid = 0
    for h in range(12):  # hot user: 20 events in each of 12 hour buckets
        for j in range(20):
            rows.append((eid, f"2026-01-01T{h:02d}:{j:02d}:30", 7, "view", 1.25))
            eid += 1
    rows.append((eid, "2026-01-01T03:00:00", 9, "view", 2.0)); eid += 1
    rows.append((eid, "2026-01-01T03:00:00", 9, "view", 3.0)); eid += 1  # same-ts tie
    # boundary: hot user event exactly on an hour edge
    rows.append((eid, "2026-01-01T05:00:00", 7, "view", 0.5)); eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[1], "us") for r in rows], type=pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = con.execute(q.ORACLE_SQL["user_running_totals_salted"]).df()
    df = _compare(q.QUERIES["user_running_totals_salted"](str(d)), want)
    hot = df[df.user_id == 7].sort_values("running_n")
    assert hot.running_n.tolist() == list(range(1, 242))
    # the boundary event lands inside hour 5's bucket after 5 full hours
    assert len(df[df.user_id == 9]) == 2


def test_gopher_dup2gram_property_vs_scalar(ray_session, tmp_path):
    """Vectorized duplicate-2-gram fraction == per-doc scalar counting
    on random corpora with planted repetition."""
    rng = np.random.default_rng(17)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    texts = []
    for _ in range(80):
        k = int(rng.integers(1, 12))
        ws = [vocab[rng.integers(0, len(vocab))] for _ in range(k)]
        texts.append(" ".join(ws))
    d = _docs_dir(tmp_path, list(range(len(texts))), texts)
    df = (
        q.QUERIES["gopher_quality_filter"](d)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, t in enumerate(texts):
        ws = t.split(" ")
        pairs = [(ws[j], ws[j + 1]) for j in range(len(ws) - 1)]
        from collections import Counter

        cnt = Counter(pairs)
        dup = sum(len(p[0]) for p in pairs if cnt[p] >= 2)
        tot = sum(len(p[0]) for p in pairs)
        want = 1000 * dup // tot if tot else 0
        assert df.loc[i, "dup2gram_milli"] == want, (i, t)


def test_decontam_overlap_frac_graded(ray_session, tmp_path):
    """Planted contamination gradient: a doc that IS a benchmark doc's
    text (overlap 1000), a half-contaminated doc, a clean doc, and a
    sub-window doc (0 windows) — exact milli fractions on both engines.
    doc_id 0 is the benchmark row (0 % 97 == 0)."""
    bench_text = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"  # 36 bytes
    texts = [
        bench_text,                              # 0: benchmark row
        bench_text,                              # 1: fully contaminated
        bench_text[:20] + "x" * 30,              # 2: partially contaminated
        "z" * 40,                                # 3: clean
        "short",                                 # 4: < 16 bytes, 0 windows
    ]
    d = _docs_dir(tmp_path, [0, 1, 2, 3, 4], texts)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(q.ORACLE_SQL["decontam_overlap_frac"]).df()
    df = _compare(q.QUERIES["decontam_overlap_frac"](d), want)
    r = df.set_index("doc_id")
    assert 0 not in r.index  # benchmark rows excluded
    assert r.loc[1, "overlap_milli"] == 1000
    assert 0 < r.loc[2, "overlap_milli"] < 1000
    assert r.loc[3, "overlap_milli"] == 0 and r.loc[3, "n_hits"] == 0
    assert r.loc[4, "n_windows"] == 0 and r.loc[4, "overlap_milli"] == 0
