"""Round-5 training-data ops: benchmark decontamination, exact
histogram quantiles, vectorized JSON field extraction."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rapidocr_ray.pipelines import queries as q


def _docs_dir(tmp_path, ids, texts, langs=None, n_chars=None):
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": texts,
            "lang": langs or ["en"] * len(ids),
            "n_chars": pa.array(
                n_chars or [len(t) for t in texts], type=pa.int64()
            ),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _oracle(sf_dir, name, tables=("documents",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(q.ORACLE_SQL[name]).df()


def test_decontam_planted_leak_is_flagged(ray_session, tmp_path):
    """A corpus doc embedding a benchmark doc's 16-byte phrase flags 1;
    an unrelated doc flags 0; a sub-window doc flags 0; a non-ASCII doc
    is excluded (same precondition as the fingerprint family) — and the
    whole table matches the oracle."""
    leak = "UNIQUE-EVAL-ANSWER-PHRASE-42"  # >= 16 bytes
    ids = [0, 1, 2, 3, 4]  # doc 0 is benchmark (0 % 97 == 0)
    texts = [
        "benchmark question with " + leak + " inside it",
        "an innocent training document with nothing shared at all",
        "a scraped page that copied " + leak + " verbatim from the eval",
        "tiny",  # shorter than one window: cannot be contaminated
        "café au lait non-ascii doc sharing " + leak,  # excluded
    ]
    d = _docs_dir(tmp_path, ids, texts)
    got = (
        q.QUERIES["decontam_flags"](d)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    flags = dict(zip(got.doc_id, got.contaminated))
    assert flags == {1: 0, 2: 1, 3: 0}  # no benchmark row, no non-ASCII row
    want = (
        _oracle(d, "decontam_flags").sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quantile_disc_formula_matches_duckdb_fuzz():
    """The histogram quantile index convention — sorted[max(0,
    ceil(q*n) - 1)] — is DuckDB's quantile_disc, fuzzed over random
    arrays and the standard quantiles."""
    con = duckdb.connect()
    rng = np.random.RandomState(7)
    for _ in range(40):
        n = int(rng.randint(1, 200))
        vals = sorted(int(v) for v in rng.randint(0, 500, size=n))
        for qq in (0.5, 0.9, 0.99):
            want = con.execute(
                f"SELECT quantile_disc(x, {qq}) FROM (SELECT unnest({vals}) AS x)"
            ).fetchone()[0]
            idx = max(0, math.ceil(qq * n) - 1)
            assert vals[idx] == want, (n, qq)


def test_length_quantiles_per_lang_matches_oracle(ray_session, tmp_path):
    """Per-lang exact quantiles off the bounded histogram: skewed group
    sizes, duplicate lengths, and a singleton language."""
    rng = np.random.RandomState(11)
    ids, texts, langs, n_chars = [], [], [], []
    sizes = {"en": 137, "de": 40, "zh": 1}
    i = 0
    for lang, cnt in sizes.items():
        for _ in range(cnt):
            ln = int(rng.choice([50, 50, 80, 200, 333]))
            ids.append(i)
            texts.append("x" * ln)
            langs.append(lang)
            n_chars.append(ln)
            i += 1
    d = _docs_dir(tmp_path, ids, texts, langs=langs, n_chars=n_chars)
    got = (
        q.QUERIES["length_quantiles_per_lang"](d)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    want = (
        _oracle(d, "length_quantiles_per_lang")
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got.lang) == set(sizes)


def test_props_extract_skips_missing_k_like_the_oracle(ray_session, tmp_path):
    """Rows whose props lack the field are null on BOTH sides (regex
    no-match == json_extract null) and drop out of count/sum/min/max;
    avg is the exact-int division."""
    tbl = pa.table(
        {
            "event_id": pa.array(range(8), type=pa.int64()),
            "ts": pa.array([0] * 8, type=pa.timestamp("us")),
            "user_id": pa.array([1] * 8, type=pa.int64()),
            "event_type": ["a", "a", "a", "b", "b", "b", "c", "c"],
            "value": pa.array([0.0] * 8, type=pa.float64()),
            "props": [
                '{"k": 10}',
                '{"k": -3}',
                '{"other": 1}',  # no k: skipped by both sides
                '{"k": 7}',
                '{"k": 7}',
                '{"j": 0}',  # no k
                '{"j": 1}',  # event_type c: NO valid k at all ->
                '{"j": 2}',  # absent from both outputs, not all-null
            ],
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    got = (
        q.QUERIES["props_extract_stats"](str(d))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = (
        _oracle(str(d), "props_extract_stats", tables=("events",))
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    a = got[got.event_type == "a"].iloc[0]
    assert (a.n, a.sum_k, a.min_k, a.max_k) == (2, 7, -3, 10)
    assert a.avg_k == pytest.approx(3.5)
    assert set(got.event_type) == {"a", "b"}  # c has no valid k


def test_orders_antijoin_drops_fully_matched_priority(ray_session, tmp_path):
    """A priority whose every order has lineitems must be ABSENT (an
    anti-join emits no zero rows); unmatched orders aggregate per
    priority with exact cents."""
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
            "o_custkey": pa.array([1] * 4, type=pa.int64()),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": pa.array([10.005, 20.0, 30.5, 40.0], type=pa.float64()),
            "o_orderdate": ["1996-01-01"] * 4,
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH"],
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([3, 4, 4], type=pa.int64()),  # 2-HIGH matched
            "l_extendedprice": pa.array([1.0, 1.0, 1.0], type=pa.float64()),
            "l_discount": pa.array([0.0] * 3, type=pa.float64()),
        }
    )
    d = tmp_path / "tpc"
    d.mkdir()
    pq.write_table(orders, str(d / "orders.parquet"))
    pq.write_table(lineitem, str(d / "lineitem.parquet"))
    got = (
        q.QUERIES["orders_antijoin"](str(d))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert got.o_orderpriority.tolist() == ["1-URGENT"]
    assert got.n_orders.tolist() == [2]
    assert got.total_cents.tolist() == [1001 + 2000]  # floor(x*100+0.5)
    want = (
        _oracle(str(d), "orders_antijoin", tables=("orders", "lineitem"))
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_user_running_totals_tiebreak_is_event_id(ray_session, tmp_path):
    """Two events at the SAME timestamp order by event_id on both
    sides, so the running sums are stable; users never mix."""
    tbl = pa.table(
        {
            "event_id": pa.array([5, 2, 9, 1], type=pa.int64()),
            "ts": pa.array([100, 100, 50, 60], type=pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
            "event_type": ["x"] * 4,
            "value": pa.array([1.0, 2.0, 4.0, 8.0], type=pa.float64()),
            "props": ['{"k": 0}'] * 4,
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    got = (
        q.QUERIES["user_running_totals"](str(d))
        .to_pandas()
        .sort_values(["user_id", "running_n"])
        .reset_index(drop=True)
    )
    # user 1 order: ts50(id9, 400c) -> ts100(id2, 200c) -> ts100(id5, 100c)
    u1 = got[got.user_id == 1]
    assert u1.event_id.tolist() == [9, 2, 5]
    assert u1.running_cents.tolist() == [400, 600, 700]
    want = (
        _oracle(str(d), "user_running_totals", tables=("events",))
        .sort_values(["user_id", "running_n"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
