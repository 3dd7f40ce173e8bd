"""Late-round-5 curation widening: token repetition stats, stratified
sampling, normalized dedup groups, conversion funnel, salient terms."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rapidocr_ray.pipelines import queries as q


def _docs_dir(tmp_path, ids, texts, langs=None):
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": texts,
            "lang": langs or ["en"] * len(ids),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _events_dir(tmp_path, rows):
    """rows: list of (event_id, ts_str, user_id, event_type)."""
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
    return str(d)


def _oracle(sf_dir, name, tables=("documents",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(q.ORACLE_SQL[name]).df()


def _compare(got_ds, want_df):
    df = got_ds.to_pandas()
    cols = sorted(df.columns)
    assert cols == sorted(want_df.columns), (cols, sorted(want_df.columns))
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = want_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    return df


def test_token_repetition_stats_edges(ray_session, tmp_path):
    """Repeated tokens, single-token doc, empty text (DuckDB and Arrow
    both split '' into one empty token), and double spaces (both emit
    the empty token) — per-doc counts must match the oracle exactly."""
    d = _docs_dir(
        tmp_path,
        [0, 1, 2, 3],
        ["the the the cat", "solo", "", "a  b"],
    )
    df = _compare(q.QUERIES["token_repetition_stats"](d), _oracle(d, "token_repetition_stats"))
    row = df.set_index("doc_id")
    assert row.loc[0].to_dict() == {"n_tokens": 4, "n_distinct_toks": 2, "top_tok_n": 3}
    assert row.loc[2].to_dict() == {"n_tokens": 1, "n_distinct_toks": 1, "top_tok_n": 1}
    assert row.loc[3].to_dict() == {"n_tokens": 3, "n_distinct_toks": 3, "top_tok_n": 1}


def test_stratified_sample_cap_and_small_group(ray_session, tmp_path):
    """A language over the cap is sampled down to exactly k docs (the k
    smallest hashes — deterministic), a language under the cap keeps
    every doc, and the whole result matches the window-function oracle."""
    ids = list(range(200))
    langs = ["en"] * 150 + ["zh"] * 50
    d = _docs_dir(tmp_path, ids, ["doc %d" % i for i in ids], langs=langs)
    df = _compare(q.QUERIES["stratified_sample"](d), _oracle(d, "stratified_sample"))
    sizes = df.groupby("lang").size()
    assert sizes["en"] == 64 and sizes["zh"] == 50
    # determinism: the en sample is the 64 smallest multiplicative hashes
    hv = (np.arange(150, dtype=np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    want = set(np.argsort(hv, kind="stable")[:64].tolist())
    assert set(df[df.lang == "en"].doc_id) == want


def test_norm_dedup_groups_collapses_variants(ray_session, tmp_path):
    """Case / punctuation / whitespace variants of one text collapse to
    a single group (keeper = min doc_id); distinct texts stay apart;
    non-ASCII letters are normalization-stable on both sides."""
    d = _docs_dir(
        tmp_path,
        [5, 6, 7, 8, 9],
        [
            "Hello, World!",
            "hello   world",
            "hello;world...",
            "another doc",
            "café au lait",  # non-ascii char -> separator on both sides
        ],
    )
    df = _compare(q.QUERIES["norm_dedup_groups"](d), _oracle(d, "norm_dedup_groups"))
    by_keeper = df.set_index("keeper").n_docs.to_dict()
    assert by_keeper == {5: 3, 8: 1, 9: 1}


def test_event_funnel_strict_ordering(ray_session, tmp_path):
    """Funnel semantics pinned: purchase strictly AFTER the first view
    converts (earliest qualifying ts wins); purchase at exactly the
    first-view timestamp does not; purchase-then-view does not;
    single-step users never appear."""
    rows = [
        # user 1: view -> purchase -> purchase (first qualifying wins)
        (0, "2024-01-01T10:00:00", 1, "view"),
        (1, "2024-01-01T11:00:00", 1, "purchase"),
        (2, "2024-01-01T12:00:00", 1, "purchase"),
        # user 2: purchase exactly at first view ts -> no conversion
        (3, "2024-01-02T10:00:00", 2, "view"),
        (4, "2024-01-02T10:00:00", 2, "purchase"),
        # user 3: purchase before the only view -> no conversion
        (5, "2024-01-03T09:00:00", 3, "purchase"),
        (6, "2024-01-03T10:00:00", 3, "view"),
        # user 4: view only; user 5: purchase only
        (7, "2024-01-04T10:00:00", 4, "view"),
        (8, "2024-01-05T10:00:00", 5, "purchase"),
        # user 6: second view earlier than first purchase, purchase
        # after the FIRST view still converts
        (9, "2024-01-06T10:00:00", 6, "view"),
        (10, "2024-01-06T09:00:00", 6, "view"),
        (11, "2024-01-06T09:30:00", 6, "purchase"),
    ]
    d = _events_dir(tmp_path, rows)
    df = _compare(
        q.QUERIES["event_funnel"](d), _oracle(d, "event_funnel", tables=("events",))
    )
    conv = {int(r.user_id): str(r.conv_ts) for r in df.itertuples()}
    assert set(conv) == {1, 6}
    assert conv[1].startswith("2024-01-01 11:00:00")
    assert conv[6].startswith("2024-01-06 09:30:00")


def test_doc_salient_term_tiebreaks(ray_session, tmp_path):
    """Max-tf wins; tf ties break to the RAREST global df, then token
    order — verified against the window-function oracle on a corpus
    crafted so every tiebreak level is exercised."""
    d = _docs_dir(
        tmp_path,
        [0, 1, 2, 3],
        [
            "common common rare rare",  # tf tie 2-2: 'rare' has smaller df
            "common common common zz",  # clear tf winner
            "common rare",  # tf tie 1-1: df decides -> 'rare'
            "aa bb",  # df tie (both 1): token order -> 'aa'
        ],
    )
    df = _compare(q.QUERIES["doc_salient_term"](d), _oracle(d, "doc_salient_term"))
    by_doc = df.set_index("doc_id")
    assert by_doc.loc[0].token == "rare"
    assert by_doc.loc[1].token == "common" and by_doc.loc[1].tf == 3
    assert by_doc.loc[2].token == "rare"
    assert by_doc.loc[3].token == "aa"


def test_widen_multibatch_partials_merge_exactly(ray_session, tmp_path):
    """3000 docs force multiple map_batches calls (default batch_size
    1024), so the stratified-sample local top-k prune and the
    salient-term df partials genuinely merge across tasks — results
    must still be exact vs the oracle."""
    rng = np.random.RandomState(3)
    ids = list(range(3000))
    vocab = ["alpha", "beta", "gamma", "delta"] + ["rare%d" % i for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(3, 12)))
        for _ in ids
    ]
    langs = [["en", "de", "fr"][i % 3] for i in ids]
    d = _docs_dir(tmp_path, ids, texts, langs=langs)
    _compare(q.QUERIES["stratified_sample"](d), _oracle(d, "stratified_sample"))
    _compare(q.QUERIES["doc_salient_term"](d), _oracle(d, "doc_salient_term"))


def _emb_dir(tmp_path, vecs, labels):
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_sliding_window_double_assignment(ray_session, tmp_path):
    """An event at 10:30 lands in BOTH the 10:00 and the 09:00 2-hour
    hopping windows; counts and cents match the UNION-ALL oracle."""
    rows = [
        (0, "2024-01-01T10:30:00", 1, "view"),
        (1, "2024-01-01T11:15:00", 1, "view"),
    ]
    d = _events_dir(tmp_path, rows)
    df = _compare(
        q.QUERIES["sliding_window"](d), _oracle(d, "sliding_window", tables=("events",))
    )
    counts = {str(r.window_start): int(r.n_events) for r in df.itertuples()}
    assert counts == {
        "2024-01-01 09:00:00": 1,
        "2024-01-01 10:00:00": 2,
        "2024-01-01 11:00:00": 1,
    }


def test_events_rollup_levels_consistent(ray_session, tmp_path):
    """Sentinel-encoded ROLLUP: the grand total equals the sum of the
    finest level, per-type subtotals equal their hour rows, and the
    whole frame matches DuckDB's GROUP BY ROLLUP."""
    rows = [
        (0, "2024-01-01T10:30:00", 1, "view"),
        (1, "2024-01-01T10:45:00", 1, "view"),
        (2, "2024-01-01T11:00:00", 2, "purchase"),
        (3, "2024-01-02T10:10:00", 3, "view"),
    ]
    d = _events_dir(tmp_path, rows)
    df = _compare(
        q.QUERIES["events_rollup"](d), _oracle(d, "events_rollup", tables=("events",))
    )
    total = df[(df.event_type == "ALL") & (df.hour == -1)]
    fine = df[(df.event_type != "ALL") & (df.hour != -1)]
    assert int(total.n_events.iloc[0]) == 4 == int(fine.n_events.sum())
    view_sub = df[(df.event_type == "view") & (df.hour == -1)]
    assert int(view_sub.n_events.iloc[0]) == 3


def test_length_outliers_threshold_inclusive_per_lang(ray_session, tmp_path):
    """The p90 gate is inclusive and per-language: a doc exactly at its
    language's p90 survives; thresholds do not leak across languages."""
    ids, texts, langs = [], [], []
    i = 0
    # quantile_disc(0.9) over 10 values picks sorted[8]
    for ln in [10] * 8 + [100, 100]:  # en: p90 = 100
        ids.append(i); texts.append("x" * ln); langs.append("en"); i += 1
    for ln in [50] * 8 + [60, 60]:  # de: p90 = 60 (well under en's)
        ids.append(i); texts.append("x" * ln); langs.append("de"); i += 1
    d = _docs_dir(tmp_path, ids, texts, langs=langs)
    df = _compare(q.QUERIES["length_outliers"](d), _oracle(d, "length_outliers"))
    assert set(zip(df.lang, df.n_chars)) == {("en", 100), ("de", 60)}
    assert len(df) == 4  # exactly the two docs at-or-above p90 per lang


def test_embedding_stats_bit_exact_fuzz(ray_session, tmp_path):
    """The sequential float64-over-float32-squares accumulation matches
    DuckDB's list_sum semantics bit-for-bit over random vectors
    (pairwise np.sum would not) — including negative first components
    (floor toward -inf on both sides)."""
    rng = np.random.RandomState(21)
    vecs = rng.randn(400, 64).astype(np.float32) * 3.0
    labels = (np.arange(400) % 7).astype(np.int32)
    d = _emb_dir(tmp_path, vecs, labels)
    df = _compare(
        q.QUERIES["embedding_stats"](d),
        _oracle(d, "embedding_stats", tables=("embeddings",)),
    )
    assert (df.c0_bin < 0).any() and (df.c0_bin > 0).any()


def test_salient_and_repetition_randomized_cross_check(ray_session, tmp_path):
    """Randomized corpora engineered for tie storms (tiny vocab, short
    docs → many max-tf ties and equal-df tokens): both operators must
    match DuckDB on every seed."""
    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        vocab = ["a", "b", "c", "dd", "ee"]
        ids = list(range(120))
        texts = [
            " ".join(rng.choice(vocab, size=rng.randint(1, 6))) for _ in ids
        ]
        sub = tmp_path / f"s{seed}"
        sub.mkdir()
        d = _docs_dir(sub, ids, texts)
        _compare(q.QUERIES["doc_salient_term"](d), _oracle(d, "doc_salient_term"))
        _compare(
            q.QUERIES["token_repetition_stats"](d),
            _oracle(d, "token_repetition_stats"),
        )


def test_widen_queries_match_duckdb_at_sf(ray_session):
    """All five new registry entries hash-match their oracles over the
    real sf0.001 tables (the driver-shaped comparison)."""
    SF = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    for name in (
        "token_repetition_stats",
        "stratified_sample",
        "norm_dedup_groups",
        "event_funnel",
        "doc_salient_term",
    ):
        _compare(q.QUERIES[name](SF), con.execute(q.ORACLE_SQL[name]).df())


def test_events_rollup_empty_input_emits_grand_total(ray_session, tmp_path):
    """ROLLUP over an EMPTY events table still emits the
    empty-grouping-set row ('ALL', -1, 0, 0) — matching DuckDB
    (review finding: the kernel used to return zero rows)."""
    d = _events_dir(tmp_path, [])
    df = _compare(
        q.QUERIES["events_rollup"](d), _oracle(d, "events_rollup", tables=("events",))
    )
    assert len(df) == 1
    r = df.iloc[0]
    assert (r.event_type, int(r.hour), int(r.n_events), int(r.value_cents)) == (
        "ALL", -1, 0, 0,
    )


def test_new_ops_empty_inputs_match_oracle(ray_session, tmp_path):
    """The events_rollup bug class, swept across every new operator:
    empty documents/events/embeddings tables must produce exactly what
    DuckDB produces (usually zero rows; ROLLUP's grand total is the
    exception, covered above)."""
    docs_d = tmp_path / "docs_e"
    docs_d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        str(docs_d / "documents.parquet"),
    )
    d_docs = str(docs_d)
    d_ev = _events_dir(tmp_path, [])
    emb_d = tmp_path / "emb_e"
    emb_d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float32())),
                "label": pa.array([], type=pa.int32()),
            }
        ),
        str(emb_d / "embeddings.parquet"),
    )
    # NOTE: a zero-block Ray dataset loses its schema through
    # map_batches (the UDF never runs), so only ROW-COUNT equality is
    # checkable here — the property that matters is that no operator
    # crashes or invents rows on empty input (the ROLLUP bug class).
    doc_ops = [
        "token_repetition_stats",
        "stratified_sample",
        "norm_dedup_groups",
        "doc_salient_term",
        "length_outliers",
        "heavy_hitter_tokens",
        "lang_distinct_hll",
    ]
    ev_ops = ["event_funnel", "sliding_window"]
    for name in doc_ops:
        got = q.QUERIES[name](d_docs).to_pandas()
        assert len(got) == len(_oracle(d_docs, name)) == 0, name
    for name in ev_ops:
        got = q.QUERIES[name](d_ev).to_pandas()
        assert len(got) == len(_oracle(d_ev, name, tables=("events",))) == 0, name
    got = q.QUERIES["embedding_stats"](str(emb_d)).to_pandas()
    assert len(got) == len(
        _oracle(str(emb_d), "embedding_stats", tables=("embeddings",))
    ) == 0
