"""S6/S7 writers, base64 ingest adapter, A4 most-angle, CLI e2e."""

import base64
import json
import os

import numpy as np
import pytest

from rapidocr_ray import glyphs
from rapidocr_ray.sources.writers import (
    decode_data_url,
    render_boxes,
    result_to_json,
)


def test_render_boxes_burns_outline():
    img = np.zeros((20, 30), dtype=np.uint8)
    out = render_boxes(img, [[[2, 3], [10, 3], [10, 8], [2, 8]]])
    assert out[3, 2] == 128 and out[8, 10] == 128
    assert out[5, 5] == 0  # interior untouched
    assert img.sum() == 0  # original untouched


def test_result_to_json_numpy_aware():
    s = result_to_json(
        {"box": np.array([[1, 2]]), "score": np.float32(0.5), "n": np.int64(3), "b": b"\x01"}
    )
    d = json.loads(s)
    assert d["box"] == [[1, 2]] and d["score"] == 0.5 and d["n"] == 3
    assert base64.b64decode(d["b"]) == b"\x01"


def test_decode_data_url():
    payload = b"hello bytes"
    url = "data:image/png;base64," + base64.b64encode(payload).decode()
    assert decode_data_url(url) == payload
    assert decode_data_url(base64.b64encode(payload).decode()) == payload


class TestMostAngle:
    """A4 (C++-only mostAngle, AngleNet.cpp:113-130)."""

    def test_vote(self):
        from rapidocr_ray.stages.cascade import most_angle

        assert most_angle([("180", 0.9), ("180", 0.9), ("0", 0.9)]) == "180"
        assert most_angle([("180", 0.9), ("0", 0.9)]) == "0"  # 0.5 not > 0.5
        assert most_angle([]) == "0"

    def test_apply_rotates_all_or_none(self):
        from rapidocr_ray.config import PipelineConfig
        from rapidocr_ray.stages.cascade import TextClassifier, apply_most_angle

        cls = TextClassifier(PipelineConfig().Cls)
        up = glyphs.render_line("hello world")
        down = up[::-1, ::-1].copy()
        crops = [down, down, up]  # majority rotated
        res = cls.classify_only(crops)
        fixed = apply_most_angle(crops, res)
        # every crop rotated (even the upright one) — C++ semantics
        assert (fixed[0] == up).all()
        assert (fixed[2] == up[::-1, ::-1]).all()


def test_cli_end_to_end(ray_session, tmp_path):
    from rapidocr_ray.cli import main
    from rapidocr_ray.sources.pages import synth_pages, write_pages_parquet

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    write_pages_parquet(synth_pages(40, seed=42), str(in_dir), n_files=2)
    rc = main(
        [
            "--input", str(in_dir / "*.parquet"),
            "--output", str(out_dir),
            "--set", "text_score=0.5",
            "--set", "det_box_thresh=0.5",
        ]
    )
    assert rc == 0
    assert os.path.isfile(out_dir / "part-00000" / "manifest.json")
    assert any(
        f.endswith(".parquet") for f in os.listdir(out_dir / "part-00001")
    )  # streamed sink: one file per output block, Ray-named
    # resume run skips both
    rc2 = main(["--input", str(in_dir / "*.parquet"), "--output", str(out_dir)])
    assert rc2 == 0


def test_cli_override_parsing():
    from rapidocr_ray.cli import parse_overrides

    out = parse_overrides(["det_thresh=0.4", "use_cls=false", "html_join_sep=\" \""])
    assert out["det_thresh"] == 0.4
    assert out["use_cls"] is False


def test_bucketed_sink_purity_and_pruned_read(ray_session, tmp_path):
    """Every row lands in exactly one bucket dir by the shared hash;
    a single-bucket read returns only (and all of) its rows; string
    and integer keys both bucket deterministically."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    import pytest

    from rapidocr_ray.sources.writers import (
        _splitmix64,
        read_bucketed_parquet,
        write_bucketed_parquet,
    )

    ids = np.arange(500, dtype=np.int64)
    tbl = pa.table({"doc_id": ids, "v": ids * 7})
    out = str(tmp_path / "bucketed")
    write_bucketed_parquet(ray.data.from_arrow(tbl), out, key="doc_id", n_buckets=8)
    want_bucket = _splitmix64(ids.astype(np.uint64)) % np.uint64(8)
    total = 0
    for b in range(8):
        got = read_bucketed_parquet(out, b).to_pandas()
        want_ids = set(ids[want_bucket == b].tolist())
        assert set(got.doc_id.tolist()) == want_ids, b
        total += len(got)
    assert total == 500
    # strided keys (multiples of n_buckets) must SPREAD, not collapse
    # into one bucket (the low-bits pathology the mixer exists for)
    strided = np.arange(0, 1024, 16, dtype=np.int64)
    assert len(set((_splitmix64(strided.astype(np.uint64)) % np.uint64(16)).tolist())) > 8
    # empty bucket reads as zero rows, not FileNotFoundError
    out2 = str(tmp_path / "sparse")
    write_bucketed_parquet(
        ray.data.from_arrow(pa.table({"doc_id": ids[:2], "v": ids[:2]})),
        out2, key="doc_id", n_buckets=64,
    )
    empties = sum(
        read_bucketed_parquet(out2, b).count() == 0 for b in range(64)
    )
    assert empties >= 62
    # null keys are a loud typed error, never a silent bucket
    with pytest.raises(Exception) as ei:
        write_bucketed_parquet(
            ray.data.from_arrow(pa.table({"k": ["a", None]})),
            str(tmp_path / "nulls"), key="k",
        )
    assert "contains nulls" in str(ei.value)
