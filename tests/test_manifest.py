"""Resumable runner: per-partition manifests, atomic writes,
skip-finished semantics (north rule: resume mid-job without
recomputation)."""

import json
import os

import pytest

from rapidocr_ray.sources.pages import synth_pages, write_pages_parquet
from rapidocr_ray.state import manifest as mf


@pytest.fixture(scope="module")
def sharded_input(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_in")
    table = synth_pages(80, seed=42)
    paths = write_pages_parquet(table, str(d), n_files=4)
    return paths


def test_run_writes_manifests(ray_session, sharded_input, tmp_path):
    out = str(tmp_path / "out")
    report = mf.run_resumable(sharded_input, out)
    assert report["n_partitions"] == 4
    assert report["skipped"] == []
    assert report["row_count"] > 0
    for pid in range(4):
        mpath = mf.manifest_path(out, pid)
        assert os.path.isfile(mpath)
        m = json.load(open(mpath))
        assert m["partition_id"] == pid
        assert m["row_count"] > 0
        assert m["content_hash"]
        assert m["input_files"] == [sharded_input[pid]]
        assert "html" in m["routes"]


def test_resume_skips_finished(ray_session, sharded_input, tmp_path):
    out = str(tmp_path / "out")
    first = mf.run_resumable(sharded_input, out)
    # damage partition 2: remove it entirely (simulated failure)
    import shutil

    shutil.rmtree(mf.partition_dir(out, 2))
    second = mf.run_resumable(sharded_input, out)
    assert sorted(second["skipped"]) == [0, 1, 3]
    # recomputed partition must be byte-equivalent (content_hash lineage)
    h1 = first["manifests"][2]["content_hash"]
    h2 = second["manifests"][2]["content_hash"]
    assert h1 == h2
    assert second["row_count"] == first["row_count"]


def test_partial_tmp_dir_not_counted(tmp_path):
    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "part-00007.tmp"))
    assert mf.completed_partitions(out) == set()


def test_incomplete_partition_without_manifest_not_counted(tmp_path):
    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "part-00003"))
    assert mf.completed_partitions(out) == set()
