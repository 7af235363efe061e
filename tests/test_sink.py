"""Resumable partitioned sink: manifests, resume skip, crash recovery."""

import json
import shutil
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from h3ray.io import pages as pages_io, sink
from h3ray.pipelines import geotag

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "sink")


def build_ds():
    ds = pages_io.pages_from_documents(SF)
    return geotag.geotag_cells(ds, res=7, parent_res=1,
                               keep_cols=("url",)).select_columns(
        ["url", "cell_r7", "parent_r1"])


def test_write_and_manifests(ray_session, out_dir):
    job = sink.write_partitioned(build_ds(), out_dir, "parent_r1", "sig-a")
    assert job["skipped"] == 0 and job["partitions"] > 1
    mdir = Path(out_dir) / "_manifests"
    manifests = [p for p in mdir.glob("*.json") if p.name != "_job.json"]
    assert len(manifests) == job["partitions"]
    # Row counts in manifests match the parquet footers.
    counts = sink.partition_row_counts(out_dir, "parent_r1")
    total = 0
    for mf in manifests:
        meta = json.loads(mf.read_text())
        assert counts[meta["partition"]] == meta["num_rows"]
        total += meta["num_rows"]
    assert total == job["rows"] > 0


def test_resume_skips_finished(ray_session, out_dir):
    job1 = sink.write_partitioned(build_ds(), out_dir, "parent_r1", "sig-a")
    # Second run with same signature: everything already done.
    job2 = sink.write_partitioned(build_ds(), out_dir, "parent_r1", "sig-a")
    assert job2["skipped"] == job1["partitions"]
    assert job2["partitions"] == 0 and job2["rows"] == 0


def test_crashed_partition_redone(ray_session, out_dir):
    job1 = sink.write_partitioned(build_ds(), out_dir, "parent_r1", "sig-a")
    # Simulate a crash: delete one manifest (data present, not committed).
    mdir = Path(out_dir) / "_manifests"
    victim = sorted(p for p in mdir.glob("*.json")
                    if p.name != "_job.json")[0]
    key = json.loads(victim.read_text())["partition"]
    victim.unlink()
    plan = sink.resume_plan([key, "definitely-done-no"], out_dir, "sig-a")
    assert key in plan
    # Simulate a partially-written redo: an extra orphaned data file in the
    # uncommitted partition dir must be cleaned up, not appended next to.
    pdir = Path(out_dir) / f"parent_r1={key}"
    orphan_src = next(pdir.rglob("*.parquet"))
    shutil.copy(orphan_src, orphan_src.with_name("orphan-extra.parquet"))
    job2 = sink.write_partitioned(build_ds(), out_dir, "parent_r1", "sig-a")
    assert job2["skipped"] == job1["partitions"] - 1
    assert str(job2["partitions"]) and key in sink.finished_partitions(
        out_dir, "sig-a")
    # Redone partition carries no duplicate rows (manifests and footers both).
    counts = sink.partition_row_counts(out_dir, "parent_r1")
    assert sum(counts.values()) == job1["rows"]
    meta = json.loads((Path(out_dir) / "_manifests" / f"{key}.json")
                      .read_text())
    assert meta["num_rows"] == counts[key]


def test_new_signature_invalidates(ray_session, out_dir):
    sink.write_partitioned(build_ds(), out_dir, "parent_r1", "sig-a")
    assert not sink.finished_partitions(out_dir, "sig-b")
