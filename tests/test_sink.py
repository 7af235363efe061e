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


def test_checkpoint_dataset_roundtrip_and_resume(ray_session, out_dir):
    """checkpoint_dataset: read-back equals input (rows + values), the
    internal partition column is dropped, and a re-run with the same
    signature skips every finished partition (durable resume)."""
    import ray.data as rd

    src = rd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text", "n_chars"])
    back = sink.checkpoint_dataset(src, out_dir, "ck-sig",
                                   key_col="doc_id", num_parts=8)
    df = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert sorted(df.columns) == sorted(exp.columns)
    assert df.doc_id.tolist() == exp.doc_id.tolist()
    assert (df.n_chars.to_numpy() == exp.n_chars.to_numpy()).all()
    job = json.loads((Path(out_dir) / "_manifests" / "_job.json")
                     .read_text())
    assert job["partitions"] == 8 and job["skipped"] == 0
    # Resume: same signature -> all 8 partitions skipped, same read-back.
    back2 = sink.checkpoint_dataset(src, out_dir, "ck-sig",
                                    key_col="doc_id", num_parts=8)
    job2 = json.loads((Path(out_dir) / "_manifests" / "_job.json")
                      .read_text())
    assert job2["skipped"] == 8 and job2["partitions"] == 0
    assert back2.count() == len(exp)


def test_code_change_invalidates_curation_checkpoint(ray_session, tmp_path,
                                                     monkeypatch):
    """The checkpoint signature embeds a hash of the upstream stage code:
    changing any stage's source must change the signature, and a persisted
    checkpoint from the old code must be fully recomputed, never reused."""
    from h3ray.pipelines import curation

    ckpt = tmp_path / "ckpt"
    curation.curation_pipeline(SF, checkpoint_dir=str(ckpt))
    job1 = json.loads((ckpt / "_manifests" / "_job.json").read_text())
    assert job1["skipped"] == 0 and job1["partitions"] > 0
    sig_before = curation._input_signature(SF)
    assert f"code={curation._code_signature()}" in sig_before

    # Simulate a behavior change in an upstream stage.
    monkeypatch.setattr(curation, "_CODE_SIG", "deadbeef0000")
    sig_after = curation._input_signature(SF)
    assert sig_after != sig_before
    assert not sink.finished_partitions(str(ckpt), sig_after)

    curation.curation_pipeline(SF, checkpoint_dir=str(ckpt))
    job2 = json.loads((ckpt / "_manifests" / "_job.json").read_text())
    assert job2["skipped"] == 0 and job2["partitions"] == job1["partitions"]


def test_curation_checkpoint_matches_in_memory(ray_session, tmp_path):
    """The durable-checkpoint curation run must produce exactly the
    in-memory run's (doc_id, pack_id) assignment."""
    from h3ray.pipelines.curation import curation_pipeline

    mem = curation_pipeline(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    timings: dict = {}
    dur = curation_pipeline(SF, checkpoint_dir=str(tmp_path / "ckpt"),
                            timings=timings).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert mem.doc_id.tolist() == dur.doc_id.tolist()
    assert mem.pack_id.tolist() == dur.pack_id.tolist()
    assert set(timings) == {"filter_decontam_checkpoint", "near_dedup",
                            "pack"}
    assert (Path(tmp_path) / "ckpt" / "_manifests" / "_job.json").exists()
