"""Checkpointed job: full run, resume no-op, crash-resume equivalence,
incomplete-partition cleanup, counter integrity."""

import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def input_dir(tmp_path_factory):
    from chinese_corpus_cleaning_ray.sources.transcripts import write_transcripts

    d = tmp_path_factory.mktemp("ckpt_input")
    return write_transcripts(str(d / "t"), 5_000, seed=31, rows_per_file=1_000)


@pytest.fixture()
def cfg():
    from dataclasses import replace

    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG

    return replace(DEFAULT_CONFIG, num_partitions=8)


def _read_all_sorted(data_dir):
    import pyarrow.dataset as pads

    t = pads.dataset(data_dir, partitioning="hive").to_table()
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_full_run_and_noop_resume(ray_session, input_dir, cfg, tmp_path):
    from chinese_corpus_cleaning_ray.state.checkpoint import Manifest, run_quality_job

    out = str(tmp_path / "out")
    stats = run_quality_job(input_dir, out, cfg)
    assert stats["total"] == 5_000
    assert stats["partitions_this_run"] == stats["partitions_done"] > 0
    assert 0 < stats["kept"] < 5_000
    m = Manifest(out)
    rec = m.read_manifest(sorted(m.done_partitions())[0])
    assert rec["config_hash"] and rec["input_fingerprint"]
    assert rec["counters"]["total"] > 0

    first = _read_all_sorted(m.data_dir)
    # resume over a complete output: nothing reruns, bytes unchanged
    stats2 = run_quality_job(input_dir, out, cfg)
    assert stats2["partitions_this_run"] == 0
    assert stats2["total"] == 5_000
    second = _read_all_sorted(m.data_dir)
    assert first.equals(second)


def test_crash_resume_equivalence(ray_session, input_dir, cfg, tmp_path):
    """Simulate a crash after k committed partitions: delete the other
    manifests + leave one partition's data without a manifest (mid-write
    crash). Resume must rebuild exactly the full output, nothing duplicated."""
    import shutil

    from chinese_corpus_cleaning_ray.state.checkpoint import Manifest, run_quality_job

    ref_out = str(tmp_path / "ref")
    run_quality_job(input_dir, ref_out, cfg)
    ref = _read_all_sorted(Manifest(ref_out).data_dir)

    crash_out = str(tmp_path / "crash")
    run_quality_job(input_dir, crash_out, cfg)
    m = Manifest(crash_out)
    done = sorted(m.done_partitions())
    assert len(done) >= 3
    keep_done = set(done[:2])
    orphan = done[2]  # data present, manifest removed → simulated mid-write crash
    for pid in done:
        if pid not in keep_done:
            os.remove(os.path.join(m.manifest_dir, f"part-{pid}.json"))
    for pid in done[3:]:
        shutil.rmtree(m.partition_data_dir(pid))

    stats = run_quality_job(input_dir, crash_out, cfg)
    assert stats["partitions_cleaned"] >= 1  # the orphan dir was removed first
    assert stats["total"] == 5_000
    resumed = _read_all_sorted(m.data_dir)
    assert ref.equals(resumed), "resumed output differs from single-shot output"
    # no duplicated rows
    assert resumed.num_rows == 5_000
    del orphan


def test_partition_assignment_is_by_conversation(ray_session, input_dir, cfg, tmp_path):
    from chinese_corpus_cleaning_ray.state.checkpoint import Manifest, run_quality_job

    out = str(tmp_path / "out2")
    run_quality_job(input_dir, out, cfg)
    m = Manifest(out)
    seen: dict[str, int] = {}
    for pid in m.done_partitions():
        pdir = m.partition_data_dir(pid)
        for f in os.listdir(pdir):
            t = pq.read_table(os.path.join(pdir, f), columns=["conv_id"])
            for c in set(t.column("conv_id").to_pylist()):
                assert seen.setdefault(c, pid) == pid, f"conv {c} split across partitions"
