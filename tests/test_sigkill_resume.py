"""Hard-crash resume: SIGKILL a checkpointed job mid-run (real subprocess,
real fused writer), resume, and require byte-identical output to a
single-shot run — the no-duplicate/no-loss guarantee under the most violent
failure mode, not a simulated manifest deletion."""

import os
import signal
import subprocess
import sys
import time

import pytest

_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from chinese_corpus_cleaning_ray.state.checkpoint import run_quality_job
from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
from dataclasses import replace
cfg = replace(DEFAULT_CONFIG, num_partitions=4)
print("START", flush=True)
run_quality_job({inp!r}, {out!r}, cfg, checkpoint_every=2)
print("DONE", flush=True)
ray.shutdown()
"""


def _read_all_sorted(data_dir):
    import pyarrow.dataset as pads

    t = pads.dataset(data_dir, partitioning="hive").to_table()
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_sigkill_mid_run_then_resume_byte_equal(ray_session, tmp_path):
    from dataclasses import replace

    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
    from chinese_corpus_cleaning_ray.sources.transcripts import write_transcripts
    from chinese_corpus_cleaning_ray.state.checkpoint import Manifest, run_quality_job

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = write_transcripts(str(tmp_path / "in"), 24_000, seed=13, rows_per_file=2_000)
    cfg = replace(DEFAULT_CONFIG, num_partitions=4)

    ref_out = str(tmp_path / "ref")
    run_quality_job(inp, ref_out, cfg)
    ref = _read_all_sorted(Manifest(ref_out).data_dir)
    assert ref.num_rows == 24_000

    out = str(tmp_path / "crash")
    manifest_dir = os.path.join(out, "_manifest")
    killed_partial = False
    for attempt in range(4):
        proc = subprocess.Popen(
            [sys.executable, "-c", _CHILD.format(repo=repo, inp=inp, out=out)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=repo,
        )
        # wait for the first committed wave, then SIGKILL mid-flight
        t0 = time.time()
        while time.time() - t0 < 180:
            if proc.poll() is not None:
                break  # finished before we saw partial progress
            n = len(os.listdir(manifest_dir)) if os.path.isdir(manifest_dir) else 0
            if 0 < n < 12:
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                killed_partial = True
                break
            time.sleep(0.05)
        else:
            proc.kill()
            proc.wait()
        if killed_partial:
            break
        # completed too fast — wipe and retry with a fresh dir
        import shutil

        shutil.rmtree(out, ignore_errors=True)
    assert killed_partial, "never caught the job mid-run; fixture too fast"

    done_before = len(Manifest(out).done_stems())
    assert done_before < 12, "job completed before the kill"

    stats = run_quality_job(inp, out, cfg)
    assert stats["total"] == 24_000
    resumed = _read_all_sorted(Manifest(out).data_dir)
    assert resumed.num_rows == 24_000
    assert ref.equals(resumed), "SIGKILL-resumed output differs from single-shot"
