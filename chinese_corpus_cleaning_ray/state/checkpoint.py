"""Per-partition checkpointing with lineage + counters.

The reference README promises JSON checkpoints but the code has none
(ref:README.md:75-81 vs ref:process_documents.py — SURVEY §0); the only real
resume in the repo is HTTP byte-Range resume (ref:Crawl_Page/download_warcfile.py:20-33).
This module supplies the real thing, as required by the north rule:

- deterministic partition ids: ``crc32(conv_id) % num_partitions`` — every row
  of a conversation lands in one partition, so per-conversation semantics
  survive resume and re-partitioning;
- Hive-partitioned output ``data/part_id=N/*.parquet`` via
  ``write_parquet(partition_cols=["part_id"])``;
- one manifest ``_manifest/part-N.json`` per completed partition holding row
  counters (total/kept/errors/scrubbed), the config hash and the input
  fingerprint — written only AFTER the partition's data files exist, by
  reading the counters back from the written output (column-pruned read, so
  the pipeline is never executed twice);
- resume: partitions with a manifest are filtered out of the input with a
  vectorized mask before the plan runs; data directories of incomplete
  partitions (files but no manifest — a crash mid-write) are deleted first so
  reruns cannot duplicate rows.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib

import pyarrow as pa

from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG, PipelineConfig
from chinese_corpus_cleaning_ray.pipelines.quality import build_quality_pipeline

PART_COL = "part_id"


def conv_partition_ids(conv_ids: list[str], num_partitions: int) -> list[int]:
    return [zlib.crc32(c.encode("utf-8")) % num_partitions for c in conv_ids]


def make_add_partition_fn(num_partitions: int):
    def add_part(batch: pa.Table) -> pa.Table:
        pids = conv_partition_ids(batch.column("conv_id").to_pylist(), num_partitions)
        return batch.append_column(PART_COL, pa.array(pids, pa.int32()))

    return add_part


class Manifest:
    """Directory of per-partition done-markers."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self.manifest_dir = os.path.join(output_dir, "_manifest")
        self.data_dir = os.path.join(output_dir, "data")

    def done_partitions(self) -> set[int]:
        if not os.path.isdir(self.manifest_dir):
            return set()
        out = set()
        for f in os.listdir(self.manifest_dir):
            if f.startswith("part-") and f.endswith(".json"):
                out.add(int(f[len("part-") : -len(".json")]))
        return out

    def partition_data_dir(self, pid: int) -> str:
        return os.path.join(self.data_dir, f"{PART_COL}={pid}")

    def clean_incomplete(self) -> list[int]:
        """Delete data dirs of partitions without a manifest (crash residue)."""
        done = self.done_partitions()
        removed = []
        if os.path.isdir(self.data_dir):
            for d in os.listdir(self.data_dir):
                if d.startswith(f"{PART_COL}="):
                    pid = int(d.split("=", 1)[1])
                    if pid not in done:
                        shutil.rmtree(os.path.join(self.data_dir, d))
                        removed.append(pid)
        return removed

    def mark_done(self, pid: int, counters: dict, config_hash: str, input_fingerprint: str) -> None:
        os.makedirs(self.manifest_dir, exist_ok=True)
        record = {
            "part_id": pid,
            "counters": counters,
            "config_hash": config_hash,
            "input_fingerprint": input_fingerprint,
            "completed_at": time.time(),
        }
        tmp = os.path.join(self.manifest_dir, f".part-{pid}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, os.path.join(self.manifest_dir, f"part-{pid}.json"))

    def read_manifest(self, pid: int) -> dict:
        with open(os.path.join(self.manifest_dir, f"part-{pid}.json")) as f:
            return json.load(f)


def input_fingerprint(input_path: str) -> str:
    """Cheap lineage stamp: sorted (name, size) of the input files."""
    import hashlib

    entries = []
    if os.path.isdir(input_path):
        for f in sorted(os.listdir(input_path)):
            p = os.path.join(input_path, f)
            if os.path.isfile(p):
                entries.append(f"{f}:{os.path.getsize(p)}")
    elif os.path.isfile(input_path):
        entries.append(f"{os.path.basename(input_path)}:{os.path.getsize(input_path)}")
    return hashlib.sha256("|".join(entries).encode()).hexdigest()[:16]


def run_quality_job(
    input_path: str,
    output_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    words=None,
    sort_output: bool = False,
) -> dict:
    """Full checkpointed job: read → partition → (resume-filter) → quality
    pipeline → Hive-partitioned write → per-partition manifests with counters.

    Returns the merged run counters. Idempotent: a completed run re-invoked is
    a no-op; a killed run resumes from the last committed partition.
    """
    import pyarrow.compute as pc

    from chinese_corpus_cleaning_ray.sources.transcripts import read_transcripts

    manifest = Manifest(output_dir)
    os.makedirs(output_dir, exist_ok=True)
    fingerprint = input_fingerprint(input_path)
    done = manifest.done_partitions() if resume else set()
    # Stale-manifest guard: a partition committed under a different config or
    # input is NOT done — drop its manifest and data so it recomputes.
    stale = set()
    for pid in sorted(done):
        rec = manifest.read_manifest(pid)
        if rec.get("config_hash") != cfg.config_hash() or rec.get("input_fingerprint") != fingerprint:
            stale.add(pid)
    for pid in stale:
        os.remove(os.path.join(manifest.manifest_dir, f"part-{pid}.json"))
        if os.path.isdir(manifest.partition_data_dir(pid)):
            shutil.rmtree(manifest.partition_data_dir(pid))
    done -= stale
    if not resume and os.path.isdir(manifest.manifest_dir):
        shutil.rmtree(manifest.manifest_dir)
        done = set()
    if not resume and os.path.isdir(manifest.data_dir):
        shutil.rmtree(manifest.data_dir)
    removed = manifest.clean_incomplete()

    ds = read_transcripts(input_path)
    ds = ds.map_batches(make_add_partition_fn(cfg.num_partitions), batch_format="pyarrow")
    if done:
        done_arr = pa.array(sorted(done), pa.int32())

        def drop_done(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch.column(PART_COL), value_set=done_arr))
            return batch.filter(mask)

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    ds = build_quality_pipeline(ds, cfg, words=words)
    if not cfg.keep_original_text:
        # halve the output-shuffle payload: the scrubbed corpus (EP2's real
        # output — ref:main.py:401-403) keeps scrubbed_text; the original text
        # remains addressable in the input via (conv_id, turn_idx).
        ds = ds.map_batches(lambda b: b.drop_columns(["text"]), batch_format="pyarrow")
    if sort_output:
        ds = ds.sort(["conv_id", "turn_idx"])

    # Single-pass partitioned write: groupby(part_id) co-locates each
    # checkpoint partition in one task, which writes exactly one file
    # (Hive layout, tmp-then-rename for atomicity) sorted by (conv_id,
    # turn_idx), computes the partition's counters in the same pass, and
    # returns ONLY the one-row counter record. No read-back, no second
    # execution, no blocks×partitions file explosion.
    # Scale note: one partition must fit a worker's heap — size
    # cfg.num_partitions so input_size/num_partitions ≲ 1 GiB.
    data_dir = manifest.data_dir

    def write_partition(group: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        pid = group.column(PART_COL)[0].as_py()
        idx = pc.sort_indices(
            group, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        group = group.take(idx)
        pdir = os.path.join(data_dir, f"{PART_COL}={pid}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".part.parquet.tmp")
        _pq.write_table(group.drop_columns([PART_COL]), tmp)
        os.replace(tmp, os.path.join(pdir, "part.parquet"))
        kept = _pc.sum(_pc.cast(group.column("keep"), pa.int64())).as_py() or 0
        errors = _pc.sum(_pc.cast(group.column("rule_error"), pa.int64())).as_py() or 0
        scrubbed = (
            _pc.sum(_pc.cast(_pc.greater(group.column("sensitive_count"), 0), pa.int64())).as_py()
            or 0
        )
        return pa.table(
            {
                PART_COL: pa.array([pid], pa.int32()),
                "total": pa.array([group.num_rows], pa.int64()),
                "kept": pa.array([kept], pa.int64()),
                "errors": pa.array([errors], pa.int64()),
                "scrubbed": pa.array([scrubbed], pa.int64()),
            }
        )

    counter_df = (
        ds.groupby(PART_COL).map_groups(write_partition, batch_format="pyarrow").to_pandas()
    )
    counters_by_pid: dict[int, dict] = {}
    for row in counter_df.itertuples(index=False):
        pid = int(getattr(row, PART_COL))
        counters = {k: int(getattr(row, k)) for k in ("total", "kept", "errors", "scrubbed")}
        counters_by_pid[pid] = counters
        manifest.mark_done(pid, counters, cfg.config_hash(), fingerprint)

    totals = {"total": 0, "kept": 0, "errors": 0, "scrubbed": 0}
    for pid in manifest.done_partitions():
        c = manifest.read_manifest(pid)["counters"]
        for k in totals:
            totals[k] += int(c.get(k, 0))
    totals["partitions_done"] = len(manifest.done_partitions())
    totals["partitions_this_run"] = len(counters_by_pid)
    totals["partitions_cleaned"] = len(removed)
    return totals
