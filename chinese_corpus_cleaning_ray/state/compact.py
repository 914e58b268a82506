"""Compact checkpoint output pieces (crash-safe).

Sub-file block splitting writes several pieces per (input shard, partition)
— good for parallelism, noisy on the filesystem. This tool merges every
(partition dir, input-stem) group into ONE piece, preserving the
stem→piece mapping that resume/invalidations depend on: a later config change
can still delete exactly one shard's rows. Row order inside the merged piece
is (conv_id, turn_idx).

Crash safety (the no-duplicate guarantee must survive a crash mid-compact):
each merge writes a journal ``.compact-journal-<stem>.json`` listing the
source pieces and the merged piece name BEFORE the merged piece is committed
(tmp-then-rename is the commit point). On the next run the journal is
recovered first: merged piece present → roll FORWARD (delete surviving
sources); merged piece absent → roll BACK (delete tmp, keep sources). Either
way the journal is removed, so rerunning compact can never merge duplicate
rows in. When a manifest exists for the stem, the merged row count is also
reconciled against the manifest's per-partition total and the group is left
untouched on mismatch.

CLI: python -m chinese_corpus_cleaning_ray compact --output <dir>
"""

from __future__ import annotations

import json
import os
import sys
import uuid
from collections import defaultdict


def _recover_journals(pdir: str) -> int:
    """Roll journaled merges forward/back; returns #journals recovered."""
    n = 0
    for f in list(os.listdir(pdir)):
        if not (f.startswith(".compact-journal-") and f.endswith(".json")):
            continue
        jpath = os.path.join(pdir, f)
        try:
            with open(jpath) as fh:
                j = json.load(fh)
        except (json.JSONDecodeError, OSError):
            os.remove(jpath)
            continue
        merged = os.path.join(pdir, j["merged"])
        if os.path.exists(merged):
            # commit point passed: finish deleting the sources
            for s in j["sources"]:
                sp = os.path.join(pdir, s)
                if os.path.exists(sp):
                    os.remove(sp)
        else:
            # not committed: drop any tmp residue, keep the sources
            tmp = os.path.join(pdir, j.get("tmp", ""))
            if j.get("tmp") and os.path.exists(tmp):
                os.remove(tmp)
        os.remove(jpath)
        n += 1
    return n


def _expected_rows(output_dir: str, stem: str, pid: int) -> int | None:
    mpath = os.path.join(output_dir, "_manifest", f"file-{stem}.json")
    if not os.path.exists(mpath):
        return None
    try:
        with open(mpath) as fh:
            rec = json.load(fh)
    except (json.JSONDecodeError, OSError):
        return None
    per_part = rec.get("per_partition", {})
    for key in (str(pid), pid):  # json stores string keys; tolerate int-keyed
        if key in per_part:
            try:
                return int(per_part[key])
            except (TypeError, ValueError):
                return None
    return None


def compact(output_dir: str) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    data_dir = os.path.join(output_dir, "data")
    merged = kept = recovered = mismatched = 0
    for d in sorted(os.listdir(data_dir)):
        pdir = os.path.join(data_dir, d)
        if not (d.startswith("part_id=") and os.path.isdir(pdir)):
            continue
        pid = int(d.split("=", 1)[1])
        recovered += _recover_journals(pdir)
        by_stem: dict[str, list[str]] = defaultdict(list)
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                by_stem[f.rsplit("-", 1)[0]].append(f)
        for stem, files in sorted(by_stem.items()):
            if len(files) <= 1:
                kept += 1
                continue
            tables = [pq.read_table(os.path.join(pdir, f)) for f in sorted(files)]
            t = pa.concat_tables(tables).sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
            expected = _expected_rows(output_dir, stem, pid)
            if expected is not None and t.num_rows != expected:
                # residue or loss — refuse to merge this group; resume's
                # clean_pieces_except / re-processing owns the repair
                mismatched += 1
                kept += 1
                continue
            suffix = uuid.uuid4().hex[:8]
            tmp_name = f".{stem}-compact-{suffix}.tmp"
            final_name = f"{stem}-{suffix}.parquet"
            journal = os.path.join(pdir, f".compact-journal-{stem}.json")
            jtmp = journal + ".tmp"
            with open(jtmp, "w") as fh:
                json.dump({"sources": sorted(files), "merged": final_name,
                           "tmp": tmp_name, "rows": t.num_rows}, fh)
            os.replace(jtmp, journal)
            pq.write_table(t, os.path.join(pdir, tmp_name))
            os.replace(os.path.join(pdir, tmp_name), os.path.join(pdir, final_name))
            for f in files:
                os.remove(os.path.join(pdir, f))
            os.remove(journal)
            merged += len(files)
            kept += 1
    return {"pieces_merged": merged, "pieces_after": kept,
            "journals_recovered": recovered, "row_mismatches": mismatched}


if __name__ == "__main__":
    print(compact(sys.argv[1]))
