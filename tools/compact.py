"""Compact checkpoint output pieces.

Sub-file block splitting writes several pieces per (input shard, partition)
— good for parallelism, noisy on the filesystem. This tool merges every
(partition dir, input-stem) group into ONE piece, preserving the
stem→piece mapping that resume/invalidations depend on: a later config change
can still delete exactly one shard's rows. Row order inside the merged piece
is (conv_id, turn_idx); tmp-then-rename per merged piece.

Usage: PYTHONPATH=. python tools/compact.py <output_dir>
"""

from __future__ import annotations

import os
import sys
import uuid
from collections import defaultdict


def compact(output_dir: str) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    data_dir = os.path.join(output_dir, "data")
    merged = kept = 0
    for d in sorted(os.listdir(data_dir)):
        pdir = os.path.join(data_dir, d)
        if not (d.startswith("part_id=") and os.path.isdir(pdir)):
            continue
        by_stem: dict[str, list[str]] = defaultdict(list)
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                by_stem[f.rsplit("-", 1)[0]].append(f)
        for stem, files in by_stem.items():
            if len(files) <= 1:
                kept += 1
                continue
            tables = [pq.read_table(os.path.join(pdir, f)) for f in sorted(files)]
            t = pa.concat_tables(tables).sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
            tmp = os.path.join(pdir, f".{stem}-compact.tmp")
            pq.write_table(t, tmp)
            final = os.path.join(pdir, f"{stem}-{uuid.uuid4().hex[:8]}.parquet")
            os.replace(tmp, final)
            for f in files:
                os.remove(os.path.join(pdir, f))
            merged += len(files)
            kept += 1
    return {"pieces_merged": merged, "pieces_after": kept}


if __name__ == "__main__":
    print(compact(sys.argv[1]))
