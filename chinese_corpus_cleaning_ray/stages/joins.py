"""Robust distributed hash join — Dataset.join without Dataset.join.

Ray 2.49's built-in hash-shuffle join builds a ZERO-COLUMN table for any
partition whose right side received no rows and then fails pyarrow key
resolution ("No match ... for key field reference") — any sparse or skewed
side trips it (measured in this repo; see stages/dedup_stage.py:anti_filter,
which is the anti-join specialization of this operator). This module
implements the general inner/left join with the machinery that IS reliable:

1. tag both sides with the SAME hash shard of the key and a side flag,
   null-padding each side to the shared union schema;
2. ``union`` them (a lazy block concat — no shuffle of its own);
3. ONE ``groupby(shard).map_groups``: split the group by side, one vectorized
   pandas merge per shard.

Cost: one sort shuffle of both inputs — the same data movement a hash join
pays. Per-shard memory = (left + right)/shards; a hot key inflates one
shard, never one Python group. ``shards`` is the memory knob (power of two
not required — the shard is a modulo of a 64-bit hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_join(left, right, on: str, how: str = "inner",
              right_suffix: str = "_r", shards: int | None = None):
    """Join two Datasets on a single key column. ``how``: "inner" or "left".
    Overlapping non-key column names on the right get ``right_suffix``.
    Column types are preserved EXACTLY: the per-shard merge is a pyarrow
    ``Table.join`` (timestamps keep their unit; an int right column with
    unmatched left rows stays int64-with-nulls, never float64), and every
    shard's output is cast to the same declared union schema so blocks
    cannot diverge. Null join keys never match (SQL semantics)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    from chinese_corpus_cleaning_ray.stages.pools import cluster_cpus

    if shards is None:
        shards = max(8, cluster_cpus())

    def _shard_of(keys: pd.Series) -> np.ndarray:
        h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
        return (h % np.uint64(shards)).astype(np.int32)

    def tag_left(batch: pa.Table) -> pa.Table:
        s = _shard_of(batch.column(on).to_pandas())
        return batch.append_column("__shard", pa.array(s)).append_column(
            "__side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))

    tagged_left = left.map_batches(tag_left, batch_format="pyarrow")
    lsch = tagged_left.schema().base_schema
    left_cols = [f.name for f in lsch if f.name not in ("__shard", "__side")]

    # resolve the right side's output names (suffix collisions) and the
    # union schema: key + left cols + renamed right cols + helpers
    rs = right.schema()
    right_in = [n for n in rs.names if n != on]
    rename = {n: (n + right_suffix if n in left_cols else n) for n in right_in}
    r_types = dict(zip(rs.names, rs.types))

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    fields = list(lsch) + [pa.field(rename[n], _pa_type(r_types[n]))
                           for n in right_in]
    sch = pa.schema(fields)

    def pad_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = [batch.column(f.name) if f.name in batch.column_names
                else pa.nulls(n, f.type) for f in sch]
        return pa.Table.from_arrays(cols, schema=sch)

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = batch.column(on).cast(sch.field(on).type)
        present = {rename[c]: batch.column(c).cast(sch.field(rename[c]).type)
                   for c in right_in}
        cols = []
        for f in sch:
            if f.name == on:
                cols.append(key)
            elif f.name == "__shard":
                cols.append(pa.array(_shard_of(key.to_pandas())))
            elif f.name == "__side":
                cols.append(pa.array(np.ones(n, dtype=np.int8)))
            elif f.name in present:
                cols.append(present[f.name])
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(cols, schema=sch)

    both = tagged_left.map_batches(pad_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    out_right = [rename[n] for n in right_in]
    left_nonkey = [c for c in left_cols if c != on]
    out_sch = pa.schema([f for f in sch if f.name not in ("__shard", "__side")])
    arrow_jt = "inner" if how == "inner" else "left outer"

    def merge(group: pa.Table) -> pa.Table:
        # split the sides in ARROW (converting the padded union frame to
        # pandas as a whole would null-coerce int columns to float64), then
        # join in Arrow too: pa.Table.join preserves every column type
        # bit-exactly, including timestamp units and nullable ints for
        # left-join misses. The final cast to the shared out_sch guarantees
        # every shard emits the SAME schema — per-shard dtype divergence
        # (matched shard int64 vs missed shard float64) broke parquet
        # unification under the old pandas merge.
        import pyarrow.compute as pc

        side = group.column("__side")
        lf = group.filter(pc.equal(side, 0)).select([on] + left_nonkey)
        rf = group.filter(pc.equal(side, 1)).select([on] + out_right)
        try:
            joined = lf.join(rf, keys=[on], join_type=arrow_jt)
            return joined.select(out_sch.names).cast(out_sch)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # fallback for key/column types acero can't join (e.g. nested):
            # pandas merge, then rebuild against out_sch — from_pandas=True
            # maps NaN→null so a null-padded int column casts back to int64
            merged = lf.to_pandas().merge(rf.to_pandas(), on=on, how=how)
            cols = [pa.array(merged[f.name], type=f.type, from_pandas=True)
                    for f in out_sch]
            return pa.Table.from_arrays(cols, schema=out_sch)

    return both.groupby("__shard").map_groups(merge, batch_format="pyarrow")
