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


def asof_join(left, right, on: str, by: str, how: str = "left",
              right_suffix: str = "_r", shards: int | None = None,
              tolerance=None, direction: str = "backward"):
    """Distributed AS-OF join: for each left row, attach the columns of the
    single right row with the same ``by`` key and the greatest ``on`` value
    ≤ the left row's ``on`` (``direction="backward"``, the default — the
    "most recent fact at or before this event" lookup SQL spells
    ``ASOF JOIN``). ``"forward"`` matches the smallest ``on`` ≥ the left's
    (next-scheduled-fact lookup); ``"nearest"`` the closest in either
    direction (ties resolve backward, pandas semantics).

    Ray Data has no asof join; the reference has no joins at all. The plan
    is the same one-shuffle shape as :func:`hash_join`: both sides are
    tagged with a hash shard of the ``by`` key (every row of a key lands in
    exactly one shard), null-padded to a shared union schema, ``union``-ed
    (lazy block concat), and ONE ``groupby(shard).map_groups`` runs a
    vectorized ``pandas.merge_asof`` per shard. Per-shard memory =
    (left + right)/shards; a hot key inflates one shard, never one Python
    group — the documented partitioning assumption.

    ``how="left"`` keeps left rows with no match (right columns null);
    ``"inner"`` drops them. ``tolerance`` (same dtype as ``on``'s diff,
    e.g. an int for integer timestamps) bounds the lookback window.

    Determinism: if the right side has several rows with the SAME
    ``(by, on)``, which one wins is unspecified — pre-aggregate the right
    side to one row per (key, time) first (the driver query does exactly
    that). Output column types are cast back to the declared Arrow union
    schema, so timestamp units and nullable ints survive the pandas
    round-trip.

    Planning note: ``.schema()`` is read from BOTH inputs, and ``schema()``
    on a Dataset derived through a wide op (groupby/sort) executes that
    plan for its limit-1 probe — ``materialize()`` such an input first or
    its upstream runs twice (once for the probe, once in the union)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}")
    from chinese_corpus_cleaning_ray.stages.pools import cluster_cpus

    if shards is None:
        shards = max(8, cluster_cpus())

    def _shard_of(keys: pd.Series) -> np.ndarray:
        h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
        return (h % np.uint64(shards)).astype(np.int32)

    def tag_left(batch: pa.Table) -> pa.Table:
        s = _shard_of(batch.column(by).to_pandas())
        return batch.append_column("__shard", pa.array(s)).append_column(
            "__side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))

    tagged_left = left.map_batches(tag_left, batch_format="pyarrow")
    lsch = tagged_left.schema().base_schema
    left_cols = [f.name for f in lsch if f.name not in ("__shard", "__side")]

    rs = right.schema()
    right_in = [n for n in rs.names if n not in (on, by)]
    rename = {n: (n + right_suffix if n in left_cols else n) for n in right_in}
    # the right side's own on-column comes through under a reserved name so
    # the asof key never collides with the left's
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
        key = batch.column(by).cast(sch.field(by).type)
        onv = batch.column(on).cast(sch.field(on).type)
        present = {rename[c]: batch.column(c).cast(sch.field(rename[c]).type)
                   for c in right_in}
        cols = []
        for f in sch:
            if f.name == by:
                cols.append(key)
            elif f.name == on:
                cols.append(onv)
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
    out_sch = pa.schema([f for f in sch if f.name not in ("__shard", "__side")])

    def merge(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group.column("__side")
        lf = group.filter(pc.equal(side, 0)).select(left_cols).to_pandas()
        rf = group.filter(pc.equal(side, 1)).select(
            [by, on] + out_right).to_pandas()
        # merge_asof contract: both frames globally sorted by `on`, no nulls
        # in `on`. Null-on left rows bypass the match (null right cols);
        # null-on right rows can never be "most recent" — drop them.
        rf = rf[rf[on].notna()]
        rf = rf.assign(__rmatch=np.int8(1)).sort_values(
            on, kind="mergesort").reset_index(drop=True)
        l_ok = lf[lf[on].notna()].sort_values(
            on, kind="mergesort").reset_index(drop=True)
        # merge_asof demands IDENTICAL key dtypes on both sides, but the
        # Arrow→pandas hop widens a nullable int64 `on`/`by` to float64 only
        # on the side that holds nulls (MergeError otherwise) — promote both
        # frames to the numpy common dtype before merging; the final cast
        # back to `out_sch` restores the declared Arrow types.
        for kcol in (on, by):
            lt, rt = l_ok[kcol].dtype, rf[kcol].dtype
            if lt != rt:
                try:
                    common = np.result_type(lt, rt)
                except TypeError:
                    common = np.dtype(object)
                l_ok[kcol] = l_ok[kcol].astype(common)
                rf[kcol] = rf[kcol].astype(common)
        merged = pd.merge_asof(l_ok, rf, on=on, by=by, suffixes=("", "__rr"),
                               direction=direction, tolerance=tolerance)
        if on + "__rr" in merged.columns:  # pandas keeps one `on`; guard
            merged = merged.drop(columns=[on + "__rr"])
        if how == "inner":
            merged = merged[merged["__rmatch"].notna()]
        else:
            l_null = lf[lf[on].isna()]
            if len(l_null):
                merged = pd.concat([merged, l_null], ignore_index=True)
        cols = [pa.array(
            merged[f.name] if f.name in merged.columns
            else pd.Series([None] * len(merged)), type=f.type,
            from_pandas=True) for f in out_sch]
        return pa.Table.from_arrays(cols, schema=out_sch)

    return both.groupby("__shard").map_groups(merge, batch_format="pyarrow")


def range_join(points, intervals, point_col: str, start_col: str,
               end_col: str, by: str | None = None, *, bucket_width,
               how: str = "inner", right_suffix: str = "_r",
               shards: int | None = None):
    """Distributed RANGE (interval) join: emit one row per (point, interval)
    pair with ``start_col ≤ point_col ≤ end_col`` (and equal ``by`` keys
    when given) — the "which session/window does this event fall in"
    lookup SQL spells as an inequality join.

    A naive inequality join is O(points × intervals). This plan
    co-partitions both sides on a COARSE TIME BUCKET instead: each point
    lands in bucket ``floor(point/bucket_width)``; each interval is
    replicated to every bucket its [start, end] span overlaps. A matching
    pair then necessarily co-locates in the point's bucket (exactly one
    bucket per point → no duplicate output), buckets are hash-sharded, and
    one vectorized pandas merge + mask runs per shard.

    ``bucket_width`` is the replication/skew knob and must be in the same
    units as the three range columns (numeric — epoch seconds, ints,
    floats): an interval replicates to ``span/bucket_width + 1`` buckets,
    while a bucket's candidate set is every interval overlapping it. Pick
    it near the TYPICAL interval length (sessions → ~an hour) so both
    stay O(1)-ish. ``how="left"`` keeps unmatched points with null
    interval columns. Intervals with null bounds never match; null points
    match nothing (and survive only under ``how="left"``).

    Planning note: ``.schema()`` is read from BOTH inputs — if a side is
    derived through a wide op (e.g. sessionize's sort), ``materialize()``
    it first or its plan executes twice (schema probe + union)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucket_width must be a positive number")
    from chinese_corpus_cleaning_ray.stages.pools import cluster_cpus

    if shards is None:
        shards = max(8, cluster_cpus())

    psch = points.schema()
    point_cols = list(psch.names)
    isch = intervals.schema()
    right_in = [n for n in isch.names if n != by]
    rename = {n: (n + right_suffix if n in point_cols else n) for n in right_in}
    r_types = dict(zip(isch.names, isch.types))

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    p_types = dict(zip(psch.names, psch.types))
    out_sch = pa.schema(
        [pa.field(n, _pa_type(p_types[n])) for n in point_cols]
        + [pa.field(rename[n], _pa_type(r_types[n])) for n in right_in])

    def _shard_of(bucket: np.ndarray, keys) -> np.ndarray:
        h = bucket.astype(np.uint64)
        if keys is not None:
            h = h * np.uint64(0x9E3779B97F4A7C15) ^ pd.util.hash_pandas_object(
                pd.Series(keys), index=False).to_numpy()
        return (h % np.uint64(shards)).astype(np.int32)

    def bucket_points(df: pd.DataFrame) -> pd.DataFrame:
        p = df[point_col].to_numpy()
        ok = pd.notna(p)
        df = df[ok]
        b = np.floor_divide(df[point_col].to_numpy(), bucket_width).astype(np.int64)
        return df.assign(
            __bucket=b,
            __shard=_shard_of(b, df[by].to_numpy() if by else None))

    def explode_intervals(df: pd.DataFrame) -> pd.DataFrame:
        s = df[start_col].to_numpy()
        e = df[end_col].to_numpy()
        ok = pd.notna(s) & pd.notna(e) & (s <= e)
        df = df[ok]
        if not len(df):
            return df.assign(__bucket=pd.Series([], dtype=np.int64),
                             __shard=pd.Series([], dtype=np.int32)
                             ).rename(columns=rename)
        b0 = np.floor_divide(df[start_col].to_numpy(), bucket_width).astype(np.int64)
        b1 = np.floor_divide(df[end_col].to_numpy(), bucket_width).astype(np.int64)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(df)), reps)
        out = df.iloc[idx].reset_index(drop=True)
        # per-interval consecutive bucket ids, fully vectorized
        starts = np.cumsum(reps) - reps
        offs = np.arange(reps.sum(), dtype=np.int64) - np.repeat(starts, reps)
        b = np.repeat(b0, reps) + offs
        out = out.assign(
            __bucket=b,
            __shard=_shard_of(b, out[by].to_numpy() if by else None))
        return out.rename(columns=rename)

    pts = points.map_batches(bucket_points, batch_format="pandas")
    ivs = intervals.map_batches(explode_intervals, batch_format="pandas")

    # side-tag + union + one groupby (the hash_join discipline): per-shard
    # memory = candidates/shards, nothing driver-side
    usch = pa.schema(
        list(out_sch) + [pa.field("__bucket", pa.int64()),
                         pa.field("__shard", pa.int32()),
                         pa.field("__side", pa.int8())])

    def pad(side_val: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = []
            for fd in usch:
                if fd.name == "__side":
                    cols.append(pa.array(np.full(n, side_val, dtype=np.int8)))
                elif fd.name in batch.column_names:
                    cols.append(batch.column(fd.name).cast(fd.type))
                else:
                    cols.append(pa.nulls(n, fd.type))
            return pa.Table.from_arrays(cols, schema=usch)

        return f

    both = pts.map_batches(pad(0), batch_format="pyarrow").union(
        ivs.map_batches(pad(1), batch_format="pyarrow"))

    start_out, end_out = rename[start_col], rename[end_col]
    iv_cols = [rename[n] for n in right_in]

    def merge(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group.column("__side")
        lf = group.filter(pc.equal(side, 0)).select(
            point_cols + ["__bucket"]).to_pandas()
        rf = group.filter(pc.equal(side, 1)).select(
            ([by] if by else []) + iv_cols + ["__bucket"]).to_pandas()
        onk = ["__bucket"] + ([by] if by else [])
        lf = lf.assign(__pid=np.arange(len(lf)))
        m = lf.merge(rf, on=onk, how="inner", suffixes=("", "__rr"))
        keep = ((m[start_out].to_numpy() <= m[point_col].to_numpy())
                & (m[point_col].to_numpy() <= m[end_out].to_numpy()))
        m = m[keep]
        if how == "left":
            miss = lf[~lf["__pid"].isin(m["__pid"])]
            m = pd.concat([m, miss], ignore_index=True)
        cols = [pa.array(
            m[f.name] if f.name in m.columns
            else pd.Series([None] * len(m)), type=f.type,
            from_pandas=True) for f in out_sch]
        return pa.Table.from_arrays(cols, schema=out_sch)

    joined = both.groupby("__shard").map_groups(merge, batch_format="pyarrow")
    if how != "left":
        return joined

    # null points have no bucket, so they bypass the exchange entirely and
    # rejoin the output here with null interval columns (left semantics)
    import pyarrow.compute as pc

    def null_points(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_null(batch.column(point_col)))
        cols = [b.column(f.name).cast(f.type) if f.name in b.column_names
                else pa.nulls(b.num_rows, f.type) for f in out_sch]
        return pa.Table.from_arrays(cols, schema=out_sch)

    return joined.union(points.map_batches(null_points,
                                           batch_format="pyarrow"))
