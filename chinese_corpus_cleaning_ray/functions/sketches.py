"""Cardinality sketches for the 100 TB path: HyperLogLog approximate
distinct-count as a Ray ``AggregateFn`` (register arrays combine
associatively, so the reduction tree-merges inside Ray Data — the driver
only ever sees ONE ``2^p``-byte register array, never per-block state).

Exact distinct ops (`unique`, `COUNT(DISTINCT)`, the dedup suite) shuffle
one row per distinct value; at corpus scale the distinct-URL / distinct-
user / distinct-ngram cardinalities make that exchange the bottleneck when
only the COUNT is wanted. The sketch answers the count with a fixed-size
state and a single streaming pass — the standard trade (Flajolet et al.,
HyperLogLog, AofA 2007; the plain HLL estimator with linear-counting
small-range correction, no bias table).

Everything is deterministic: the hash is pandas' stable 64-bit
``hash_pandas_object`` (same values every run, every layout), the register
max is order-free, and the estimator is pure float arithmetic — so the
estimate is bit-reproducible across reruns and cluster layouts, which the
tests pin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (0 → 64)."""
    lz = np.zeros(w.shape, dtype=np.uint8)
    x = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        s64 = np.uint64(64 - s)
        m = (x >> s64) == 0
        lz[m] += np.uint8(s)
        x[m] <<= np.uint64(s)
    return lz


def hll_accumulate(regs: np.ndarray, values: pd.Series, p: int) -> np.ndarray:
    """Fold a column of values into a 2^p-register HLL state (in place)."""
    h = pd.util.hash_pandas_object(values, index=False).to_numpy(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    # w's low p bits are zero, so nonzero w has clz <= 63-p; w == 0 means
    # every meaningful bit was zero -> max rank 64-p+1
    rank = np.where(w == 0, np.uint8(64 - p + 1), _clz64(w) + np.uint8(1))
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Plain HLL estimator with the linear-counting small-range branch."""
    m = float(len(regs))
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    inv = np.ldexp(1.0, -regs.astype(np.int64))  # exact 2^-r
    e = alpha * m * m / float(inv.sum())
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))
    return float(e)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) over a Dataset in one streaming
    pass: per-block register folds, associative max-merge up the reduction
    tree, one 2^p-byte state to the driver. Standard error ≈ 1.04/sqrt(2^p)
    (~1.6% at the default p=12 / 4 KiB). Deterministic (stable hash +
    order-free max), so the estimate never moves across layouts/reruns."""
    import ray.data

    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18]; got {p}")
    m = 1 << p

    def acc_block(regs: np.ndarray, block) -> np.ndarray:
        if isinstance(block, pa.Table):
            s = block.column(col).to_pandas()
        else:
            s = block[col]
        return hll_accumulate(regs, s, p)

    agg = ray.data.aggregate.AggregateFn(
        init=lambda _k: np.zeros(m, np.uint8),
        merge=np.maximum,
        accumulate_block=acc_block,
        finalize=hll_estimate,
        name="hll",
    )
    row = ds.aggregate(agg)
    return float(row["hll"]) if row is not None else 0.0


def bucket_quantiles(ds, col: str, qs: tuple = (0.25, 0.5, 0.9, 0.99),
                     width: float = 1.0, max_buckets: int = 2_000_000):
    """Mergeable fixed-width-bucket quantile sketch: one streaming pass of
    per-batch bucket counts (``bucket = floor(v / width)``) -> a groupby-sum
    over <= one row per occupied bucket -> a driver-side CDF. The estimate
    for quantile ``q`` is the LOWER EDGE (``bucket * width``) of the bucket
    holding the ``ceil(q * n)``-th smallest non-null value, so the value
    error is bounded by ``width`` — the bounded-universe cousin of a KLL/
    t-digest sketch, chosen because it is DETERMINISTIC and bit-exactly
    restatable in SQL (floor of an IEEE double division is the same number
    in numpy and DuckDB; no interpolation, no randomized compaction).

    Unlike ``analysis.quantile_filter``'s exact distinct-value CDF (right
    answer when the column is already quantized), this stays bounded on
    continuous columns with unbounded distinct values: state is one int64
    count per OCCUPIED bucket, merged associatively, never one row per
    distinct value. ``max_buckets`` guards the driver pull (raises, never
    truncates). Nulls are ignored. Returns an Arrow table (q double,
    est double) in ``qs`` order; empty input yields null estimates.
    """
    if width <= 0:
        raise ValueError(f"width must be positive; got {width}")

    def partials(batch: pa.Table) -> pa.Table:
        v = batch.column(col).drop_null().to_numpy(zero_copy_only=False)
        bk = np.floor(v.astype(np.float64) / width).astype(np.int64)
        u, c = np.unique(bk, return_counts=True)
        return pa.table({"bk": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    rows = (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("bk").sum("c").take_all())
    if len(rows) > max_buckets:
        raise ValueError(
            f"bucket_quantiles: {len(rows)} occupied buckets exceeds "
            f"max_buckets={max_buckets}; widen `width`."
        )
    qs_arr = pa.array([float(q) for q in qs], pa.float64())
    if not rows:
        return pa.table({"q": qs_arr,
                         "est": pa.array([None] * len(qs), pa.float64())})
    bks = np.array(sorted(r["bk"] for r in rows), np.int64)
    counts = {r["bk"]: int(r["sum(c)"]) for r in rows}
    cum = np.cumsum([counts[b] for b in bks])
    n = int(cum[-1])
    ests = []
    for q in qs:
        r = int(np.ceil(float(q) * n))
        r = max(r, 1)
        idx = int(np.searchsorted(cum, r))
        ests.append(float(bks[min(idx, len(bks) - 1)]) * width)
    return pa.table({"q": qs_arr, "est": pa.array(ests, pa.float64())})


def bucket_quantiles_by_key(ds, key_col: str, col: str,
                            qs: tuple = (0.25, 0.5, 0.9, 0.99),
                            width: float = 1.0,
                            max_buckets: int = 2_000_000):
    """Per-group ``bucket_quantiles``: one partial-counts pass emits
    (key, bucket, c) rows, a groupby-sum leaves <= one row per occupied
    (key, bucket), and the driver walks each key's CDF. Same determinism
    contract (floor of an IEEE division; estimate = lower bucket edge at
    rank ceil(q*n_key)) so it restates bit-exact in SQL with one window
    cumsum per key. Returns Arrow (key_col, q, est) sorted by (key, q);
    ``max_buckets`` bounds the TOTAL (key x bucket) rows the driver pulls
    (raises, never truncates)."""
    if width <= 0:
        raise ValueError(f"width must be positive; got {width}")

    key_type = ds.schema().base_schema.field(key_col).type

    def partials(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, col]).drop_null().to_pandas()
        if not len(df):
            return pa.table({key_col: pa.array([], key_type),
                             "bk": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        df["bk"] = np.floor(df[col].to_numpy(np.float64) / width).astype(
            np.int64)
        g = df.groupby([key_col, "bk"], sort=False).size().reset_index(
            name="c")
        return pa.table({key_col: pa.array(list(g[key_col]), key_type),
                         "bk": pa.array(g["bk"].to_numpy(), pa.int64()),
                         "c": pa.array(g["c"].to_numpy().astype(np.int64),
                                       pa.int64())})

    rows = (ds.map_batches(partials, batch_format="pyarrow")
            .groupby([key_col, "bk"]).sum("c").take_all())
    if len(rows) > max_buckets:
        raise ValueError(
            f"bucket_quantiles_by_key: {len(rows)} occupied (key, bucket) "
            f"rows exceeds max_buckets={max_buckets}; widen `width`."
        )
    per_key: dict = {}
    for r in rows:
        per_key.setdefault(r[key_col], []).append((r["bk"], int(r["sum(c)"])))
    out_k, out_q, out_e = [], [], []
    for kk in sorted(per_key):
        buckets = sorted(per_key[kk])
        bks = np.array([b for b, _ in buckets], np.int64)
        cum = np.cumsum([c for _, c in buckets])
        n = int(cum[-1])
        for q in qs:
            r = max(int(np.ceil(float(q) * n)), 1)
            idx = min(int(np.searchsorted(cum, r)), len(bks) - 1)
            out_k.append(kk)
            out_q.append(float(q))
            out_e.append(float(bks[idx]) * width)
    return pa.table({key_col: pa.array(out_k, key_type),
                     "q": pa.array(out_q, pa.float64()),
                     "est": pa.array(out_e, pa.float64())})
