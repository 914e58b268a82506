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
