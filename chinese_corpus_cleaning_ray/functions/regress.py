"""Closed-form linear probe over INTEGER features — the distributed
model-fitting primitive a training-data pipeline uses to turn hand-labeled
quality signals into a fast linear filter (fit once over the corpus, apply
per batch; the heavy lift is one streaming aggregation, never an SGD loop).

Determinism is the design constraint: float partial sums depend on Ray's
merge order, so the normal equations are accumulated as EXACT int64 sums
(features and label are integers — lengths, token counts, marker counts;
a ``ValueError`` rejects anything else). The driver then solves the tiny
(d+1)x(d+1) system by Cramer's rule in arbitrary-precision Python ints, so
every coefficient is ``float(exact_det_i) / float(exact_det)`` — one
double rounding of exact integers, bit-identical across layouts, reruns,
and engines (the SQL oracle restates the same sums as HUGEINT and the same
two casts). Singular systems return all-null coefficients rather than
raising — the caller sees "no fit", never a crash.

This complements the score-side ops (``functions/rules.py`` composite,
``stages/quality_stages.py``): the reference tunes its thresholds by hand
(ref text_quality_filter/main.py constants); this primitive fits them from
data at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_INT_TYPES = {pa.int8(), pa.int16(), pa.int32(), pa.int64(),
              pa.uint8(), pa.uint16(), pa.uint32()}


def _check_int(schema: pa.Schema, cols: list[str]) -> None:
    for c in cols:
        t = schema.field(c).type
        if t not in _INT_TYPES:
            raise ValueError(
                f"linear_probe: column {c!r} has type {t}; only integer "
                "columns keep the normal equations exact — quantize floats "
                "upstream (e.g. cents, char counts)."
            )


def _det_int(m: list[list[int]]) -> int:
    """Exact determinant of a small integer matrix (fraction-free Bareiss)."""
    a = [row[:] for row in m]
    n = len(a)
    sign = 1
    prev = 1
    for k in range(n - 1):
        if a[k][k] == 0:
            swap = next((i for i in range(k + 1, n) if a[i][k] != 0), None)
            if swap is None:
                return 0
            a[k], a[swap] = a[swap], a[k]
            sign = -sign
        for i in range(k + 1, n):
            for j in range(k + 1, n):
                a[i][j] = (a[i][j] * a[k][k] - a[i][k] * a[k][j]) // prev
        prev = a[k][k]
    return sign * a[n - 1][n - 1]


def linear_probe(ds, x_cols: list[str], y_col: str):
    """Least-squares fit ``y ~ intercept + sum(beta_i * x_i)`` over integer
    columns, one streaming pass. Returns an Arrow table with one row per
    coefficient: (term string, coef double) — ``intercept`` first, then
    ``x_cols`` in order. All-null coefs when X'X is singular.

    Plan: each batch contributes the exact int64 Gram entries (X'X and X'y
    with a leading 1s column), summed per batch with numpy int64 dot
    products; the driver adds the per-batch partials in arbitrary-precision
    Python ints (layout-proof: integer addition commutes), then solves by
    Cramer on exact determinants. Nulls: rows with ANY null in the used
    columns are dropped (SQL semantics: restate with IS NOT NULL)."""
    sch = ds.schema().base_schema
    _check_int(sch, list(x_cols) + [y_col])
    d = len(x_cols) + 1  # intercept

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.select(list(x_cols) + [y_col]).drop_null()
        n = t.num_rows
        X = np.empty((n, d), np.int64)
        X[:, 0] = 1
        for j, c in enumerate(x_cols):
            X[:, j + 1] = t.column(c).to_numpy(zero_copy_only=False)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # object-dtype dot keeps entries exact past int64 (Python ints)
        Xo = X.astype(object)
        g = (Xo.T @ Xo).ravel()
        b = (Xo.T @ y.astype(object))
        vals = [str(int(v)) for v in list(g) + list(b)]
        return pa.table({"idx": pa.array(range(len(vals)), pa.int64()),
                         "val": pa.array(vals, pa.string())})

    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    acc = {}
    for r in rows:
        acc[r["idx"]] = acc.get(r["idx"], 0) + int(r["val"])
    terms = ["intercept"] + list(x_cols)
    if not acc:
        return pa.table({"term": pa.array(terms, pa.string()),
                         "coef": pa.array([None] * d, pa.float64())})
    G = [[acc[i * d + j] for j in range(d)] for i in range(d)]
    b = [acc[d * d + i] for i in range(d)]
    det = _det_int(G)
    if det == 0:
        coefs = [None] * d
    else:
        coefs = []
        for i in range(d):
            Gi = [[(b[r] if c == i else G[r][c]) for c in range(d)]
                  for r in range(d)]
            # float(int)/float(int) — exactly the SQL restatement's
            # CAST(det_i AS DOUBLE) / CAST(det AS DOUBLE), so the oracle's
            # two roundings are reproduced bit-for-bit
            coefs.append(float(_det_int(Gi)) / float(det))
    return pa.table({"term": pa.array(terms, pa.string()),
                     "coef": pa.array(coefs, pa.float64())})


def apply_linear(ds, x_cols: list[str], coefs: list[float],
                 out_col: str = "score"):
    """Apply a fitted probe: ``out_col = c0 + c1*x1 + ... (left-to-right)``.
    The evaluation order is pinned so the doubles are reproducible (and
    restatable in SQL as the same chain); broadcast is trivial — the
    coefficient list rides the task closure."""
    if len(coefs) != len(x_cols) + 1:
        raise ValueError("apply_linear: need one coef per x_col + intercept")
    cs = [float(c) for c in coefs]

    def fn(batch: pa.Table) -> pa.Table:
        s = np.full(batch.num_rows, cs[0], np.float64)
        for c, col in zip(cs[1:], x_cols):
            x = batch.column(col).to_numpy(zero_copy_only=False)
            s = s + c * x.astype(np.float64)
        return batch.append_column(out_col, pa.array(s, pa.float64()))

    return ds.map_batches(fn, batch_format="pyarrow")
