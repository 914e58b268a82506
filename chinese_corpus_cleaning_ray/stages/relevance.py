"""Data-selection relevance stages: DSIR-style hashed-ngram importance
weights (target-distribution affinity for mixture reweighting, after Xie et
al. 2023 "Data Selection for Language Models via Importance Resampling") and
a log-free TF-IDF lexical search. Both are bit-reproducible: every score is
built from exact integer counts with at most a fixed, order-independent
sequence of IEEE double ops at the end, so the driver's DuckDB oracles match
bitwise.

The reference repo has no data-selection operator (its mixing is manual
corpus concatenation); these extend SURVEY §2.8's training-data bookkeeping
suite the same way the dedup/sampling families do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: Polynomial codepoint hash base for gram bucketing. Small enough that a
#: 4-codepoint poly over the full Unicode range (max 0x10FFFF) stays < 2^42,
#: far inside int64.
_POLY_BASE = 131


def _gram_buckets(texts: list[str], k: int, n_buckets: int):
    """Vectorized char-k-gram bucket extraction over a whole batch.

    Returns ``(doc_idx, bucket)`` int64 arrays, one entry per gram occurrence
    (windows never cross document boundaries). The hash is a base-131
    polynomial over the gram's codepoints mod ``n_buckets`` — chosen because
    it is exactly restatable in ANSI SQL (``unicode(substr(g, i, 1))``), so
    the driver oracle can recompute the identical bucketing.
    """
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=len(texts))
    total = int(lens.sum())
    if total < k:
        z = np.array([], dtype=np.int64)
        return z, z
    cps = np.frombuffer("".join(texts).encode("utf-32-le"),
                        dtype=np.uint32).astype(np.int64)
    # window start p is valid iff p and p+k-1 fall in the same document
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    n_win = total - k + 1
    valid = doc_of[:n_win] == doc_of[k - 1:]
    h = cps[:n_win].copy()
    for i in range(1, k):
        h *= _POLY_BASE
        h += cps[i:n_win + i]
    return doc_of[:n_win][valid], (h[valid] % n_buckets)


def dsir_weights(ds, target_col: str = "lang", target_val: str = "zh",
                 text_col: str = "text", id_col: str = "doc_id",
                 k: int = 4, n_buckets: int = 64):
    """DSIR-style importance weight per document: how target-like is each
    doc under a hashed char-``k``-gram bucket model of the target slice
    (rows where ``target_col == target_val``) vs the raw corpus.

    The classic DSIR weight is a product of per-feature likelihood ratios;
    that is float-accumulation-order-sensitive, so this uses the linear
    (expected-bucket-probability) variant, exact by construction::

        affinity(d) = ( Σ_b n_b(d)·c_t(b) / Σ_b n_b(d)·c_r(b) ) · (D_r / D_t)

    with n_b(d) the doc's bucket counts, c_t/c_r the target/raw global bucket
    counts and D_t/D_r their totals — two BIGINT dot products per doc, then
    exactly two IEEE double divisions and one multiply (no variable-order FP
    sum), hence bit-equal to the SQL restatement. affinity > 1 ⇔ the doc's
    gram mass sits in buckets over-represented in the target.

    Plan: pass 1 folds each batch to ≤ ``n_buckets`` partial rows (bucket,
    raw count, target count) — the groupby moves O(n_buckets × batches)
    tiny rows; the 64-row totals table broadcasts in the closure. Pass 2
    recomputes per-doc bucket vectors batch-locally (np.bincount over
    doc×bucket keys) and emits one row per doc: zero shuffles. At 10^14-gram
    scale the BIGINT dot products need c(b) ≲ 9e12 per bucket — beyond that,
    widen n_buckets or subsample the totals pass.

    Docs with fewer than ``k`` chars have no grams and are omitted (the SQL
    oracle drops them identically). Returns ``(id, aff_num, aff_den,
    affinity)`` sorted by id.
    """
    import pandas as pd

    def totals_partial(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        is_t = np.asarray(
            [v == target_val for v in batch.column(target_col).to_pylist()],
            dtype=bool)
        doc_idx, buckets = _gram_buckets(texts, k, n_buckets)
        c_r = np.bincount(buckets, minlength=n_buckets)
        c_t = np.bincount(buckets[is_t[doc_idx]], minlength=n_buckets)
        return pa.table({
            "b": pa.array(np.arange(n_buckets, dtype=np.int64)),
            "c_r": pa.array(c_r.astype(np.int64)),
            "c_t": pa.array(c_t.astype(np.int64)),
        })

    tot = (ds.map_batches(totals_partial, batch_format="pyarrow")
           .groupby("b").sum(["c_r", "c_t"]).to_pandas())
    c_r = np.zeros(n_buckets, dtype=np.int64)
    c_t = np.zeros(n_buckets, dtype=np.int64)
    if len(tot):  # empty input: groupby returns a column-less empty frame
        c_r[tot["b"].to_numpy()] = tot["sum(c_r)"].to_numpy()
        c_t[tot["b"].to_numpy()] = tot["sum(c_t)"].to_numpy()
    d_r, d_t = int(c_r.sum()), int(c_t.sum())
    ratio = (float(d_r) / float(d_t)) if d_t else 0.0

    def score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        doc_idx, buckets = _gram_buckets(texts, k, n_buckets)
        counts = np.bincount(doc_idx * n_buckets + buckets,
                             minlength=len(texts) * n_buckets
                             ).reshape(len(texts), n_buckets)
        num = counts @ c_t
        den = counts @ c_r
        keep = den > 0  # docs shorter than k chars have no grams
        aff = (num[keep].astype(np.float64) / den[keep].astype(np.float64)
               ) * ratio
        return pa.table({
            id_col: pa.array(ids[keep]),
            "aff_num": pa.array(num[keep].astype(np.int64)),
            "aff_den": pa.array(den[keep].astype(np.int64)),
            "affinity": pa.array(aff),
        })

    return ds.map_batches(score, batch_format="pyarrow").sort(id_col)


def tfidf_search(ds, query: str, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 4, top: int = 10,
                 idf_scale: int = 1000,
                 num_rows_hint: int | None = None):
    """Log-free TF-IDF lexical top-``top`` search: score each document
    against a fixed query string by::

        score(d) = Σ_{g ∈ grams(query)} tf(d, g) · ((idf_scale · N) // df(g))

    over distinct char-``k``-grams of the query — an integer-quantized idf
    (floor of idf_scale·N/df, monotone in the usual ln(N/df)) so the score is
    pure BIGINT and the ranking is bit-reproducible with no float-log
    divergence, same trade as ``keyword_extract``'s integer ranking key.

    Plan (ONE pass over the text): map_batches emits (doc, gram, tf) rows for
    query grams only — the pair stream is bounded by |query grams| × matching
    docs, a tiny slice of the corpus. df(g) then derives from the pair stream
    itself (each matching doc contributes one row per gram), ≤ |query grams|
    rows on the driver; scores are one more pass over the materialized pairs
    with the idf map in the closure, then a global sort-limit on the ≤ N
    scored rows. Ties break (score DESC, id ASC).
    """
    import pandas as pd

    grams = sorted({query[i:i + k] for i in range(len(query) - k + 1)})
    if not grams:
        raise ValueError(f"query shorter than k={k}")
    n_docs = num_rows_hint if num_rows_hint is not None else ds.count()
    gram_set = set(grams)

    def pairs(batch: pa.Table) -> pa.Table:
        ids_out, g_out, tf_out = [], [], []
        ids = batch.column(id_col).to_pylist()
        for i, t in zip(ids, batch.column(text_col).to_pylist()):
            t = t or ""
            counts: dict[str, int] = {}
            for j in range(len(t) - k + 1):
                g = t[j:j + k]
                if g in gram_set:
                    counts[g] = counts.get(g, 0) + 1
            ids_out.extend([i] * len(counts))
            g_out.extend(counts.keys())
            tf_out.extend(counts.values())
        return pa.table({id_col: pa.array(ids_out, pa.int64()),
                         "g": pa.array(g_out, pa.string()),
                         "tf": pa.array(tf_out, pa.int64())})

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow").materialize()
    dfs = pair_ds.groupby("g").count().to_pandas()  # df = rows per gram
    if not len(dfs):  # no document matched any query gram
        import ray

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
        }))
    idf = {g: (idf_scale * n_docs) // int(c)
           for g, c in zip(dfs["g"], dfs["count()"])}

    def score_partial(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        pdf["part"] = (pdf["tf"].to_numpy(dtype=np.int64)
                       * pdf["g"].map(idf).to_numpy(dtype=np.int64))
        agg = pdf.groupby(id_col, sort=False)["part"].sum().reset_index(
            name="part")
        return pa.Table.from_pandas(agg, preserve_index=False)

    # per-batch partial sums, then a groupby combine — a batch boundary can
    # split one doc's pair rows, so the per-doc sum must be associative
    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch.column(id_col),
                         "score": batch.column("sum(part)")})

    scored = (pair_ds.map_batches(score_partial, batch_format="pyarrow")
              .groupby(id_col).sum("part")
              .map_batches(finish, batch_format="pyarrow"))
    return scored.sort(["score", id_col], descending=[True, False]
                       ).limit(top)


def dsir_resample(ds, target_col: str = "lang", target_val: str = "zh",
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 4, n_buckets: int = 64,
                  scale_permyriad: int = 5000):
    """The "R" in DSIR — importance RESAMPLING: keep each document with
    probability proportional to its target affinity. Deterministic and
    bit-reproducible end to end:

    * ``rate(d) = clamp(floor(affinity(d) · scale_permyriad), 0, 10000)``
      — affinity is bitwise-stable (see ``dsir_weights``), and floor of one
      IEEE multiply is exact, so both engines compute the same integer rate;
    * keep iff ``LCG(id) % 10000 < rate`` — the same permyriad LCG coin as
      ``sample_by_hash``/``mixture_sample``, so membership is layout- and
      resume-invariant.

    Expected sample composition matches the DSIR target-matching objective
    to first order: docs twice as target-like are kept twice as often.
    Returns ``(id, rate)`` for kept docs, sorted by id; adds one stateless
    filter pass over the weights output (no extra text scan, no shuffle).
    """
    w = dsir_weights(ds, target_col=target_col, target_val=target_val,
                     text_col=text_col, id_col=id_col, k=k,
                     n_buckets=n_buckets)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        aff = batch.column("affinity").to_numpy(zero_copy_only=False)
        rate = np.clip(np.floor(aff * np.float64(scale_permyriad)),
                       0, 10_000).astype(np.int64)
        coin = ((ids % 2**31) * 1103515245 + 12345) % 2**31 % 10_000
        m = coin < rate
        return pa.table({id_col: pa.array(ids[m]),
                         "rate": pa.array(rate[m])})

    return w.map_batches(keep, batch_format="pyarrow")
