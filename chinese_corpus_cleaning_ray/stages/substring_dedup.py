"""Cross-document duplicated-substring scrub (suffix-window dedup).

Removes (or measures) every character span that is covered by an L-character
window occurring in >= ``min_docs`` DISTINCT documents — the substring-level
deduplication of Lee et al., "Deduplicating Training Data Makes Language
Models Better" (ACL 2022), re-expressed for Ray Data. The published
implementation builds a corpus-wide suffix array; at 100 TB that is a single
giant sorted structure, so this engine restates the same semantics as three
streaming passes over fixed-length windows:

1. **Postings**: every batch emits one row per DISTINCT window hash per
   document (a 64-bit rolling polynomial hash computed in one vectorized
   numpy pass over the batch's concatenated codepoints — no per-window
   Python). A ``groupby(h).count()`` then yields the distinct-document
   frequency of every window: one shuffle whose rows are 8-byte hashes,
   never the window text.
2. **Verify** (exactness): hash-flagged windows are a SUPERSET of the truly
   duplicated ones (equal strings always collide; unequal strings collide
   with probability ~2^-64). The candidate window STRINGS — only those, a
   small fraction of the corpus — are re-grouped by their actual text and
   re-counted, so the final answer is exact string semantics, independent of
   hash quality (same pattern as the verified-MinHash stage,
   ``dedup_stage._verified_minhash_pairs``).
3. **Spans**: a last pass marks every offset whose window hash is in the
   verified set, merges overlapping [off, off+L) intervals per document
   (vectorized gaps-and-islands), and either reports ``(id, dup_chars,
   n_spans)`` or cuts the spans out of the text.

Membership structures follow the house auto/broadcast/join convention: the
verified dup-hash set is collected and broadcast via ``ray.put`` when it
fits ``broadcast_limit`` (8 bytes per duplicated window), else every
membership test becomes a co-sharded union+groupby semi-join and the span
rows rejoin the text through ``hash_join`` — the driver never holds the set.

The reference has only intra-document repetition handling (13-gram window,
``text_quality_filter/utils/repetition.py`` semantics re-expressed in
``functions/rules.py``); cross-document substring dedup is part of the
added training-data surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_BASE = np.uint64(1099511628211)  # FNV-1a prime; odd => invertible mod 2^64
_INV_BASE = np.uint64(pow(1099511628211, -1, 1 << 64))


def _window_hashes(texts: list[str], window: int):
    """All ``window``-char rolling hashes of every text, one numpy pass.

    Returns ``(doc_idx int64[], off int64[], h uint64[])`` — one entry per
    window position; ``off`` is the 0-based character offset inside its text.
    Hash of text[i:i+L] is ``sum_t cp[i+t] * BASE^t  (mod 2^64)``, computed
    for every i at once from wrap-around prefix sums: with
    ``P[k] = sum_{j<k} cp[j] * BASE^j`` the window sum is
    ``(P[i+L] - P[i]) * BASE^-i`` — cumsum/cumprod on uint64 wrap mod 2^64,
    which IS the ring the hash lives in, so no bigint anywhere.
    """
    lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    total = int(lens.sum())
    if total == 0:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.uint64)
    cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                       np.uint32).astype(np.uint64)
    pows = np.full(total, _BASE, np.uint64)
    pows[0] = 1
    np.cumprod(pows, out=pows)                      # BASE^j
    ipows = np.full(total, _INV_BASE, np.uint64)
    ipows[0] = 1
    np.cumprod(ipows, out=ipows)                    # BASE^-j
    P = np.zeros(total + 1, np.uint64)
    np.cumsum(cp * pows, out=P[1:])

    cnt = np.maximum(lens - window + 1, 0)
    n_win = int(cnt.sum())
    if n_win == 0:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.uint64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), cnt)
    csum = np.concatenate(([0], np.cumsum(cnt)))
    off = np.arange(n_win, dtype=np.int64) - np.repeat(csum[:-1], cnt)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    g = np.repeat(starts, cnt) + off
    h = (P[g + window] - P[g]) * ipows[g]
    return doc_idx, off, h


def _hash_of_windows(wins: list[str], window: int) -> np.ndarray:
    """Hash of each full ``window``-length string (one window per string)."""
    _, _, h = _window_hashes(wins, window)
    return h


def _merge_spans(off: np.ndarray, window: int):
    """Merge sorted same-length intervals [off, off+window): returns
    (starts, ends) of the maximal merged spans (vectorized)."""
    if len(off) == 0:
        z = np.zeros(0, np.int64)
        return z, z
    brk = np.concatenate(([True], off[1:] - off[:-1] >= window))
    starts = off[brk]
    ends_idx = np.concatenate((np.nonzero(brk)[0][1:] - 1, [len(off) - 1]))
    ends = off[ends_idx] + window
    return starts, ends


def _unique_doc_hash_rows(batch: pa.Table, id_col: str, text_col: str,
                          window: int) -> pa.Table:
    """(h,) rows, one per DISTINCT window hash per document of the batch.
    A document is a single row, so within-batch dedup is complete — the
    downstream ``groupby(h).count()`` therefore counts distinct documents."""
    texts = batch.column(text_col).to_pylist()
    doc_idx, _, h = _window_hashes(texts, window)
    if len(h) == 0:
        return pa.table({"h": pa.array([], pa.int64())})
    # unique (doc, h): sort by (doc, h) then drop equal neighbours
    order = np.lexsort((h, doc_idx))
    d, hh = doc_idx[order], h[order]
    keep = np.concatenate(([True], (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])))
    return pa.table({"h": pa.array(hh[keep].astype(np.int64), pa.int64())})


_SHARD_MASK = 255  # 256 coarse shards — a partition knob, not a key space


def _dup_hash_ds(ds, id_col: str, text_col: str, window: int, min_docs: int):
    """Distinct-document window frequency -> Dataset of duplicated hashes.

    Shape: per-batch partial counts (one (h, c) row per distinct hash in
    the batch, c = distinct docs — the combiner) -> ONE coarse-shard
    groupby (h & 255, never one Ray group per hash) -> vectorized
    per-shard sum + threshold. Same plan as ``paragraph_dedup``'s count
    pass; Ray's per-key sorted aggregate over millions of single-row
    hash keys is ~10x slower at this shape."""
    def postings(batch: pa.Table) -> pa.Table:
        t = _unique_doc_hash_rows(batch, id_col, text_col, window)
        h = t.column("h").to_numpy(zero_copy_only=False)
        u, c = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(u, pa.int64()),
            "c": pa.array(c.astype(np.int64), pa.int64()),
            "__shard": pa.array((u & _SHARD_MASK).astype(np.int32)),
        })

    def count_shard(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        u, inv = np.unique(h, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, c)
        return pa.table({"h": pa.array(u[tot >= min_docs], pa.int64())})

    return (ds.map_batches(postings, batch_format="pyarrow")
            .groupby("__shard").map_groups(count_shard,
                                           batch_format="pyarrow"))


def _broadcast_hash_set(duph_ds, broadcast_limit: int):
    """Materialize + count the dup-hash Dataset; return ('broadcast', ref)
    with a sorted int64 numpy array in the object store, or ('join', ds)."""
    import ray

    duph_ds = duph_ds.materialize()
    n = duph_ds.count()
    if n > broadcast_limit:
        return "join", duph_ds, n
    hs = np.sort(np.concatenate(
        [b["h"] for b in duph_ds.iter_batches(batch_format="numpy")]
        or [np.zeros(0, np.int64)]).astype(np.int64))
    return "broadcast", ray.put(hs), n


def _in_sorted(hset: np.ndarray, h: np.ndarray) -> np.ndarray:
    x = h.astype(np.int64)
    if len(hset) == 0:
        return np.zeros(len(x), bool)
    idx = np.clip(np.searchsorted(hset, x), 0, len(hset) - 1)
    return hset[idx] == x


def _verified_hash_ds(ds, duph_mode, id_col: str, text_col: str,
                      window: int, min_docs: int, shards: int | None):
    """Exactness pass: re-count the hash-flagged candidate windows by their
    actual STRING and return a Dataset of verified duplicated hashes."""
    mode, ref, _ = duph_mode

    if mode == "broadcast":
        import ray

        def cand_wins(batch: pa.Table) -> pa.Table:
            hset = ray.get(ref)
            texts = batch.column(text_col).to_pylist()
            doc_idx, off, h = _window_hashes(texts, window)
            m = _in_sorted(hset, h)
            if not m.any():
                return pa.table({"win": pa.array([], pa.string())})
            df = pd.DataFrame({"d": doc_idx[m], "o": off[m]})
            df = df.assign(win=[texts[d][o:o + window]
                                for d, o in zip(df.d, df.o)])
            # one row per distinct (doc, win) — distinct-doc counting again
            return pa.table({"win": pa.array(
                df.drop_duplicates(["d", "win"]).win.to_numpy(), pa.string())})

        cand = ds.map_batches(cand_wins, batch_format="pyarrow")
    else:
        cand = _joined_candidate_wins(ds, ref, id_col, text_col, window,
                                      shards)

    # same coarse-shard count plan as _dup_hash_ds, keyed on the string
    def win_partials(batch: pa.Table) -> pa.Table:
        w = batch.column("win").to_numpy(zero_copy_only=False)
        u, c = np.unique(w, return_counts=True)
        sh = (pd.util.hash_array(u).astype(np.int64)
              & _SHARD_MASK).astype(np.int32)
        return pa.table({"win": pa.array(u, pa.string()),
                         "c": pa.array(c.astype(np.int64), pa.int64()),
                         "__shard": pa.array(sh)})

    def win_count_shard(group: pa.Table) -> pa.Table:
        w = group.column("win").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        u, inv = np.unique(w, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, c)
        return pa.table({"win": pa.array(u[tot >= min_docs], pa.string())})

    verified_wins = (cand.map_batches(win_partials, batch_format="pyarrow")
                     .groupby("__shard").map_groups(win_count_shard,
                                                    batch_format="pyarrow"))

    def rehash(batch: pa.Table) -> pa.Table:
        wins = batch.column("win").to_pylist()
        h = _hash_of_windows(wins, window)
        return pa.table({"h": pa.array(h.astype(np.int64), pa.int64())})

    return verified_wins.map_batches(rehash, batch_format="pyarrow")


def _semi_mark_offsets(ds, duph_ds, id_col: str, text_col: str, window: int,
                       shards: int | None):
    """Distributed membership: postings (h, id, off) co-sharded with the
    dup-hash rows by h; one groupby marks surviving offsets. Returns a
    Dataset of (id, off) candidate rows. Nothing on the driver."""
    from chinese_corpus_cleaning_ray.stages.pools import cluster_cpus

    P = shards or max(16, cluster_cpus() * 2)
    id_type = ds.schema().base_schema.field(id_col).type

    def tag_postings(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col)
        doc_idx, off, h = _window_hashes(texts, window)
        hi = h.astype(np.int64)
        return pa.table({
            "h": pa.array(hi, pa.int64()),
            "__shard": pa.array((h % np.uint64(P)).astype(np.int32)),
            id_col: ids.take(pa.array(doc_idx)),
            "off": pa.array(off, pa.int64()),
            "__dup": pa.array(np.zeros(len(hi), np.int8)),
        })

    def tag_dup(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        return pa.table({
            "h": pa.array(h, pa.int64()),
            "__shard": pa.array((h.astype(np.uint64) % np.uint64(P))
                                .astype(np.int32)),
            id_col: pa.nulls(len(h), id_type),
            "off": pa.nulls(len(h), pa.int64()),
            "__dup": pa.array(np.ones(len(h), np.int8)),
        })

    both = (ds.map_batches(tag_postings, batch_format="pyarrow")
            .union(duph_ds.map_batches(tag_dup, batch_format="pyarrow")))

    def mark(group: pa.Table) -> pa.Table:
        t = group
        dup = t.column("__dup").to_numpy(zero_copy_only=False) == 1
        h = t.column("h").to_numpy(zero_copy_only=False)
        dset = np.sort(h[dup])
        keep = ~dup & _in_sorted(dset, h.astype(np.uint64))
        kept = t.filter(pa.array(keep))
        return kept.select([id_col, "off"])

    return both.groupby("__shard").map_groups(mark, batch_format="pyarrow")


def _joined_candidate_wins(ds, duph_ds, id_col: str, text_col: str,
                           window: int, shards: int | None):
    """Join-mode candidate extraction: candidate (id, off) rows rejoin the
    column-pruned text side through hash_join, then slice the strings."""
    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    cand = _semi_mark_offsets(ds, duph_ds, id_col, text_col, window, shards)
    docs = ds.select_columns([id_col, text_col])
    joined = hash_join(cand, docs, on=id_col, how="inner", shards=shards)

    def slice_wins(batch: pa.Table) -> pa.Table:
        df = batch.select([id_col, "off", text_col]).to_pandas()
        df = df.assign(win=[t[o:o + window]
                            for t, o in zip(df[text_col], df.off)])
        return pa.table({"win": pa.array(
            df.drop_duplicates([id_col, "win"]).win.to_numpy(), pa.string())})

    return joined.map_batches(slice_wins, batch_format="pyarrow")


def _spans_frame(texts: list[str], hset: np.ndarray, window: int):
    """Per-doc merged dup spans for a batch: returns (dup_chars int64[],
    n_spans int64[], spans list[list[(s,e)]]) aligned with ``texts``."""
    doc_idx, off, h = _window_hashes(texts, window)
    m = _in_sorted(hset, h)
    dup_chars = np.zeros(len(texts), np.int64)
    n_spans = np.zeros(len(texts), np.int64)
    spans: list[list[tuple[int, int]]] = [[] for _ in texts]
    if m.any():
        d, o = doc_idx[m], off[m]
        for dv in np.unique(d):
            s, e = _merge_spans(o[d == dv], window)
            dup_chars[dv] = int((e - s).sum())
            n_spans[dv] = len(s)
            spans[dv] = list(zip(s.tolist(), e.tolist()))
    return dup_chars, n_spans, spans


def _cut(text: str, spans: list[tuple[int, int]]) -> str:
    if not spans:
        return text
    parts, prev = [], 0
    for s, e in spans:
        parts.append(text[prev:s])
        prev = e
    parts.append(text[prev:])
    return "".join(parts)


def duplicated_window_spans(ds, id_col: str = "doc_id",
                            text_col: str = "text", window: int = 30,
                            min_docs: int = 2, strategy: str = "auto",
                            broadcast_limit: int = 2_000_000,
                            shards: int | None = None):
    """Per-document duplicated-substring mass: ``(id_col, dup_chars,
    n_spans)`` for EVERY document (zeros when clean). ``dup_chars`` is the
    size of the union of all [off, off+window) intervals whose window text
    occurs in >= ``min_docs`` distinct documents; ``n_spans`` counts the
    maximal merged spans. Exact string semantics (hash candidates are
    string-verified). ``ds`` is consumed three times."""
    duph = _dup_hash_ds(ds, id_col, text_col, window, min_docs)
    if strategy == "auto":
        mode = _broadcast_hash_set(duph, broadcast_limit)
    elif strategy == "broadcast":
        m, r, n = _broadcast_hash_set(duph, np.iinfo(np.int64).max)
        mode = (m, r, n)
    elif strategy == "join":
        mode = ("join", duph.materialize(), -1)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    vh = _verified_hash_ds(ds, mode, id_col, text_col, window, min_docs,
                           shards)
    return _finalize_spans(ds, vh, mode[0], id_col, text_col, window, shards)


def _finalize_spans(ds, vh, kind: str, id_col: str, text_col: str,
                    window: int, shards: int | None):
    """Last pass: verified dup-hash Dataset -> (id, dup_chars, n_spans) for
    every document (zeros included)."""
    if kind == "broadcast":
        import ray

        vmode = _broadcast_hash_set(vh, np.iinfo(np.int64).max)
        vref = vmode[1]

        def spans_batch(batch: pa.Table) -> pa.Table:
            hset = ray.get(vref)
            texts = batch.column(text_col).to_pylist()
            dup_chars, n_spans, _ = _spans_frame(texts, hset, window)
            return pa.table({
                id_col: batch.column(id_col),
                "dup_chars": pa.array(dup_chars, pa.int64()),
                "n_spans": pa.array(n_spans, pa.int64()),
            })

        return ds.map_batches(spans_batch, batch_format="pyarrow")

    # join mode: verified candidate offsets -> per-doc span reduction; docs
    # with no dup windows are restored by a left hash_join against the ids.
    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    cand = _semi_mark_offsets(ds, vh.materialize(), id_col, text_col,
                              window, shards)

    def reduce_doc(group: pd.DataFrame) -> pd.DataFrame:
        off = np.sort(group["off"].to_numpy())
        s, e = _merge_spans(off, window)
        return pd.DataFrame({id_col: [group[id_col].iloc[0]],
                             "dup_chars": [int((e - s).sum())],
                             "n_spans": [len(s)]})

    per_doc = cand.groupby(id_col).map_groups(reduce_doc,
                                              batch_format="pandas")
    out = hash_join(ds.select_columns([id_col]), per_doc, on=id_col,
                    how="left", shards=shards)

    def fill_zero(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            id_col: batch.column(id_col),
            "dup_chars": pc.fill_null(
                pc.cast(batch.column("dup_chars"), pa.int64()), 0),
            "n_spans": pc.fill_null(
                pc.cast(batch.column("n_spans"), pa.int64()), 0),
        })

    return out.map_batches(fill_zero, batch_format="pyarrow")


def scrub_duplicated_windows(ds, id_col: str = "doc_id",
                             text_col: str = "text", window: int = 30,
                             min_docs: int = 2, strategy: str = "auto",
                             broadcast_limit: int = 2_000_000,
                             shards: int | None = None):
    """Cut every verified duplicated span out of ``text_col`` (all other
    columns pass through); adds ``dup_chars`` (characters removed). The cut
    is the complement of the merged spans — equal texts in >= min_docs docs
    collapse to their unique prefix/suffix remainders, exactly the
    Lee-et-al. substring cut at window granularity."""
    duph = _dup_hash_ds(ds, id_col, text_col, window, min_docs)
    if strategy == "join":
        mode = ("join", duph.materialize(), -1)
    else:
        mode = _broadcast_hash_set(
            duph, broadcast_limit if strategy == "auto"
            else np.iinfo(np.int64).max)
    vh = _verified_hash_ds(ds, mode, id_col, text_col, window, min_docs,
                           shards)
    return _finalize_cut(ds, vh, mode[0], id_col, text_col, window, shards)


def _finalize_cut(ds, vh, kind: str, id_col: str, text_col: str,
                  window: int, shards: int | None):
    """Last pass: verified dup-hash Dataset -> ds with the merged spans cut
    out of ``text_col`` and a ``dup_chars`` column appended."""
    import ray

    if kind == "broadcast":
        vref = _broadcast_hash_set(vh, np.iinfo(np.int64).max)[1]

        def cut_batch(batch: pa.Table) -> pa.Table:
            hset = ray.get(vref)
            texts = batch.column(text_col).to_pylist()
            dup_chars, _, spans = _spans_frame(texts, hset, window)
            cut = [_cut(t, sp) for t, sp in zip(texts, spans)]
            cols = {n: batch.column(n) for n in batch.column_names}
            cols[text_col] = pa.array(cut, pa.string())
            cols["dup_chars"] = pa.array(dup_chars, pa.int64())
            return pa.table(cols)

        return ds.map_batches(cut_batch, batch_format="pyarrow")

    # join mode: per-doc span lists travel as list columns through hash_join
    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    cand = _semi_mark_offsets(ds, vh.materialize(), id_col, text_col,
                              window, shards)

    def reduce_doc(group: pa.Table) -> pa.Table:
        off = np.sort(group.column("off").to_numpy(zero_copy_only=False))
        s, e = _merge_spans(off, window)
        # concrete Arrow list types so hash_join's union schema is exact
        return pa.table({
            id_col: group.column(id_col).slice(0, 1),
            "span_s": pa.array([s.tolist()], pa.list_(pa.int64())),
            "span_e": pa.array([e.tolist()], pa.list_(pa.int64())),
        })

    per_doc = cand.groupby(id_col).map_groups(reduce_doc,
                                              batch_format="pyarrow")
    joined = hash_join(ds, per_doc, on=id_col, how="left", shards=shards)

    def cut_joined(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cut, removed = [], []
        for t, s, e in zip(df[text_col], df["span_s"], df["span_e"]):
            if s is None or (hasattr(s, "__len__") and len(s) == 0) \
                    or (isinstance(s, float) and np.isnan(s)):
                cut.append(t)
                removed.append(0)
            else:
                spans = list(zip(list(s), list(e)))
                cut.append(_cut(t, spans))
                removed.append(int(sum(b - a for a, b in spans)))
        df[text_col] = cut
        df["dup_chars"] = np.asarray(removed, np.int64)
        return pa.Table.from_pandas(
            df.drop(columns=["span_s", "span_e"]), preserve_index=False)

    return joined.map_batches(cut_joined, batch_format="pyarrow")


def _distinct_window_hash_ds(ds, text_col: str, window: int):
    """Distinct window hashes of a corpus (no per-doc bookkeeping): per-batch
    np.unique partials -> one coarse-shard groupby -> per-shard unique."""
    def postings(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        _, _, h = _window_hashes(texts, window)
        u = np.unique(h).astype(np.int64)
        return pa.table({
            "h": pa.array(u, pa.int64()),
            "__shard": pa.array((u & _SHARD_MASK).astype(np.int32)),
        })

    def uniq_shard(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(np.unique(h), pa.int64())})

    return (ds.map_batches(postings, batch_format="pyarrow")
            .groupby("__shard").map_groups(uniq_shard,
                                           batch_format="pyarrow"))


def _candidate_wins_ds(ds, mode_kind, ref_or_ds, id_col: str, text_col: str,
                       window: int, shards: int | None):
    """Distinct candidate window strings of ``ds`` whose hash is in the
    given membership structure (broadcast ref or join-side Dataset)."""
    if mode_kind == "broadcast":
        import ray

        def cand_wins(batch: pa.Table) -> pa.Table:
            hset = ray.get(ref_or_ds)
            texts = batch.column(text_col).to_pylist()
            doc_idx, off, h = _window_hashes(texts, window)
            m = _in_sorted(hset, h)
            if not m.any():
                return pa.table({"win": pa.array([], pa.string())})
            wins = {texts[d][o:o + window]
                    for d, o in zip(doc_idx[m], off[m])}
            return pa.table({"win": pa.array(sorted(wins), pa.string())})

        return ds.map_batches(cand_wins, batch_format="pyarrow")
    return _joined_candidate_wins(ds, ref_or_ds, id_col, text_col, window,
                                  shards)


def incremental_substring_scrub(fresh, seen, id_col: str = "doc_id",
                                text_col: str = "text",
                                seen_id_col: str | None = None,
                                seen_text_col: str | None = None,
                                window: int = 30, strategy: str = "auto",
                                broadcast_limit: int = 2_000_000,
                                shards: int | None = None,
                                report_only: bool = False):
    """Cross-RUN substring dedup: cut from every ``fresh`` document each
    character span covered by a ``window``-length substring that occurs
    ANYWHERE in the committed ``seen`` corpus — the incremental companion of
    ``scrub_duplicated_windows``, mirroring how ``incremental_dedup``
    extends ``exact_dedup`` (new data must not repeat what an earlier run
    already shipped, at substring granularity).

    Exactness: hash membership flags a candidate SUPERSET; the candidate
    window strings of BOTH sides then meet in one coarse-shard groupby and
    only strings present on both sides survive (string-exact, collision-
    free by construction). The seen corpus contributes one 8-byte hash per
    distinct window plus the candidate strings — its text never ships in
    full. ``report_only=True`` returns ``(id_col, dup_chars, n_spans)`` per
    fresh doc instead of cutting.
    """
    seen_id = seen_id_col or id_col
    seen_text = seen_text_col or text_col
    seenh = _distinct_window_hash_ds(seen, seen_text, window)
    if strategy == "auto":
        kind, ref, _ = _broadcast_hash_set(seenh, broadcast_limit)
    elif strategy == "broadcast":
        kind, ref, _ = _broadcast_hash_set(seenh, np.iinfo(np.int64).max)
    elif strategy == "join":
        kind, ref = "join", seenh.materialize()
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    # verify: candidate strings from both sides meet per content shard;
    # survivors occur on BOTH sides — the exact cross-corpus window set.
    # The fresh side's candidates answer "which of MY windows hash-hit the
    # seen set"; the seen side's candidates need the reverse membership, so
    # broadcast mode first collects the fresh candidates' hash set.
    fresh_cand = _candidate_wins_ds(fresh, kind, ref, id_col, text_col,
                                    window, shards)

    def rehash(batch: pa.Table) -> pa.Table:
        wins = batch.column("win").to_pylist()
        h = _hash_of_windows(wins, window)
        return pa.table({
            "h": pa.array(h.astype(np.int64), pa.int64()),
            "__shard": pa.array((h % np.uint64(_SHARD_MASK + 1))
                                .astype(np.int32)),
        })

    if kind == "broadcast":
        fkind, fref, _ = _broadcast_hash_set(
            fresh_cand.map_batches(rehash, batch_format="pyarrow")
            .drop_columns(["__shard"]), np.iinfo(np.int64).max)
        seen_cand = _candidate_wins_ds(seen, "broadcast", fref, seen_id,
                                       seen_text, window, shards)
    else:
        fh = (fresh_cand.map_batches(rehash, batch_format="pyarrow")
              .drop_columns(["__shard"]).materialize())
        seen_cand = _candidate_wins_ds(seen, "join", fh, seen_id, seen_text,
                                       window, shards)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            w = batch.column("win").to_numpy(zero_copy_only=False)
            sh = (pd.util.hash_array(w).astype(np.int64)
                  & _SHARD_MASK).astype(np.int32)
            return pa.table({
                "win": batch.column("win"),
                "__shard": pa.array(sh),
                "__side": pa.array(np.full(len(w), side, np.int8)),
            })
        return fn

    both = (fresh_cand.map_batches(tag(0), batch_format="pyarrow")
            .union(seen_cand.map_batches(tag(1), batch_format="pyarrow")))

    def intersect_shard(group: pa.Table) -> pa.Table:
        w = group.column("win").to_numpy(zero_copy_only=False)
        s = group.column("__side").to_numpy(zero_copy_only=False)
        on_fresh = np.unique(w[s == 0])
        on_seen = np.unique(w[s == 1])
        keep = np.intersect1d(on_fresh, on_seen)
        return pa.table({"win": pa.array(keep, pa.string())})

    verified_wins = both.groupby("__shard").map_groups(
        intersect_shard, batch_format="pyarrow")

    def rehash_plain(batch: pa.Table) -> pa.Table:
        wins = batch.column("win").to_pylist()
        h = _hash_of_windows(wins, window)
        return pa.table({"h": pa.array(h.astype(np.int64), pa.int64())})

    vh = verified_wins.map_batches(rehash_plain, batch_format="pyarrow")
    if report_only:
        return _finalize_spans(fresh, vh, kind, id_col, text_col, window,
                               shards)
    return _finalize_cut(fresh, vh, kind, id_col, text_col, window, shards)
