"""BPE tokenizer training over a Dataset — the missing half of the token
pipeline (``functions/tokens.py`` counts with a fixed BPE-ish regex; this
LEARNS the merge table from the corpus, the way a training-data pipeline
fits its tokenizer before packing sequences).

Scale shape is the textbook one (Sennrich et al. 2016; what HF tokenizers
do): merges only ever apply WITHIN a word, so the corpus collapses to a
(distinct word -> count) multiset in ONE distributed counting pass — the
merge loop then runs over distinct words only (bounded by
``max_distinct_words``; raises, never truncates), never re-reading the
corpus. Everything is exact integer counting, so the learned merge table
is deterministic across layouts and reruns (ties break by count desc,
then lexicographic pair).

Applying the merges is an actor-pool stage with a per-actor word->tokens
memo (Zipf makes the cache hit rate ~1): ``BpeEncodeStage`` /
``bpe_encode``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SHARD_MASK = 255


def _word_counts_ds(ds, text_col: str):
    """One distributed pass: (word, count) over whitespace-split tokens.
    Per-batch partial counts -> coarse-shard groupby -> per-shard sum."""
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(pc.cast(txt, pa.string()), "")
        words = pc.list_flatten(pc.split_pattern_regex(txt, r"\s+"))
        w = words.to_numpy(zero_copy_only=False)
        w = w[w != ""]
        u, c = np.unique(w, return_counts=True)
        sh = (pd.util.hash_array(u).astype(np.int64)
              & _SHARD_MASK).astype(np.int32)
        return pa.table({"word": pa.array(u, pa.string()),
                         "c": pa.array(c.astype(np.int64), pa.int64()),
                         "__shard": pa.array(sh)})

    def sum_shard(group: pa.Table) -> pa.Table:
        w = group.column("word").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        u, inv = np.unique(w, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, c)
        return pa.table({"word": pa.array(u, pa.string()),
                         "c": pa.array(tot, pa.int64())})

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("__shard").map_groups(sum_shard,
                                           batch_format="pyarrow"))


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out, i, n = [], 0, len(sym)
    ab = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(ds, text_col: str = "text", n_merges: int = 100,
              max_distinct_words: int = 5_000_000):
    """Learn ``n_merges`` BPE merges from the corpus. Returns an Arrow
    table (rank int64, left, right, count int64) in merge order; stops
    early when no pair occurs twice. Words are whitespace tokens, symbols
    start as single characters (no end-of-word marker — merges therefore
    never cross the final character boundary differently than the naive
    reference, which the tests pin)."""
    rows = _word_counts_ds(ds, text_col).take_all()
    if len(rows) > max_distinct_words:
        raise ValueError(
            f"train_bpe: {len(rows)} distinct words exceeds "
            f"max_distinct_words={max_distinct_words}."
        )
    vocab: dict[tuple, int] = {}
    for r in rows:
        vocab[tuple(r["word"])] = vocab.get(tuple(r["word"]), 0) + int(r["c"])

    ranks, lefts, rights, counts = [], [], [], []
    for rank in range(n_merges):
        pairs: dict[tuple, int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # deterministic tie-break: count desc, then LEXICOGRAPHIC pair asc
        best_count = max(pairs.values())
        if best_count < 2:
            break
        best_pair = min(p for p, c in pairs.items() if c == best_count)
        new_vocab: dict[tuple, int] = {}
        for sym, c in vocab.items():
            ns = _merge_word(sym, best_pair)
            new_vocab[ns] = new_vocab.get(ns, 0) + c
        vocab = new_vocab
        ranks.append(rank)
        lefts.append(best_pair[0])
        rights.append(best_pair[1])
        counts.append(best_count)
    return pa.table({"rank": pa.array(ranks, pa.int64()),
                     "left": pa.array(lefts, pa.string()),
                     "right": pa.array(rights, pa.string()),
                     "count": pa.array(counts, pa.int64())})


class BpeEncodeStage:
    """Actor-pool stage: tokenize ``text_col`` with a learned merge table;
    adds ``bpe_learned_tokens`` (int64 count) and optionally the token
    list. The merge ranks dict and a word->n_tokens memo live per actor —
    built once in ``__init__``, hit ~always under Zipf."""

    def __init__(self, merges: list[tuple[str, str]], text_col: str = "text",
                 emit_tokens: bool = False):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.emit_tokens = emit_tokens
        self._memo: dict[str, tuple] = {}

    def _encode_word(self, word: str) -> tuple:
        got = self._memo.get(word)
        if got is not None:
            return got
        sym = tuple(word)
        while len(sym) > 1:
            best_rank, best_pair = None, None
            for i in range(len(sym) - 1):
                r = self.ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (sym[i], sym[i + 1])
            if best_pair is None:
                break
            sym = _merge_word(sym, best_pair)
        self._memo[word] = sym
        return sym

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        counts = np.zeros(len(texts), np.int64)
        toks_out = []
        for i, t in enumerate(texts):
            toks: list[str] = []
            for w in (t or "").split():
                toks.extend(self._encode_word(w))
            counts[i] = len(toks)
            if self.emit_tokens:
                toks_out.append(toks)
        batch = batch.append_column("bpe_learned_tokens",
                                    pa.array(counts, pa.int64()))
        if self.emit_tokens:
            batch = batch.append_column(
                "bpe_tokens", pa.array(toks_out, pa.list_(pa.string())))
        return batch


def bpe_encode(ds, merges_table, text_col: str = "text",
               emit_tokens: bool = False, batch_size: int = 256,
               concurrency=4):
    """Apply a ``train_bpe`` merge table corpus-wide (actor pool; the merge
    dict broadcasts once per actor via the constructor args)."""
    from chinese_corpus_cleaning_ray.stages.pools import resolve_pool

    merges = list(zip(merges_table.column("left").to_pylist(),
                      merges_table.column("right").to_pylist()))
    return ds.map_batches(
        BpeEncodeStage,
        fn_constructor_kwargs=dict(merges=merges, text_col=text_col,
                                   emit_tokens=emit_tokens),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_pool(concurrency, fraction=0.4),
        num_cpus=1,
    )
