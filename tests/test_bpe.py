"""BPE tokenizer training/encoding: the distributed word-count -> driver
merge loop must equal a naive single-process BPE trainer exactly, stay
layout-invariant (exact integer counts), and the actor-pool encoder must
respect merge ranks."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest

from chinese_corpus_cleaning_ray.functions.bpe import (
    BpeEncodeStage,
    bpe_encode,
    train_bpe,
)


def naive_bpe(texts, n):
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(n):
        pairs = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        bc = max(pairs.values())
        if bc < 2:
            break
        bp = min(p for p, c in pairs.items() if c == bc)
        merges.append((bp, bc))
        nv = Counter()
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == bp:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] += c
        vocab = nv
    return merges


TEXTS = ["the quick brown fox the the", "quick quick brown thequick",
         "lower lowest low low lower", "the lowest fox", "中文 分词 中文 训练",
         "", "   "] * 5


class TestTrainBpe:
    def test_matches_naive_and_layouts(self, ray_session):
        import ray

        want = naive_bpe(TEXTS, 15)
        t = pa.table({"text": pa.array(TEXTS)})
        got = train_bpe(ray.data.from_arrow(t).repartition(3), n_merges=15)
        gm = list(zip(zip(got.column("left").to_pylist(),
                          got.column("right").to_pylist()),
                      got.column("count").to_pylist()))
        assert gm == want
        again = train_bpe(ray.data.from_arrow(t).repartition(7), n_merges=15)
        assert again.equals(got)

    def test_early_stop_and_guard(self, ray_session):
        import ray

        # every word unique single char -> no pair ever occurs twice
        t = pa.table({"text": pa.array(["a b c", "d e f"])})
        got = train_bpe(ray.data.from_arrow(t), n_merges=10)
        assert got.num_rows == 0
        with pytest.raises(ValueError):
            train_bpe(ray.data.from_arrow(
                pa.table({"text": pa.array(["x y z w v u"])})),
                n_merges=2, max_distinct_words=3)


class TestBpeEncode:
    def test_rank_order_and_memo(self, ray_session):
        import ray

        t = pa.table({"text": pa.array(TEXTS)})
        merges = train_bpe(ray.data.from_arrow(t), n_merges=15)
        enc = bpe_encode(ray.data.from_arrow(t), merges, emit_tokens=True,
                         concurrency=1).to_pandas()
        # re-encoding a trained word yields the trained segmentation:
        # 'the' merged fully (frequent), so it is a single token
        toks0 = list(enc.bpe_tokens.iloc[0])
        assert "the" in toks0
        # token counts = sum of per-word segment counts, never zero for
        # non-empty text, zero for whitespace-only rows
        assert int(enc.loc[enc.text == "   ", "bpe_learned_tokens"].iloc[0]) == 0
        assert (enc.loc[enc.text.str.strip() != "", "bpe_learned_tokens"] > 0).all()

    def test_stage_respects_rank_not_greed(self):
        # merges: rank0 = (a,b); rank1 = (b,c). In 'abc' rank0 wins first
        # -> tokens [ab, c], NOT [a, bc].
        st = BpeEncodeStage(merges=[("a", "b"), ("b", "c")])
        out = st(pa.table({"text": pa.array(["abc"])}))
        assert st._encode_word("abc") == ("ab", "c")
        assert out.column("bpe_learned_tokens").to_pylist() == [2]
