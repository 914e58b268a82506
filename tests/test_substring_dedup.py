"""Cross-document duplicated-substring scrub (Lee-et-al-style window dedup).

Covers the vectorized rolling-hash kernel, span merging, the broadcast and
fully-distributed (join) plans, byte-exact text cuts vs a naive reference,
and layout invariance. The reference repo has only INTRA-document repetition
handling (13-gram rule in functions/rules.py); this operator is part of the
added training-data surface."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa
import pytest

from chinese_corpus_cleaning_ray.stages.substring_dedup import (
    _cut,
    _merge_spans,
    _window_hashes,
    duplicated_window_spans,
    scrub_duplicated_windows,
)


def naive_scrub(texts: dict, L: int, min_docs: int = 2) -> dict:
    occ = defaultdict(set)
    for k, v in texts.items():
        for i in range(len(v) - L + 1):
            occ[v[i:i + L]].add(k)
    dup = {w for w, s in occ.items() if len(s) >= min_docs}
    out = {}
    for k, v in texts.items():
        mark = np.zeros(len(v), bool)
        for i in range(len(v) - L + 1):
            if v[i:i + L] in dup:
                mark[i:i + L] = True
        out[k] = ("".join(c for c, m in zip(v, mark) if not m),
                  int(mark.sum()))
    return out


class TestKernels:
    def test_rolling_hash_is_string_function(self):
        texts = ["abcdefghij", "XYabcdefghijZZ", "短文重复段落测试短文重复段落测试", ""]
        d, o, h = _window_hashes(texts, 5)
        assert len(h) == sum(max(len(t) - 4, 0) for t in texts)
        by_hash, by_str = defaultdict(set), defaultdict(set)
        for di, oi, hi in zip(d, o, h):
            w = texts[di][oi:oi + 5]
            by_hash[int(hi)].add(w)
            by_str[w].add(int(hi))
        assert all(len(v) == 1 for v in by_hash.values())  # no collision here
        assert all(len(v) == 1 for v in by_str.values())   # total function

    def test_window_longer_than_any_text(self):
        d, o, h = _window_hashes(["短", "ab"], 10)
        assert len(h) == 0

    def test_merge_spans_and_cut(self):
        s, e = _merge_spans(np.array([0, 2, 10]), 5)
        assert list(s) == [0, 10] and list(e) == [7, 15]
        assert _cut("0123456789ABCDEF", [(0, 3), (8, 12)]) == "34567CDEF"
        assert _cut("xyz", []) == "xyz"


@pytest.fixture
def planted():
    # docs 1/2 share a 16-char middle; 4/5 are full dups; 3 is clean
    return {
        1: "AAAA共同的前缀内容XXXX片段独有尾部甲",
        2: "BBBB共同的前缀内容XXXX片段独有尾部乙",
        3: "完全独立的一篇文档没有任何重复内容在此",
        4: "一模一样的整篇文档内容完全相同",
        5: "一模一样的整篇文档内容完全相同",
    }


class TestSpansAndScrub:
    @pytest.mark.parametrize("strategy", ["auto", "join"])
    def test_cut_matches_naive(self, ray_session, planted, strategy):
        import ray

        L = 6
        want = naive_scrub(planted, L)
        t = pa.table({"doc_id": pa.array(list(planted), pa.int64()),
                      "text": pa.array(list(planted.values()))})
        got = scrub_duplicated_windows(
            ray.data.from_arrow(t).repartition(3), "doc_id", "text",
            window=L, strategy=strategy, shards=4).to_pandas()
        for _, r in got.iterrows():
            wt, wc = want[r.doc_id]
            assert r.text == wt and r.dup_chars == wc
        # full dups collapse to empty; clean doc untouched
        assert want[4][0] == "" and want[3][0] == planted[3]

    @pytest.mark.parametrize("strategy", ["auto", "join"])
    def test_span_counts_match_naive(self, ray_session, planted, strategy):
        import ray

        L = 6
        want = naive_scrub(planted, L)
        t = pa.table({"doc_id": pa.array(list(planted), pa.int64()),
                      "text": pa.array(list(planted.values()))})
        got = (duplicated_window_spans(
            ray.data.from_arrow(t), "doc_id", "text", window=L,
            strategy=strategy, shards=4)
            .to_pandas().set_index("doc_id"))
        assert len(got) == len(planted)  # zero rows present
        for k, (_, wc) in want.items():
            assert int(got.loc[k, "dup_chars"]) == wc

    def test_min_docs_three(self, ray_session):
        import ray

        texts = {1: "xx共有的片段呀1", 2: "yy共有的片段呀2", 3: "zz不同的内容呢3"}
        t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                      "text": pa.array(list(texts.values()))})
        got = (duplicated_window_spans(ray.data.from_arrow(t), "doc_id",
                                       "text", window=5, min_docs=3)
               .to_pandas())
        assert got.dup_chars.sum() == 0  # pair-only dup, min_docs=3

    def test_layout_invariance_and_join_equals_broadcast(self, ray_session):
        import ray

        ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                   columns=["doc_id", "text"])
        a = (duplicated_window_spans(ds, "doc_id", "text", window=30)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (duplicated_window_spans(ds.repartition(7), "doc_id", "text",
                                     window=30, strategy="join", shards=8)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert a.astype("int64").equals(b.astype("int64"))

    def test_empty_input(self, ray_session):
        import ray

        t = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
        got = duplicated_window_spans(ray.data.from_arrow(t), "doc_id",
                                      "text", window=30).to_pandas()
        assert len(got) == 0


def naive_incremental(fresh: dict, seen: dict, L: int) -> dict:
    wins = set()
    for v in seen.values():
        for i in range(len(v) - L + 1):
            wins.add(v[i:i + L])
    out = {}
    for k, v in fresh.items():
        mark = np.zeros(len(v), bool)
        for i in range(len(v) - L + 1):
            if v[i:i + L] in wins:
                mark[i:i + L] = True
        out[k] = ("".join(c for c, m in zip(v, mark) if not m),
                  int(mark.sum()))
    return out


class TestIncrementalSubstringScrub:
    """Cross-run substring dedup: fresh docs scrubbed of every window
    already present in the committed corpus."""

    @pytest.mark.parametrize("strategy", ["auto", "join"])
    def test_cut_and_report_match_naive(self, ray_session, strategy):
        import ray

        from chinese_corpus_cleaning_ray.stages.substring_dedup import (
            incremental_substring_scrub,
        )

        seen_t = {10: "历史语料里的一段固定模板文字甲",
                  11: "另一段历史内容模板文字乙",
                  12: "纯粹的旧内容无关片段"}
        fresh_t = {1: "新文档开头历史语料里的一段固定模板文字甲然后是新内容",
                   2: "完全新的一篇文档没有旧的影子",
                   3: "另一段历史内容模板文字乙"}
        L = 6
        want = naive_incremental(fresh_t, seen_t, L)
        ft = pa.table({"doc_id": pa.array(list(fresh_t), pa.int64()),
                       "text": pa.array(list(fresh_t.values()))})
        st = pa.table({"doc_id": pa.array(list(seen_t), pa.int64()),
                       "text": pa.array(list(seen_t.values()))})
        got = incremental_substring_scrub(
            ray.data.from_arrow(ft).repartition(2),
            ray.data.from_arrow(st).repartition(2),
            window=L, strategy=strategy, shards=4).to_pandas()
        assert {r.doc_id: (r.text, r.dup_chars)
                for r in got.itertuples()} == want
        rep = incremental_substring_scrub(
            ray.data.from_arrow(ft), ray.data.from_arrow(st), window=L,
            strategy=strategy, shards=4, report_only=True).to_pandas()
        assert dict(zip(rep.doc_id, rep.dup_chars)) == {
            k: v[1] for k, v in want.items()}

    def test_empty_seen_is_identity(self, ray_session):
        import ray

        from chinese_corpus_cleaning_ray.stages.substring_dedup import (
            incremental_substring_scrub,
        )

        ft = pa.table({"doc_id": pa.array([1], pa.int64()),
                       "text": pa.array(["六字以上的新文本啊"])})
        st = pa.table({"doc_id": pa.array([], pa.int64()),
                       "text": pa.array([], pa.string())})
        got = incremental_substring_scrub(
            ray.data.from_arrow(ft), ray.data.from_arrow(st),
            window=6).to_pandas()
        assert list(got.text) == ["六字以上的新文本啊"]
        assert list(got.dup_chars) == [0]

    def test_fresh_repeats_do_not_self_trigger(self, ray_session):
        """Windows repeated WITHIN fresh but absent from seen must survive —
        the op is membership-vs-seen, not fresh-internal dedup."""
        import ray

        from chinese_corpus_cleaning_ray.stages.substring_dedup import (
            incremental_substring_scrub,
        )

        ft = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                       "text": pa.array(["新的重复片段呀新的重复片段呀",
                                         "新的重复片段呀完全另一回事"])})
        st = pa.table({"doc_id": pa.array([9], pa.int64()),
                       "text": pa.array(["旧语料完全无关的正文内容"])})
        got = incremental_substring_scrub(
            ray.data.from_arrow(ft), ray.data.from_arrow(st),
            window=6).to_pandas()
        assert got.dup_chars.sum() == 0


class TestHostileInputs:
    def test_astral_control_and_huge_texts(self):
        """Astral-plane emoji (surrogate pairs in UTF-16, single codepoints
        here), control bytes, and a 100k-char doc: the hash stays a total
        function of the window STRING and window counts match len()-L+1
        (Python and pyarrow both count codepoints)."""
        texts = ["😀😀a😀😀", "x😀😀a😀😀y",
                 "\x00\x01\x02abc\x00\x01\x02abc", "中" * 100_000]
        d, o, h = _window_hashes(texts, 3)
        assert len(h) == sum(max(len(t) - 2, 0) for t in texts)
        by_str = {}
        for di, oi, hi in zip(d, o, h):
            w = texts[di][oi:oi + 3]
            assert by_str.setdefault(w, int(hi)) == int(hi)

    def test_scrub_survives_hostile_rows(self, ray_session):
        import ray

        texts = {1: "", 2: " ", 3: "😀" * 40, 4: "😀" * 40,
                 5: "\x00" * 35, 6: "正常的一段完整中文内容测试语句在此处结束"}
        t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                      "text": pa.array(list(texts.values()))})
        want = naive_scrub(texts, 30)
        got = scrub_duplicated_windows(ray.data.from_arrow(t), "doc_id",
                                       "text", window=30).to_pandas()
        for r in got.itertuples():
            assert (r.text, r.dup_chars) == want[r.doc_id]
        # the emoji twins collapse; the lone control-char doc survives
        assert want[3][1] == 40 and want[5][1] == 0
