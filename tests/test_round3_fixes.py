"""Round-3 hardening: unified anti-filter ending across all dedups,
low-entropy simhash collapse, input-sized shard counts, cached LSH planes.
"""

import time

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(n_clusters: int = 3, singles: int = 4):
    base = [
        "机器学习模型的训练过程需要大量高质量的数据支持数据清洗与预处理环节直接影响最终模型的效果",
        "分布式计算框架通过将任务拆分到多个节点并行执行大幅提升了海量数据的处理效率容错机制保证稳定",
        "自然语言处理技术在近年来取得了长足的进步预训练语言模型在多项任务上超越传统方法成为主流范式",
    ][:n_clusters]
    rows = []
    rid = 0
    for b in base:
        for variant in [b, b + "补充", "按语" + b]:
            rows.append({"doc_id": rid, "text": variant})
            rid += 1
    sing = [
        "清晨的阳光洒在湖面上微风吹过泛起层层涟漪远处的山峦在薄雾里",
        "图书馆新增了一批科技类藏书涵盖人工智能材料科学与生物工程领域",
        "志愿者们利用周末时间清理河岸垃圾并向居民宣传环境保护知识要点",
        "气象部门发布下周天气预报提醒市民注意防范强对流天气带来的影响",
    ][:singles]
    for s in sing:
        rows.append({"doc_id": rid, "text": s})
        rid += 1
    return rows


def test_simhash_join_equals_broadcast(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.dedup_stage import simhash_dedup

    base = "机器学习模型的训练过程需要大量高质量的数据支持数据清洗与预处理环节直接影响最终效果"
    rows = [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + "。"},
            {"doc_id": 3, "text": "完全不同的另一段文字内容与上面毫无相似之处是独立的句子"},
            {"doc_id": 4, "text": "清晨的阳光洒在湖面上微风吹过泛起层层涟漪远处山峦"}]
    ds = rd.from_items(rows).repartition(3)
    bc, _ = simhash_dedup(ds, id_col="doc_id", strategy="broadcast")
    jn, _ = simhash_dedup(ds, id_col="doc_id", strategy="join")
    a = sorted(bc.to_pandas()["doc_id"])
    b = sorted(jn.to_pandas()["doc_id"])
    assert a == b and 0 < len(a) < len(rows)


def test_join_strategy_empty_dup_set(ray_session):
    """Forced join with NO duplicates must not crash: an all-empty map_groups
    output would feed the Count aggregate a schema-less block and break the
    join's key resolution, so anti_filter early-returns on a zero count."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.dedup_stage import simhash_dedup

    rows = [{"doc_id": 0, "text": "完全不同的第一段文字内容与任何其他段落毫无相似之处"},
            {"doc_id": 1, "text": "清晨的阳光洒在湖面上微风吹过泛起层层涟漪远处山峦"}]
    jn, _ = simhash_dedup(rd.from_items(rows).repartition(2), id_col="doc_id",
                          strategy="join")
    assert sorted(jn.to_pandas()["doc_id"]) == [0, 1]


def test_jaccard_join_equals_broadcast(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.dedup_stage import ngram_jaccard_dedup

    rows = _docs_table()
    ds = rd.from_items(rows).repartition(3)
    bc, _ = ngram_jaccard_dedup(ds, id_col="doc_id", threshold=0.5,
                                strategy="broadcast")
    jn, _ = ngram_jaccard_dedup(ds, id_col="doc_id", threshold=0.5,
                                strategy="join")
    a = sorted(bc.to_pandas()["doc_id"])
    b = sorted(jn.to_pandas()["doc_id"])
    assert a == b and 0 < len(a) < len(rows)


def test_embedding_join_equals_broadcast(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.similarity import embedding_dedup

    rng = np.random.RandomState(7)
    base = rng.standard_normal((20, 16))
    rows = []
    vid = 0
    for v in base:
        for _ in range(3):  # 3 near-identical copies of each base vector
            rows.append({"vec_id": vid,
                         "embedding": list(v + rng.standard_normal(16) * 1e-4)})
            vid += 1
    ds = rd.from_items(rows).repartition(3)
    bc, _ = embedding_dedup(ds, threshold=0.95, strategy="broadcast")
    jn, _ = embedding_dedup(ds, threshold=0.95, strategy="join")
    a = sorted(bc.to_pandas()["vec_id"])
    b = sorted(jn.to_pandas()["vec_id"])
    assert a == b == sorted(range(0, vid, 3))


def test_simhash_low_entropy_corpus_fast(ray_session):
    """100k copies of one template plus near-misses: the exact-value collapse
    keeps the per-bucket pairwise scan at O(distinct²), so the job finishes in
    seconds instead of 10^10 popcounts — with the same dup set (everything but
    the min-id copy and any row outside the Hamming radius)."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.dedup_stage import simhash_dedup

    template = "尊敬的用户您好您的订单已经发货请注意查收物流信息如有疑问请联系客服感谢您的支持"
    distinct_extras = [
        "清晨的阳光洒在湖面上微风吹过泛起层层涟漪远处的山峦在薄雾里",
        "图书馆新增了一批科技类藏书涵盖人工智能材料科学与生物工程领域",
    ]
    n_copies = 100_000
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_copies + len(distinct_extras)), pa.int64()),
            "text": pa.array([template] * n_copies + distinct_extras),
        }
    )
    t0 = time.monotonic()
    deduped, _ = simhash_dedup(rd.from_arrow(tbl).repartition(8), id_col="doc_id")
    kept = sorted(deduped.to_pandas()["doc_id"])
    elapsed = time.monotonic() - t0
    assert kept == [0, n_copies, n_copies + 1]
    assert elapsed < 60, f"low-entropy simhash dedup took {elapsed:.1f}s"


def test_pow2_shards_scales_with_input():
    from chinese_corpus_cleaning_ray.stages.dedup_stage import _pow2_shards

    assert _pow2_shards(500, 4096) == 64          # clamped at the floor
    assert _pow2_shards(1_000_000, 4096) == 256
    assert _pow2_shards(100_000_000, 4096) == 32768
    assert _pow2_shards(10**12, 4096) == 65536    # clamped at the ceiling
    # always a power of two
    for n in (1, 999, 12345, 10**7):
        s = _pow2_shards(n, 4096)
        assert s & (s - 1) == 0


def test_lsh_planes_cached_per_process():
    from chinese_corpus_cleaning_ray.stages.similarity import lsh_planes

    a = lsh_planes(16, 6, seed=42)
    b = lsh_planes(16, 6, seed=42)
    assert a is b  # memoized, not regenerated per call
    c = lsh_planes(16, 6, seed=43)
    assert c is not a and not np.allclose(a, c)


def test_dbscan_clusters_planted(ray_session):
    """LSH-blocked DBSCAN matches the reference's semantics on planted data:
    groups of ≥ min_samples near-identical vectors form clusters labeled by
    their min member id; pairs below min_samples and singletons are noise."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.similarity import dbscan_clusters

    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    expected: dict[int, object] = {}
    # two real clusters (4 and 3 members), one undersized pair, 5 singletons
    for size in (4, 3, 2):
        base = rng.standard_normal(16)
        first = vid
        for _ in range(size):
            rows.append({"vec_id": vid,
                         "embedding": list(base + rng.standard_normal(16) * 1e-4)})
            expected[vid] = first if size >= 3 else None
            vid += 1
    for _ in range(5):
        rows.append({"vec_id": vid, "embedding": list(rng.standard_normal(16))})
        expected[vid] = None
        vid += 1

    out = dbscan_clusters(rd.from_items(rows).repartition(3), threshold=0.95,
                          min_samples=3).to_pandas()
    assert len(out) == vid  # one row per input row
    got = {int(r.vec_id): (None if pd_isna(r.cluster) else int(r.cluster))
           for r in out.itertuples()}
    assert got == expected
    # all members of a ≥3 cluster are core here (near-cliques)
    core_ids = set(out.loc[out["is_core"], "vec_id"])
    assert core_ids == {v for v, c in expected.items() if c is not None}


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_dbscan_cli(ray_session, tmp_path):
    """`python -m chinese_corpus_cleaning_ray dbscan` writes the cluster
    parquet (the scale-safe analogue of the reference's pickle save)."""
    import json

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from chinese_corpus_cleaning_ray.__main__ import main

    rng = np.random.RandomState(5)
    base = rng.standard_normal(16)
    vecs = [list(base + rng.standard_normal(16) * 1e-4) for _ in range(4)]
    vecs += [list(rng.standard_normal(16)) for _ in range(6)]
    src = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({"vec_id": pa.array(range(10), pa.int64()),
                             "embedding": pa.array(vecs)}), src)
    out = str(tmp_path / "clusters")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["dbscan", "--input", src, "--output", out,
                   "--threshold", "0.95", "--min-samples", "3"])
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["rows"] == 10 and stats["clustered"] == 4 and stats["noise"] == 6
    t = pads.dataset(out).to_table()
    assert t.num_rows == 10 and set(t.column_names) >= {"vec_id", "cluster", "is_core"}


def test_dbscan_undersized_input_all_noise(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.similarity import dbscan_clusters

    rng = np.random.RandomState(2)
    v = rng.standard_normal(16)
    rows = [{"vec_id": i, "embedding": list(v)} for i in range(2)]  # < min_samples
    out = dbscan_clusters(rd.from_items(rows), min_samples=3).to_pandas()
    assert len(out) == 2 and out["cluster"].isna().all() and not out["is_core"].any()


def test_hf_perplexity_scorer_gated():
    """HFPerplexityScorer mirrors HFEmbedder: real path when torch+transformers
    exist, clean NotImplementedError otherwise (this sandbox has neither)."""
    from chinese_corpus_cleaning_ray.functions.ngram_lm import HFPerplexityScorer

    try:
        import transformers  # noqa: F401
        import torch  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="torch"):
            HFPerplexityScorer()
        return
    pytest.skip("torch available: construction would download a model")


def test_ppl_stage_accepts_scorer_factory():
    """PplStage(scorer_factory=...) routes every row through the injected
    scorer — the hook the GPT-2 path plugs into."""
    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
    from chinese_corpus_cleaning_ray.stages.quality_stages import PplStage

    class StubScorer:
        def check_perplexity(self, text):
            return len(text) > 2, {"perplexity": float(len(text))}

        def get_perplexity_score(self, text):
            return 0.25

    stage = PplStage(DEFAULT_CONFIG, scorer_factory=StubScorer)
    batch = pa.table({"text": ["ab", "abcd", "一二三四五"]})
    out = stage(batch)
    assert out.column("ppl").to_pylist() == [2.0, 4.0, 5.0]
    assert out.column("ppl_pass").to_pylist() == [False, True, True]
    assert out.column("ppl_score").to_pylist() == [0.25, 0.25, 0.25]


def test_hf_scorer_formulas_shared_with_ngram():
    """The A6 check/score formulas live in ONE place: a scorer that only
    overrides _lm_ppl gets identical downstream check/score behavior."""
    from chinese_corpus_cleaning_ray.config import PerplexityConfig
    from chinese_corpus_cleaning_ray.functions.ngram_lm import (
        NgramModel,
        PerplexityScorer,
    )

    cfg = PerplexityConfig()
    model = NgramModel(n=2).train(["清晨的阳光洒在湖面上", "微风吹过泛起层层涟漪"])
    base = PerplexityScorer(model, cfg)

    class FixedPpl(PerplexityScorer):
        def _lm_ppl(self, text):
            return 42.0

    fixed = FixedPpl(model, cfg)
    text = "清晨的阳光洒在湖面上微风吹过"
    assert fixed.calculate_perplexity(text) == 42.0
    # base still uses the n-gram model through the same hook
    assert base.calculate_perplexity(text) == min(model.perplexity(text), cfg.max_ppl)
    ok, details = fixed.check_perplexity(text)
    assert ok and details["perplexity"] == 42.0


def test_sample_by_hash_deterministic(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.analysis import sample_by_hash

    rows = [{"doc_id": i, "text": f"t{i}"} for i in range(1000)]
    ds = rd.from_items(rows).repartition(4)
    a = sorted(sample_by_hash(ds, "doc_id", pct=10).to_pandas()["doc_id"])
    b = sorted(sample_by_hash(ds, "doc_id", pct=10).to_pandas()["doc_id"])
    assert a == b and 50 < len(a) < 200  # deterministic, ~10%
    # the LCG matches plain-python integer arithmetic (the SQL oracle's math)
    expect = [i for i in range(1000)
              if ((i % 2147483648) * 1103515245 + 12345) % 2147483648 % 100 < 10]
    assert a == expect
    # pct=100 keeps everything, pct=0 keeps nothing
    assert sample_by_hash(ds, "doc_id", pct=100).count() == 1000
    assert sample_by_hash(ds, "doc_id", pct=0).count() == 0


def test_top_ngrams_document_frequency(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.analysis import top_ngrams

    common = "这是一段公共模板文字"
    rows = [{"doc_id": i, "text": common + f"第{i}篇独立内容各不相同" * 2}
            for i in range(10)]
    rows.append({"doc_id": 99, "text": "完全无关的另一段文本内容"})
    out = top_ngrams(rd.from_items(rows).repartition(3), top=5)
    assert list(out.columns) == ["g", "df"]
    assert out["df"].dtype == "int64"
    # every gram of the shared template appears in all 10 template docs
    assert out.iloc[0]["df"] == 10
    # document frequency counts a doc once even when the gram repeats in it
    repeated = top_ngrams(
        rd.from_items([{"doc_id": 0, "text": "重复重复重复重复重复重复"}]), top=3)
    assert (repeated["df"] == 1).all()


def test_contamination_check(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.analysis import contamination_check

    probe = ["这是测试集里的一段未公开文本内容请勿训练"]
    rows = [
        {"doc_id": 0, "text": "这是测试集里的一段未公开文本内容请勿训练加上少量噪音"},  # contaminated
        {"doc_id": 1, "text": "完全独立的一段训练语料与测试集毫无重叠之处"},          # clean
        {"doc_id": 2, "text": "部分重叠：未公开文本内容出现在这里但很短"},            # few grams
    ]
    out = contamination_check(rd.from_items(rows).repartition(2), probe,
                              min_overlap=10).to_pandas()
    assert list(out["doc_id"]) == [0]
    assert out["overlap"].iloc[0] >= 15
    # lower threshold also catches the partial overlap
    out2 = contamination_check(rd.from_items(rows), probe, min_overlap=2).to_pandas()
    assert sorted(out2["doc_id"]) == [0, 2]


def test_length_histogram(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.analysis import length_histogram

    rows = [{"doc_id": i, "text": "x" * n}
            for i, n in enumerate([5, 50, 120, 150, 260])]
    out = length_histogram(rd.from_items(rows).repartition(2), bucket=100)\
        .to_pandas().sort_values("bucket_lo").reset_index(drop=True)
    assert list(out["bucket_lo"]) == [0, 100, 200]
    assert list(out["n_docs"]) == [2, 2, 1]


@pytest.mark.parametrize("seed", [101, 202])
def test_anti_filter_strategies_agree_random(ray_session, seed):
    """Randomized corpora (planted dup families + noise): broadcast and join
    endings must produce identical keep-sets for every dedup that shares
    anti_filter — catches shard/partition edge cases fixed data can miss."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.dedup_stage import (
        minhash_dedup,
        ngram_jaccard_dedup,
    )

    rng = np.random.RandomState(seed)
    vocab = list("的一是了我不人在他有这上们来到时大地为子中你说生国年着就")
    rows = []
    rid = 0
    for _ in range(12):  # dup families: one base + 1-3 light variants
        base = "".join(rng.choice(vocab, 60))
        for v in range(rng.randint(2, 5)):
            prefix = "".join(rng.choice(vocab, v))  # tiny edit
            rows.append({"doc_id": rid, "text": prefix + base})
            rid += 1
    for _ in range(30):  # noise singletons
        rows.append({"doc_id": rid, "text": "".join(rng.choice(vocab, 60))})
        rid += 1
    ds = rd.from_items(rows).repartition(5)

    for fn, kw in ((minhash_dedup, {}), (ngram_jaccard_dedup, {"threshold": 0.6})):
        bc, _ = fn(ds, id_col="doc_id", strategy="broadcast", **kw)
        jn, _ = fn(ds, id_col="doc_id", strategy="join", **kw)
        a = sorted(bc.to_pandas()["doc_id"])
        b = sorted(jn.to_pandas()["doc_id"])
        assert a == b, f"{fn.__name__} seed={seed}: strategies disagree"
        assert 0 < len(a) < len(rows)


def test_anti_filter_join_with_string_ids(ray_session):
    """The manual anti-join must handle STRING ids (transcript row keys):
    pandas-hash sharding and the null-padded union both see object dtype."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.dedup_stage import minhash_dedup

    base = "机器学习模型的训练过程需要大量高质量的数据支持数据清洗与预处理环节直接影响最终效果"
    rows = []
    for i in range(6):
        text = base if i < 3 else f"独立文本第{i}号内容互不相同且与模板无关" * 2
        rows.append({"row_key": f"conv{i:03d}#0000000001", "text": text})
    ds = rd.from_items(rows).repartition(3)
    bc, _ = minhash_dedup(ds, id_col="row_key", strategy="broadcast")
    jn, _ = minhash_dedup(ds, id_col="row_key", strategy="join")
    a = sorted(bc.to_pandas()["row_key"])
    b = sorted(jn.to_pandas()["row_key"])
    assert a == b
    assert "conv000#0000000001" in a and "conv001#0000000001" not in a


def test_winnow_fingerprints(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.analysis import winnow_fingerprints

    base = "这是一段很长的基准文本用于窗口指纹测试" * 8  # > 2 windows
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base + "末尾追加一点"},  # shares the min window
        {"doc_id": 2, "text": "完全不同的另一篇文档内容" * 8},
        {"doc_id": 3, "text": "短文"},  # shorter than one window
    ]
    out = winnow_fingerprints(rd.from_items(rows).repartition(2)).to_pandas()
    fp = dict(zip(out["doc_id"], out["fp"]))
    assert fp[0] == fp[1] != fp[2]
    import hashlib

    assert fp[3] == hashlib.md5("短文".encode()).hexdigest()


def test_text_dir_roundtrip(ray_session, tmp_path):
    """The reference's native txt-directory input/output mode: read a dir of
    .txt docs, run a pipeline stage, write one file per doc back."""
    from chinese_corpus_cleaning_ray.sources.textdir import read_text_dir, write_text_dir
    from chinese_corpus_cleaning_ray.stages.analysis import add_token_stats

    src = tmp_path / "txt"
    src.mkdir()
    docs = {f"doc{i:02d}": f"这是第{i}篇测试文档的正文内容。" * (i + 1) for i in range(5)}
    for name, text in docs.items():
        (src / f"{name}.txt").write_text(text, encoding="utf-8")

    ds = read_text_dir(str(src))
    df = ds.to_pandas().sort_values("doc_id")
    assert list(df["doc_id"]) == sorted(docs)
    assert dict(zip(df["doc_id"], df["text"])) == docs

    out = tmp_path / "out"
    stats = write_text_dir(add_token_stats(ds), str(out)).sum("files_written")
    assert stats == 5
    for name, text in docs.items():
        assert (out / f"{name}.txt").read_text(encoding="utf-8") == text


def test_filtertxt_cli(ray_session, tmp_path):
    """EP1's native UX: txt dir in → kept scrubbed txt + decisions + stats."""
    import contextlib
    import io
    import json
    import os

    import pyarrow.dataset as pads

    from chinese_corpus_cleaning_ray.__main__ import main

    src = tmp_path / "txt"
    src.mkdir()
    good = "这是一篇质量很高的中文文档，内容完整，语句通顺，长度适中，适合保留下来继续处理。" * 3
    for i in range(4):
        (src / f"good{i}.txt").write_text(good + f"编号{i}", encoding="utf-8")
    (src / "bad.txt").write_text("", encoding="utf-8")  # empty → rule_error → dropped

    out = str(tmp_path / "out")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["filtertxt", "--input", str(src), "--output", out])
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["total"] == 5 and stats["kept"] == 4
    kept_files = sorted(os.listdir(os.path.join(out, "txt")))
    assert kept_files == [f"good{i}.txt" for i in range(4)]
    dec = pads.dataset(os.path.join(out, "decisions")).to_table()
    assert dec.num_rows == 5 and "quality_score" in dec.column_names

    # --vectorize also writes embeddings for the kept docs
    out2 = str(tmp_path / "out2")
    with contextlib.redirect_stdout(io.StringIO()):
        assert main(["filtertxt", "--input", str(src), "--output", out2,
                     "--vectorize"]) == 0
    emb = pads.dataset(os.path.join(out2, "embeddings")).to_table()
    assert emb.num_rows == 4 and "embedding" in emb.column_names
    assert len(emb.column("embedding")[0].as_py()) == 64  # fake embedder dim


def test_stratified_sample_quota(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.analysis import stratified_sample

    rows = [{"doc_id": i, "source": f"s{i % 4}"} for i in range(100)]
    out = stratified_sample(rd.from_items(rows).repartition(4),
                            key_col="source", id_col="doc_id", per_key=3).to_pandas()
    assert len(out) == 12
    assert (out.groupby("source").size() == 3).all()
    # deterministic across reruns
    out2 = stratified_sample(rd.from_items(rows).repartition(7),
                             key_col="source", id_col="doc_id", per_key=3).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # a key with fewer rows than the quota keeps them all
    small = [{"doc_id": i, "source": "only"} for i in range(2)]
    out3 = stratified_sample(rd.from_items(small), key_col="source",
                             id_col="doc_id", per_key=5).to_pandas()
    assert sorted(out3["doc_id"]) == [0, 1]


def test_dedup_against_corpus(ray_session):
    """Incremental ingestion: new batch loses rows already in the committed
    corpus AND its own internal exact dups (keep-first by id)."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.dedup_stage import dedup_against_corpus

    seen = rd.from_items([{"doc_id": i, "text": f"已提交文档{i}的内容" } for i in range(5)])
    new = rd.from_items([
        {"doc_id": 10, "text": "已提交文档2的内容"},   # already in corpus → dropped
        {"doc_id": 11, "text": "全新的第一篇文档内容"},
        {"doc_id": 12, "text": "全新的第一篇文档内容"},  # internal dup → dropped
        {"doc_id": 13, "text": "全新的第二篇文档内容"},
    ]).repartition(2)
    out, _ = dedup_against_corpus(new, seen, id_col="doc_id")
    kept = sorted(out.to_pandas()["doc_id"])
    assert kept == [11, 13]
    # forced join strategy agrees
    out2, _ = dedup_against_corpus(new, seen, id_col="doc_id", strategy="join")
    assert sorted(out2.to_pandas()["doc_id"]) == [11, 13]


def test_conversation_keep(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.pipelines.conversations import conversation_keep

    rows = []
    # conv A: 3/4 pass → keep at 0.5; conv B: 1/4 pass → drop
    for conv, passes in (("a", [1, 1, 1, 0]), ("b", [1, 0, 0, 0])):
        for i, p in enumerate(passes):
            rows.append({"conv_id": conv, "turn_idx": i, "rule_pass": bool(p)})
    out = conversation_keep(rd.from_items(rows).repartition(3)).to_pandas()
    keep = dict(zip(out["conv_id"], out["conv_keep"]))
    assert keep == {"a": True, "b": False}
    assert dict(zip(out["conv_id"], out["n_pass"])) == {"a": 3, "b": 1}
    # exact boundary: 2/4 at ratio 0.5 keeps (>=)
    rows2 = [{"conv_id": "c", "turn_idx": i, "rule_pass": i < 2} for i in range(4)]
    out2 = conversation_keep(rd.from_items(rows2)).to_pandas()
    assert out2["conv_keep"].iloc[0]


def test_crawl_job_resumable(ray_session, tmp_path):
    """Per-WARC-shard resume: rerun is a no-op; a deleted marker reprocesses
    exactly that shard; output stays readable and identical."""
    import os

    import pyarrow.dataset as pads

    from chinese_corpus_cleaning_ray.pipelines.crawl import run_crawl_job
    from chinese_corpus_cleaning_ray.sources.warc import build_warc_record

    zh = "<html><body>" + "高质量的中文网页正文内容，讨论分布式数据处理。" * 3 + "</body></html>"
    for i in range(3):
        rec = build_warc_record(f"http://p{i}.example/", zh.encode(), f"<u:{i}>")
        (tmp_path / f"shard{i}.warc").write_bytes(rec)

    out = str(tmp_path / "pages")
    s1 = run_crawl_job(str(tmp_path), out)
    assert s1["pages_kept"] == 3 and s1["files_this_run"] == 3
    before = pads.dataset(out).to_table().sort_by("target_uri")

    s2 = run_crawl_job(str(tmp_path), out)  # no-op resume
    assert s2["files_this_run"] == 0 and s2["pages_kept"] == 3
    assert before.equals(pads.dataset(out).to_table().sort_by("target_uri"))

    # invalidate one shard → exactly one reprocess, output identical
    markers = sorted(os.listdir(os.path.join(out, "_done")))
    os.remove(os.path.join(out, "_done", markers[0]))
    s3 = run_crawl_job(str(tmp_path), out)
    assert s3["files_this_run"] == 1 and s3["pages_kept"] == 3
    assert before.equals(pads.dataset(out).to_table().sort_by("target_uri"))


def test_worker_cache_capped():
    from chinese_corpus_cleaning_ray.stages.similarity import _cache_put

    cache: dict = {}
    for i in range(10):
        _cache_put(cache, i, i, cap=4)
    assert len(cache) == 4 and set(cache) == {6, 7, 8, 9}
