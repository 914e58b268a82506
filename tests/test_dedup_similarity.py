"""Distributed dedup + similarity-search stages."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def doc_ds(ray_session):
    import ray.data as rd

    base = [
        "机器学习模型的训练过程需要大量高质量的数据支持数据清洗与预处理环节直接影响最终模型的效果",
        "分布式计算框架通过将任务拆分到多个节点并行执行大幅提升了海量数据的处理效率容错机制保证稳定",
        "自然语言处理技术在近年来取得了长足的进步预训练语言模型在多项任务上超越传统方法成为主流范式",
    ]
    rows = []
    rid = 0
    for b_i, b in enumerate(base):
        # cluster: base + tiny edits (near-dups)
        for variant in [b, b + "补充", "按语" + b]:
            rows.append({"doc_id": rid, "text": variant, "cluster": b_i})
            rid += 1
    # exact dups
    for _ in range(3):
        rows.append({"doc_id": rid, "text": "完全相同的文本会被去重只保留第一条", "cluster": 90})
        rid += 1
    # unique singletons — distinct sentences, not near anything
    singles = [
        "清晨的阳光洒在湖面上微风吹过泛起层层涟漪远处的山峦在薄雾里",
        "图书馆新增了一批科技类藏书涵盖人工智能材料科学与生物工程领域",
        "志愿者们利用周末时间清理河岸垃圾并向居民宣传环境保护知识要点",
        "气象部门发布下周天气预报提醒市民注意防范强对流天气带来的影响",
    ]
    for s in singles:
        rows.append({"doc_id": rid, "text": s, "cluster": -1})
        rid += 1
    return rd.from_items(rows).repartition(4), rows


def test_exact_dedup(doc_ds):
    from chinese_corpus_cleaning_ray.stages.dedup_stage import exact_dedup

    ds, rows = doc_ds
    out = exact_dedup(ds, id_col="doc_id").to_pandas().sort_values("doc_id")
    texts = list(out["text"])
    assert len(texts) == len(set(texts)), "exact duplicates survived"
    # keep-first: among the 3 identical rows, the min doc_id stays
    same = [r["doc_id"] for r in rows if r["cluster"] == 90]
    kept_ids = set(out["doc_id"])
    assert min(same) in kept_ids and not (set(same[1:]) & kept_ids)


def test_minhash_dedup_broadcast(doc_ds):
    from chinese_corpus_cleaning_ray.stages.dedup_stage import minhash_dedup

    ds, rows = doc_ds
    deduped, dup_ids = minhash_dedup(ds, id_col="doc_id", shingle_k=5,
                                     num_perm=64, num_bands=16)
    out = deduped.to_pandas().sort_values("doc_id")
    # each planted near-dup cluster collapses to its min doc_id
    for c in (0, 1, 2, 90):
        members = [r["doc_id"] for r in rows if r["cluster"] == c]
        kept = [d for d in out["doc_id"] if d in members]
        assert kept == [min(members)], f"cluster {c}: kept {kept}"
    # singletons survive (no false merges)
    singles = [r["doc_id"] for r in rows if r["cluster"] == -1]
    assert set(singles) <= set(out["doc_id"])


def test_minhash_dedup_join_strategy(doc_ds):
    from chinese_corpus_cleaning_ray.stages.dedup_stage import minhash_dedup

    ds, rows = doc_ds
    bc, _ = minhash_dedup(ds, id_col="doc_id", strategy="broadcast")
    jn, _ = minhash_dedup(ds, id_col="doc_id", strategy="join")
    a = sorted(bc.to_pandas()["doc_id"])
    b = sorted(jn.to_pandas()["doc_id"])
    assert a == b, "join and broadcast strategies disagree"


def test_jaccard_kernel():
    from chinese_corpus_cleaning_ray.stages.dedup_stage import ngram_jaccard_pairs

    a = "机器学习模型的训练过程需要大量高质量的数据支持"
    sims = ngram_jaccard_pairs([a, a], [a, "完全无关的另一段文字内容不同含义也不同"], k=5)
    assert sims[0] == 1.0 and sims[1] < 0.1


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    # make vec 7 & 8 near-identical to vec 0's direction for a known answer
    vecs[7] = vecs[0] * 2.0 + rng.standard_normal(16) * 1e-3
    vecs[8] = vecs[0] * 0.5 + rng.standard_normal(16) * 1e-3
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]
    return rd.from_items(rows).repartition(4), vecs


def _brute_topk_numpy(vecs, q, k):
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = vn @ qn
    order = np.lexsort((np.arange(len(sims)), -sims))
    return list(order[:k])


def test_knn_brute_matches_numpy(emb_ds):
    from chinese_corpus_cleaning_ray.stages.similarity import knn_brute

    ds, vecs = emb_ds
    q = vecs[0].astype(np.float64)
    out = knn_brute(ds, np.array([q]), k=5).to_pandas()
    got = list(out.sort_values("cos", ascending=False)["vec_id"])
    want = _brute_topk_numpy(vecs.astype(np.float64), q, 5)
    assert got == want
    assert got[0] == 0 and {7, 8} <= set(got)


def test_knn_brute_multi_query(emb_ds):
    from chinese_corpus_cleaning_ray.stages.similarity import knn_brute

    ds, vecs = emb_ds
    qs = vecs[[0, 5, 11]].astype(np.float64)
    out = knn_brute(ds, qs, k=3).to_pandas()
    assert sorted(out["query_id"].unique()) == [0, 1, 2]
    for qi in range(3):
        sub = out[out["query_id"] == qi]
        assert len(sub) == 3
        assert sub.iloc[0]["vec_id"] == [0, 5, 11][qi]  # self is nearest


def test_knn_ivf_recalls_planted_neighbors(emb_ds):
    from chinese_corpus_cleaning_ray.stages.similarity import knn_ivf

    ds, vecs = emb_ds
    q = vecs[0].astype(np.float64)
    out = knn_ivf(ds, np.array([q]), k=5, nbits=4, expand=1).to_pandas()
    got = set(out["vec_id"])
    # planted same-direction vectors land in the same / adjacent LSH buckets
    assert 0 in got and 7 in got


def test_containment_dedup_asymmetric_semantics(ray_session):
    """B = A + a long unique tail: containment(A in B) ~ 1 while Jaccard is
    small — the CONTAINED side drops regardless of id order; mutual
    containment keeps the smaller id; unrelated docs survive."""
    import ray.data

    from chinese_corpus_cleaning_ray.stages.dedup_stage import (
        ngram_containment_dedup,
        ngram_jaccard_dedup,
    )

    core = "这是一段完全一样的核心正文内容，足够长以产生很多五元组。"
    tail = "后面接上的是另一大段完全不相关的扩展材料" * 8
    rows = [
        {"doc_id": 0, "text": core + tail},        # the big doc (earlier id)
        {"doc_id": 1, "text": core},               # contained in doc 0 -> drops
        {"doc_id": 2, "text": "毫无关系的第三篇文档内容不同且独立成篇。" * 3},
        {"doc_id": 3, "text": core},               # mutual with doc 1... but 1 drops;
                                                   # pairwise: 3 vs 1 mutual -> 3 drops
    ]
    ds = ray.data.from_items(rows)
    kept, dups = ngram_containment_dedup(ds, id_col="doc_id", k=5,
                                         threshold=0.9, max_df=None)
    kept_ids = sorted(kept.to_pandas()["doc_id"])
    assert kept_ids == [0, 2]  # 1 contained in 0; 3 mutual with 1 (drop larger)

    # symmetric jaccard at the same bar misses the embedded doc
    jkept, _ = ngram_jaccard_dedup(ds, id_col="doc_id", k=5,
                                   threshold=0.9, max_df=None)
    assert 1 in set(jkept.to_pandas()["doc_id"])
