"""Tests for the data-selection relevance stages (stages/relevance.py):
DSIR-style hashed-ngram importance weights and log-free TF-IDF search.
Each is checked against an independent naive pure-Python reference, for
layout invariance (block count must not change any value), and for the
documented edge cases (short docs dropped, empty target slice)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _naive_buckets(text: str, k: int = 4, n_buckets: int = 64):
    out = []
    for i in range(len(text) - k + 1):
        h = 0
        for ch in text[i:i + k]:
            h = h * 131 + ord(ch)
        out.append(h % n_buckets)
    return out


def _naive_dsir(rows, target_val, k=4, n_buckets=64):
    c_r = np.zeros(n_buckets, dtype=np.int64)
    c_t = np.zeros(n_buckets, dtype=np.int64)
    per = {}
    for did, lang, text in rows:
        counts = np.zeros(n_buckets, dtype=np.int64)
        for b in _naive_buckets(text, k, n_buckets):
            counts[b] += 1
        per[did] = counts
        c_r += counts
        if lang == target_val:
            c_t += counts
    d_r, d_t = int(c_r.sum()), int(c_t.sum())
    recs = []
    for did, lang, text in rows:
        n = per[did]
        den = int(n @ c_r)
        if den == 0:
            continue  # doc shorter than k chars: no grams
        num = int(n @ c_t)
        aff = (np.float64(num) / np.float64(den)) * (
            np.float64(d_r) / np.float64(d_t))
        recs.append((did, num, den, float(aff)))
    return pd.DataFrame(recs, columns=["doc_id", "aff_num", "aff_den",
                                       "affinity"])


def _make_docs(n=120, seed=7):
    rng = np.random.default_rng(seed)
    vocab_en = ["table", "scan", "merge", "fast", "query", "row"]
    vocab_zh = ["数据", "清洗", "中文", "语料", "过滤", "质量"]
    rows = []
    for i in range(n):
        lang = "zh" if i % 3 == 0 else "en"
        vocab = vocab_zh if lang == "zh" else vocab_en
        words = rng.choice(vocab, size=int(rng.integers(4, 40)))
        sep = "" if lang == "zh" else " "
        rows.append((i, lang, sep.join(words)))
    # edge cases: empty text, shorter-than-k text, mixed-script doc
    rows.append((n, "en", ""))
    rows.append((n + 1, "zh", "中文语料"))
    rows.append((n + 2, "en", "fast 数据 scan 清洗"))
    return rows


def test_dsir_weights_match_naive_bitwise(ray_session):
    import ray

    from chinese_corpus_cleaning_ray.stages.relevance import dsir_weights

    rows = _make_docs()
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows]),
    })
    want = _naive_dsir(rows, "zh")
    for blocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = dsir_weights(ds, target_col="lang", target_val="zh",
                           id_col="doc_id").to_pandas()
        assert list(got.columns) == ["doc_id", "aff_num", "aff_den",
                                     "affinity"]
        assert np.array_equal(got["doc_id"].to_numpy(),
                              want["doc_id"].to_numpy())
        assert np.array_equal(got["aff_num"].to_numpy(),
                              want["aff_num"].to_numpy())
        assert np.array_equal(got["aff_den"].to_numpy(),
                              want["aff_den"].to_numpy())
        assert np.array_equal(
            got["affinity"].to_numpy().view(np.int64),
            want["affinity"].to_numpy().view(np.int64)), \
            "affinity must be bitwise-stable across layouts"


def test_dsir_weights_separate_target_from_raw(ray_session):
    """zh docs must score affinity > 1 (their gram mass sits in buckets
    over-represented in the target) and pure-en docs < 1 on the synthetic
    two-vocabulary corpus; the weighted mean affinity over all grams is 1
    by construction."""
    import ray

    from chinese_corpus_cleaning_ray.stages.relevance import dsir_weights

    rows = [r for r in _make_docs() if r[2]]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows]),
    })
    got = dsir_weights(ray.data.from_arrow(tbl), target_col="lang",
                       target_val="zh").to_pandas()
    lang = {r[0]: r[1] for r in rows}
    pure = got[got["doc_id"] < 120]  # exclude the mixed-script edge doc
    zh = pure[[lang[d] == "zh" for d in pure["doc_id"]]]
    en = pure[[lang[d] == "en" for d in pure["doc_id"]]]
    # bucket collisions (64 buckets) can push individual docs across 1.0,
    # but the populations must separate cleanly
    assert (zh["affinity"] > 1.0).mean() >= 0.9
    assert (en["affinity"] < 1.0).mean() >= 0.9
    assert zh["affinity"].mean() > 1.2
    assert en["affinity"].mean() < 0.9
    # short-but-valid doc (len == k) survives; empty doc is dropped
    assert 121 in set(got["doc_id"])
    assert 120 not in set(got["doc_id"])


def test_dsir_weights_empty_target_slice(ray_session):
    import ray

    from chinese_corpus_cleaning_ray.stages.relevance import dsir_weights

    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["en", "en"]),
        "text": pa.array(["fast table scan", "merge query rows"]),
    })
    got = dsir_weights(ray.data.from_arrow(tbl), target_col="lang",
                       target_val="zh").to_pandas()
    assert (got["aff_num"] == 0).all()
    assert (got["affinity"] == 0.0).all()


def _naive_tfidf(rows, query, k=4, top=10, scale=1000):
    grams = sorted({query[i:i + k] for i in range(len(query) - k + 1)})
    n = len(rows)
    tf = {}
    for did, text in rows:
        for j in range(len(text) - k + 1):
            g = text[j:j + k]
            if g in grams:
                tf[(did, g)] = tf.get((did, g), 0) + 1
    df = {}
    for (did, g) in tf:
        df[g] = df.get(g, 0) + 1
    scores = {}
    for (did, g), t in tf.items():
        scores[did] = scores.get(did, 0) + t * ((scale * n) // df[g])
    recs = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return pd.DataFrame(recs, columns=["doc_id", "score"])


def test_tfidf_search_matches_naive(ray_session):
    import ray

    from chinese_corpus_cleaning_ray.stages.relevance import tfidf_search

    rows = [(r[0], r[2]) for r in _make_docs(seed=11) if r[2]]
    query = "fast table scan"
    want = _naive_tfidf(rows, query)
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    })
    for blocks in (1, 5):
        got = tfidf_search(ray.data.from_arrow(tbl).repartition(blocks),
                           query, id_col="doc_id").to_pandas()
        assert got[["doc_id", "score"]].to_numpy().tolist() == \
            want.to_numpy().tolist()


def test_tfidf_search_rejects_short_query(ray_session):
    import ray

    from chinese_corpus_cleaning_ray.stages.relevance import tfidf_search

    ds = ray.data.from_items([{"doc_id": 1, "text": "abcd"}])
    with pytest.raises(ValueError):
        tfidf_search(ds, "abc")


def _planted_embeddings(n_groups=40, dup_per_group=3, dim=32, seed=13):
    """Well-separated base vectors, each with near-copies at cosine > 0.97
    (tiny jitter) — the planted all-pairs truth for semdedup recall."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, gids = [], []
    vid = 0
    rows = []
    for g in range(n_groups):
        for j in range(dup_per_group):
            v = base[g] + rng.normal(scale=0.01, size=dim)
            rows.append((vid, v / np.linalg.norm(v), g))
            vid += 1
    return rows


def test_semdedup_collapses_planted_groups(ray_session):
    import ray

    from chinese_corpus_cleaning_ray.stages.similarity import semdedup

    rows = _planted_embeddings()
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1].tolist() for r in rows],
                              pa.list_(pa.float32())),
    })
    deduped, dup_ids = semdedup(
        ray.data.from_arrow(tbl), threshold=0.9, n_clusters=8,
        sample_size=1000)
    kept = sorted(deduped.to_pandas()["vec_id"])
    group_of = {r[0]: r[2] for r in rows}
    kept_groups = [group_of[v] for v in kept]
    n_groups = len({r[2] for r in rows})
    # every group must survive with AT LEAST one member (no over-deletion)...
    assert len(set(kept_groups)) == n_groups
    # ...and k-means clustering must catch nearly every planted duplicate
    # (a group split across cluster boundaries can leak a dup — quantify)
    n_dups_true = len(rows) - n_groups
    n_dropped = len(rows) - len(kept)
    assert n_dropped / n_dups_true >= 0.95, \
        f"semdedup recall {n_dropped}/{n_dups_true} below 0.95"


def test_semdedup_keeps_unique_vectors(ray_session):
    """A corpus with no near-dups must pass through untouched (precision:
    semdedup never deletes below-threshold rows, whatever the clustering)."""
    import ray

    from chinese_corpus_cleaning_ray.stages.similarity import semdedup

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(100, 24))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(100), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    deduped, _ = semdedup(ray.data.from_arrow(tbl), threshold=0.99,
                          n_clusters=4, sample_size=1000)
    assert sorted(deduped.to_pandas()["vec_id"]) == list(range(100))


def test_cli_dsir_search_semdedup(tmp_path):
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    env = dict(os.environ, PYTHONPATH="/root/repo")
    rows = _make_docs(n=60)
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows]),
    }), src)

    out = subprocess.run(
        [sys.executable, "-m", "chinese_corpus_cleaning_ray", "dsir",
         "--input", src, "--output", str(tmp_path / "w"),
         "--target-col", "lang", "--target-val", "zh", "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert out.returncode == 0, out.stderr[-800:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    assert m["rows"] == 62  # 63 docs minus the empty-text one
    got = pq.read_table(str(tmp_path / "w"))
    assert {"doc_id", "aff_num", "aff_den", "affinity"} <= \
        set(got.column_names)

    out = subprocess.run(
        [sys.executable, "-m", "chinese_corpus_cleaning_ray", "search",
         "--input", src, "--query", "fast table scan", "--top", "5",
         "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert out.returncode == 0, out.stderr[-800:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    assert 0 < len(m["hits"]) <= 5
    assert m["hits"][0]["score"] >= m["hits"][-1]["score"]

    emb = _planted_embeddings(n_groups=10, dup_per_group=3)
    esrc = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in emb], pa.int64()),
        "embedding": pa.array([r[1].tolist() for r in emb],
                              pa.list_(pa.float32())),
    }), esrc)
    out = subprocess.run(
        [sys.executable, "-m", "chinese_corpus_cleaning_ray", "semdedup",
         "--input", esrc, "--output", str(tmp_path / "sd"),
         "--threshold", "0.9", "--n-clusters", "4", "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert out.returncode == 0, out.stderr[-800:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    assert 10 <= m["kept"] < 30


def test_dsir_and_tfidf_degenerate_inputs(ray_session):
    """Empty dataset and all-shorter-than-k corpora must yield empty/zero
    results, not crashes (the round-5 empty-input discipline)."""
    import ray

    from chinese_corpus_cleaning_ray.stages.relevance import (
        dsir_weights,
        tfidf_search,
    )

    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
    })
    got = dsir_weights(ray.data.from_arrow(empty), target_col="lang",
                       target_val="zh").to_pandas()
    assert len(got) == 0

    short = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["zh", "en"]),
        "text": pa.array(["ab", ""]),
    })
    got = dsir_weights(ray.data.from_arrow(short), target_col="lang",
                       target_val="zh").to_pandas()
    assert len(got) == 0  # no doc has a 4-gram

    got = tfidf_search(ray.data.from_arrow(empty.select(
        ["doc_id", "text"])), "fast table").to_pandas()
    assert len(got) == 0


def test_dsir_resample_rate_tracks_affinity(ray_session):
    """Kept docs carry rate = clamp(floor(affinity*5000), 0, 10000); zh docs
    (affinity ≈ 1.8 on the two-vocabulary corpus) must be kept at a visibly
    higher rate than en docs (affinity ≈ 0.38), and membership must be the
    LCG coin exactly."""
    import ray

    from chinese_corpus_cleaning_ray.stages.relevance import (
        dsir_resample,
        dsir_weights,
    )

    rows = [r for r in _make_docs(n=300) if r[2]]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows]),
    })
    ds = ray.data.from_arrow(tbl)
    w = dsir_weights(ds, target_col="lang", target_val="zh").to_pandas()
    got = dsir_resample(ray.data.from_arrow(tbl), target_col="lang",
                        target_val="zh").to_pandas()
    # naive restatement: rate + LCG coin over the weights frame
    rate = np.clip(np.floor(w["affinity"].to_numpy() * np.float64(5000)),
                   0, 10000).astype(np.int64)
    ids = w["doc_id"].to_numpy()
    coin = ((ids % 2**31) * 1103515245 + 12345) % 2**31 % 10000
    want = pd.DataFrame({"doc_id": ids[coin < rate],
                         "rate": rate[coin < rate]})
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got.to_numpy().tolist() == want.to_numpy().tolist()
    lang = {r[0]: r[1] for r in rows}
    kept_langs = pd.Series([lang[d] for d in got["doc_id"]])
    n_zh_in = sum(1 for r in rows if r[1] == "zh")
    n_en_in = len(rows) - n_zh_in
    zh_rate = (kept_langs == "zh").sum() / n_zh_in
    en_rate = (kept_langs == "en").sum() / n_en_in
    assert zh_rate > 2 * en_rate, (zh_rate, en_rate)
