"""Distributed connected components (large-star/small-star) and the
cluster-correct dedup built on it: planted transitivity cases, randomized
union-find equivalence (int and string ids), worst-case path convergence,
both attach strategies, and the jaccard-edge composition vs brute force."""

from __future__ import annotations

import itertools
import random

import pandas as pd
import pytest


def _union_find(n_nodes, edges):
    par = list(range(n_nodes))

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in range(n_nodes)}


def test_components_transitive_closure_beats_pairwise(ray_session):
    """Edge set {(1,3),(3,4),(2,4)} is ONE component. Pairwise min-drop
    (what every per-pair dedup does) would drop only {3,4} and keep both 1
    and 2; connected components must map 2, 3 and 4 all to 1."""
    import ray

    e = ray.data.from_pandas(pd.DataFrame({"a": [1, 3, 2], "b": [3, 4, 4]}))
    from chinese_corpus_cleaning_ray.stages.components import (
        connected_components,
    )

    m = connected_components(e).to_pandas()
    assert dict(zip(m.node, m.component)) == {2: 1, 3: 1, 4: 1}
    # pairwise contrast, computed explicitly: drop larger of each pair
    pairwise_dropped = {3, 4}
    pairwise_kept = {1, 2, 3, 4} - pairwise_dropped
    assert pairwise_kept == {1, 2}  # two survivors in one dup cluster


def test_components_random_graph_matches_union_find(ray_session):
    import ray

    from chinese_corpus_cleaning_ray.stages.components import (
        connected_components,
    )

    rng = random.Random(7)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    truth = _union_find(n, edges)
    e = ray.data.from_pandas(pd.DataFrame(
        {"a": [a for a, _ in edges], "b": [b for _, b in edges]}))
    m = connected_components(e).to_pandas()
    got = {int(r.node): int(r.component) for r in m.itertuples()}
    assert {x: got.get(x, x) for x in range(n)} == truth
    # mapping rows are exactly the non-center nodes
    assert all(r.node > r.component for r in m.itertuples())


def test_components_string_ids_and_degenerate_edges(ray_session):
    import ray

    from chinese_corpus_cleaning_ray.stages.components import (
        connected_components,
    )

    e = ray.data.from_pandas(pd.DataFrame(
        {"a": ["x", "y", "x", "z", "q"], "b": ["y", "x", "x", "y", "q"]}))
    m = connected_components(e).to_pandas()
    # self-loops (x-x, q-q) ignored; reversed duplicate (y,x) collapses
    assert dict(zip(m.node, m.component)) == {"y": "x", "z": "x"}

    only_loops = ray.data.from_pandas(pd.DataFrame({"a": [5], "b": [5]}))
    assert connected_components(only_loops).count() == 0


def test_components_long_path_converges(ray_session):
    """A 300-node path is the worst case for naive min-label propagation
    (O(diameter) rounds); large-star/small-star must finish within the
    default O(log² n) round budget."""
    import ray

    from chinese_corpus_cleaning_ray.stages.components import (
        connected_components,
    )

    p = 300
    e = ray.data.from_pandas(pd.DataFrame(
        {"a": list(range(p - 1)), "b": list(range(1, p))}))
    m = connected_components(e).to_pandas()
    assert set(m.component) == {0}
    assert set(m.node) == set(range(1, p))


def test_attach_components_both_strategies(ray_session):
    """Broadcast and distributed-join attachment agree, give every row a
    total assignment (absent nodes map to themselves), and preserve the id
    dtype."""
    import ray

    from chinese_corpus_cleaning_ray.stages.components import (
        attach_components,
        connected_components,
    )

    e = ray.data.from_pandas(pd.DataFrame({"a": [1, 3, 2], "b": [3, 4, 4]}))
    comp = connected_components(e).materialize()
    corpus = pd.DataFrame({"doc_id": [1, 2, 3, 4, 9], "text": list("abcde")})
    want = {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}
    for strategy in ("broadcast", "join"):
        out = attach_components(ray.data.from_pandas(corpus), comp, "doc_id",
                                strategy=strategy).to_pandas()
        assert dict(zip(out.doc_id, out.component)) == want, strategy
        assert out.component.dtype == out.doc_id.dtype, strategy


def test_component_dedup_keeps_cluster_minimum(ray_session):
    import ray

    from chinese_corpus_cleaning_ray.stages.components import component_dedup

    corpus = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3, 4, 9], "text": list("abcde")}))
    edges = ray.data.from_pandas(pd.DataFrame({"a": [1, 3, 2], "b": [3, 4, 4]}))
    kept, _ = component_dedup(corpus, edges, "doc_id")
    assert sorted(kept.to_pandas().doc_id) == [1, 9]


def test_jaccard_edges_and_cluster_dedup_vs_bruteforce(ray_session):
    """ngram_jaccard_edges reproduces the brute-force qualifying pair list
    exactly, and jaccard_component_dedup keeps exactly the union-find
    cluster minima — including a similarity CHAIN 1~2~6 where doc 6 is NOT
    within threshold of doc 1 directly (the transitive case pairwise
    dedup already happens to handle, plus the branching case it does not)."""
    import ray

    from chinese_corpus_cleaning_ray.stages.components import (
        jaccard_component_dedup,
    )
    from chinese_corpus_cleaning_ray.stages.dedup_stage import (
        char_shingles,
        jaccard,
        ngram_jaccard_edges,
    )

    docs = pd.DataFrame({
        "doc_id": list(range(8)),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "the quick brown fox leaps over the lazy cat",
            "completely different content about ray data",
            "completely different content about ray rata",
            "unrelated fifth document with its own words",
            "the quick brown fox leaps over the lazy rat",
            "short",
        ]})
    k, thr = 5, 0.55
    sh = {i: char_shingles(t, k) for i, t in zip(docs.doc_id, docs.text)}
    edges_true = sorted(
        (a, b) for a, b in itertools.combinations(range(8), 2)
        if jaccard(sh[a], sh[b]) >= thr)
    assert (1, 2) in edges_true and (2, 6) in edges_true  # the chain exists

    got = ngram_jaccard_edges(ray.data.from_pandas(docs), "doc_id", k=k,
                              threshold=thr, max_df=None).to_pandas()
    assert sorted(map(tuple, got[["ia", "ib"]].to_numpy())) == edges_true

    truth = _union_find(8, edges_true)
    keep_true = sorted(x for x in range(8) if truth[x] == x)
    kept, _ = jaccard_component_dedup(ray.data.from_pandas(docs), "doc_id",
                                      k=k, threshold=thr, max_df=None)
    assert sorted(kept.to_pandas().doc_id) == keep_true


def test_minhash_edges_verified_and_cluster_dedup_agree(ray_session):
    """minhash_edges returns only pairs whose EXACT Jaccard clears the
    verify threshold (no band-collision false positives), and
    minhash_component_dedup agrees with the exhaustive
    jaccard_component_dedup on a near-dup corpus whose true pairs the
    bands catch (identical docs collide in every band)."""
    import ray

    from chinese_corpus_cleaning_ray.stages.components import (
        jaccard_component_dedup,
        minhash_component_dedup,
    )
    from chinese_corpus_cleaning_ray.stages.dedup_stage import (
        char_shingles,
        jaccard,
        minhash_edges,
    )

    fams = [
        "streaming execution pipelines schedule blocks with backpressure",
        "sensitive word tries scrub documents in one deterministic pass",
        "minhash signatures bucket near duplicates into banded groups",
        "parquet readers prune columns before rows leave object storage",
        "actor pools hold compiled models across repeated batch calls",
    ]
    texts, rng = [], random.Random(11)
    for i in range(30):
        t = fams[i % 5]
        if i >= 5 and rng.random() < 0.5:  # light perturbation, still dup
            t = t + " tail"
        texts.append(t)
    docs = pd.DataFrame({"doc_id": list(range(30)), "text": texts})

    thr = 0.5
    edges = minhash_edges(ray.data.from_pandas(docs), "doc_id",
                          verify_threshold=thr).to_pandas()
    sh = {i: char_shingles(t, 5) for i, t in zip(docs.doc_id, docs.text)}
    for a, b in edges[["ia", "ib"]].itertuples(index=False):
        assert jaccard(sh[a], sh[b]) >= thr, (a, b)

    kept_mh, _ = minhash_component_dedup(ray.data.from_pandas(docs),
                                         "doc_id", verify_threshold=thr)
    kept_jc, _ = jaccard_component_dedup(ray.data.from_pandas(docs),
                                         "doc_id", threshold=thr,
                                         max_df=None)
    assert (sorted(kept_mh.to_pandas().doc_id)
            == sorted(kept_jc.to_pandas().doc_id) == [0, 1, 2, 3, 4])


def test_components_nonconvergence_guard(ray_session):
    """max_rounds=0 must raise rather than return a half-contracted graph."""
    import ray

    from chinese_corpus_cleaning_ray.stages.components import (
        connected_components,
    )

    e = ray.data.from_pandas(pd.DataFrame({"a": [0, 1], "b": [1, 2]}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_rounds=0)


def test_exact_quantiles_matches_quantile_disc(ray_session):
    """Randomized: the value-count cumulative walk equals DuckDB's
    quantile_disc on every q, including duplicates-heavy and single-value
    corpora; the distinct-cardinality guard raises."""
    import duckdb
    import numpy as np
    import pytest
    import ray

    from chinese_corpus_cleaning_ray.stages.analysis import exact_quantiles

    rng = np.random.default_rng(5)
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    con = duckdb.connect()
    for vals in (
        rng.integers(0, 50, 997),          # heavy duplication
        rng.integers(-1000, 1000, 256),    # negatives
        np.array([7]),                     # single row
        np.full(100, 3),                   # single distinct value
    ):
        ds = ray.data.from_pandas(pd.DataFrame({"x": vals}))
        got = exact_quantiles(ds, "x", qs)
        con.execute("CREATE OR REPLACE TABLE t AS SELECT unnest(?) AS x",
                    [vals.tolist()])
        for q, v in zip(got.q, got.value):
            exp = con.execute("SELECT quantile_disc(x, ?) FROM t",
                              [float(q)]).fetchone()[0]
            assert v == exp, (q, v, exp, len(vals))

    with pytest.raises(ValueError, match="distinct"):
        exact_quantiles(
            ray.data.from_pandas(pd.DataFrame({"x": np.arange(100)})),
            "x", [0.5], max_distinct=10)


def test_repetition_signals_planted_and_edge_cases(ray_session):
    """Hand-computed duplicate-line fractions, including null text, empty
    text, and empty-line duplication (zero chars contribute nothing to the
    char fraction but do count as duplicate lines)."""
    import ray

    from chinese_corpus_cleaning_ray.stages.analysis import repetition_signals

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": pd.array(["a\na\nb", "", None, "x\n\n\nx"], dtype=object),
    })
    out = (repetition_signals(ray.data.from_pandas(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    rows = {r.doc_id: (r.n_lines, round(r.dup_line_frac, 6),
                       round(r.dup_line_char_frac, 6))
            for r in out.itertuples()}
    assert rows == {
        0: (3, round(1 / 3, 6), round(2 / 3, 6)),  # 'a' twice of 3 lines
        1: (1, 0.0, 0.0),                          # one empty line
        2: (1, 0.0, 0.0),                          # null -> ""
        3: (4, 0.5, 1.0),  # 'x'×2 + ''×2 dup lines; all chars in dup 'x'
    }


def test_exact_quantiles_by_key_matches_per_key_disc(ray_session):
    """The grouped (fully distributed) variant equals a per-key driver
    quantile_disc computation, string and int keys."""
    import math

    import numpy as np
    import ray

    from chinese_corpus_cleaning_ray.stages.analysis import (
        exact_quantiles_by_key,
    )

    rng = np.random.default_rng(9)
    keys = rng.choice(list("abcde"), 700)
    vals = rng.integers(0, 40, 700)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys, "x": vals}))
    got = (exact_quantiles_by_key(ds, "k", "x", qs).to_pandas()
           .sort_values(["k", "q"]).reset_index(drop=True))

    def disc(sorted_vals, q):
        n = len(sorted_vals)
        return sorted_vals[max(1, math.ceil(q * n)) - 1]

    want = []
    for k in sorted(set(keys)):
        s = sorted(vals[keys == k])
        for q in qs:
            want.append((k, q, disc(s, q)))
    assert list(map(tuple, got[["k", "q", "value"]].to_numpy())) == want


def test_boilerplate_report_counts_and_order(ray_session):
    """Top-n repeated paragraphs: counts sum across batches, min_count
    filters singletons, order is (n desc, para asc), min_len drops empties."""
    import ray

    from chinese_corpus_cleaning_ray.stages.analysis import boilerplate_report

    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": [
            "hdr\nbody one\nftr",
            "hdr\nbody two\nftr",
            "hdr\nbody one\nftr",
            "hdr\n\n\nftr",
            "zzz\nbody two",
            "solo paragraph",
        ]})
    rep = boilerplate_report(ray.data.from_pandas(docs).repartition(3),
                             top_n=3)
    assert list(map(tuple, rep.to_numpy())) == [
        ("ftr", 4), ("hdr", 4), ("body one", 2)]
    rep2 = boilerplate_report(ray.data.from_pandas(docs), top_n=10)
    assert list(map(tuple, rep2.to_numpy())) == [
        ("ftr", 4), ("hdr", 4), ("body one", 2), ("body two", 2)]


def test_quantile_filter_bounds_and_degenerate(ray_session):
    """quantile_filter keeps exactly the rows DuckDB's quantile_disc window
    admits; an all-equal column keeps everything; bounds are inclusive."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    from chinese_corpus_cleaning_ray.stages.analysis import quantile_filter

    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.integers(0, 50, 900),
                           rng.integers(1000, 2000, 100)]).astype(np.int64)
    df = pd.DataFrame({"doc_id": np.arange(len(vals)), "v": vals})
    ds = ray.data.from_pandas(df).repartition(7)
    got = quantile_filter(ds, "v", 0.05, 0.9).to_pandas()
    exp = duckdb.query_df(df, "t", """
        WITH qs AS (SELECT quantile_disc(v, 0.05) lo, quantile_disc(v, 0.9) hi FROM t)
        SELECT doc_id, v FROM t, qs WHERE v BETWEEN lo AND hi ORDER BY doc_id
    """).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].astype(int).tolist()
    assert got["v"].tolist() == exp["v"].astype(int).tolist()

    same = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(20), "v": [7] * 20}))
    kept = quantile_filter(same, "v").to_pandas()
    assert len(kept) == 20  # inclusive bounds: all-equal column survives


def test_quantile_filter_by_key_per_source_thresholds(ray_session):
    """Each key gets ITS OWN window: a value that survives under one key is
    cut under another whose distribution sits elsewhere."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    from chinese_corpus_cleaning_ray.stages.analysis import quantile_filter_by_key

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "doc_id": np.arange(2000),
        "src": np.where(np.arange(2000) % 2 == 0, "short", "long"),
        "v": np.where(np.arange(2000) % 2 == 0,
                      rng.integers(10, 50, 2000),
                      rng.integers(1000, 5000, 2000)).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    got = (quantile_filter_by_key(ds, "src", "v", 0.1, 0.9).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = duckdb.query_df(df, "t", """
        WITH qs AS (SELECT src, quantile_disc(v, 0.1) lo, quantile_disc(v, 0.9) hi
                    FROM t GROUP BY src)
        SELECT t.doc_id FROM t JOIN qs USING (src)
        WHERE v BETWEEN lo AND hi ORDER BY doc_id
    """).df()
    assert got["doc_id"].tolist() == exp["doc_id"].astype(int).tolist()
    # a 40-char doc survives in "short" but a 40-char doc planted in "long"
    # would be cut by long's own window
    ds2 = ray.data.from_pandas(pd.concat(
        [df, pd.DataFrame({"doc_id": [9999], "src": ["long"], "v": [40]})],
        ignore_index=True))
    got2 = quantile_filter_by_key(ds2, "src", "v", 0.1, 0.9).to_pandas()
    assert 9999 not in set(got2["doc_id"])
