"""Clustering quality component (ref:main.py:189-206, clustering.py:127-207):
piecewise score parity with a scalar restatement of the reference formula,
duplicate detection against the reference corpus, and pipeline wiring."""

import numpy as np
import pyarrow as pa
import pytest


def _ref_cluster_score(r: float, th: float) -> float:
    """Scalar restatement of ref:utils/clustering.py:195-207."""
    if r >= th:
        return max(0.0, 0.2 * (1 - (r - th) / (1 - th)))
    return min(1.0, 0.8 + 0.2 * (1 - r / th))


def test_piecewise_score_matches_reference_formula():
    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
    from chinese_corpus_cleaning_ray.stages.quality_stages import ClusteringStage

    st = ClusteringStage(DEFAULT_CONFIG)
    th = st.threshold
    rng = np.random.RandomState(0)
    r = np.concatenate([rng.uniform(0, 1, 200), [0.0, th, 1.0, th - 1e-12]])
    got = np.where(
        r >= th,
        np.maximum(0.0, 0.2 * (1 - (r - th) / (1 - th))),
        np.minimum(1.0, 0.8 + 0.2 * (1 - r / th)),
    )
    want = np.array([_ref_cluster_score(x, th) for x in r])
    assert np.allclose(got, want, atol=0)


def test_stage_flags_reference_duplicates():
    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
    from chinese_corpus_cleaning_ray.sources.transcripts import CLEAN_SENTENCES
    from chinese_corpus_cleaning_ray.stages.quality_stages import ClusteringStage

    st = ClusteringStage(DEFAULT_CONFIG)
    dup = CLEAN_SENTENCES[0]            # verbatim member of the reference corpus
    fresh = "量子计算机的纠错码设计需要考虑退相干时间与逻辑门保真度之间的平衡问题"
    out = st(pa.table({"text": pa.array([dup, fresh], pa.string())}))
    ratio = out.column("cluster_dup_ratio").to_pylist()
    assert ratio[0] >= 0.999             # exact member ⇒ cosine ≈ 1
    assert ratio[1] < ratio[0]
    assert out.column("cluster_pass").to_pylist() == [False, True]
    scores = out.column("cluster_score").to_pylist()
    assert scores[0] <= 0.2 and scores[1] > scores[0]


def test_pipeline_wiring_and_weighted_score(ray_session):
    import ray.data as rd
    from dataclasses import replace

    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
    from chinese_corpus_cleaning_ray.pipelines.quality import build_quality_pipeline
    from chinese_corpus_cleaning_ray.sources.transcripts import synthesize_transcripts

    tbl = synthesize_transcripts(500, seed=11)
    cfg = replace(DEFAULT_CONFIG, enable_clustering=True)
    out = build_quality_pipeline(rd.from_arrow(tbl), cfg).to_pandas()
    assert {"cluster_dup_ratio", "cluster_pass", "cluster_score"} <= set(out.columns)
    assert out["quality_score"].between(0, 1).all()

    # weighted composite: recompute rule*0.3 + feature*0.5 + cluster*0.1 / 0.9
    expect = (
        0.3 * out["rule_score"] + 0.5 * out["feature_score"] + 0.1 * out["cluster_score"]
    ) / 0.9
    expect = np.where(out["rule_error"], 0.0, expect)
    assert np.allclose(out["quality_score"], expect)

    # default config stays clustering-free (label parity with the reference)
    out2 = build_quality_pipeline(rd.from_arrow(tbl), DEFAULT_CONFIG).to_pandas()
    assert "cluster_score" not in out2.columns
