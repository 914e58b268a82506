"""Hot-conversation skew fixture and the perplexity-enabled pipeline path."""

import pytest


def test_skewed_corpus_full_job(ray_session, tmp_path):
    """conv-hot holds ~50% of rows (FIXTURES §1). The shuffle-free writer must
    not funnel it into one task; output stays correct and conversation-located."""
    import pyarrow.dataset as pads

    from chinese_corpus_cleaning_ray.sources.transcripts import write_transcripts
    from chinese_corpus_cleaning_ray.state.checkpoint import Manifest, run_quality_job

    corpus = write_transcripts(str(tmp_path / "sk"), 20_000, seed=11, skew=True,
                               rows_per_file=4_000)
    out = str(tmp_path / "out")
    stats = run_quality_job(corpus, out, checkpoint_every=3)
    assert stats["total"] == 20_000
    t = pads.dataset(Manifest(out).data_dir, partitioning="hive").to_table()
    assert t.num_rows == 20_000
    convs = t.column("conv_id").to_pylist()
    hot = sum(1 for c in convs if c == "conv-hot")
    assert hot > 6_000  # the skew actually exists
    # all hot rows in exactly one partition dir
    hot_parts = {p for c, p in zip(convs, t.column("part_id").to_pylist()) if c == "conv-hot"}
    assert len(hot_parts) == 1
    # keys unique
    keys = list(zip(convs, t.column("turn_idx").to_pylist()))
    assert len(keys) == len(set(keys))


def test_ppl_enabled_pipeline_parity(ray_session):
    """enable_perplexity=True: composite becomes (0.3r+0.5f+0.1p)/0.9
    (ref:config/config.py:55-60, ref:main.py:240-251). The oracle reuses the
    unit-tested PerplexityScorer for the ppl component and independently
    restates rules/features/composite."""
    import ray.data as rd

    import oracle_ref as o
    from dataclasses import replace

    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
    from chinese_corpus_cleaning_ray.functions.ngram_lm import NgramModel, PerplexityScorer
    from chinese_corpus_cleaning_ray.functions.wordlists import load_words
    from chinese_corpus_cleaning_ray.pipelines.quality import build_quality_pipeline
    from chinese_corpus_cleaning_ray.sources.transcripts import CLEAN_SENTENCES, synthesize_transcripts

    cfg = replace(DEFAULT_CONFIG, enable_perplexity=True)
    corpus = synthesize_transcripts(1_500, seed=77)
    out = build_quality_pipeline(rd.from_arrow(corpus).repartition(4), cfg)
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in out.to_pandas().to_dict("records")
    }
    scorer = PerplexityScorer(
        NgramModel(n=cfg.perplexity.order, alpha=cfg.perplexity.alpha).train(list(CLEAN_SENTENCES)),
        cfg.perplexity,
    )
    trie = o.build_trie(load_words())
    rows = corpus.to_pylist()
    ppl_scores = []
    n_shifted = 0
    for r in rows:
        g = got[(r["conv_id"], r["turn_idx"])]
        ppl_score = scorer.get_perplexity_score(r["text"])
        ppl_scores.append(ppl_score)
        want = o.o_decide(trie, r["text"], ppl_score=ppl_score)
        assert g["quality_score"] == pytest.approx(want["quality_score"], abs=1e-9), r["text"][:50]
        assert bool(g["keep"]) == want["keep"], r["text"][:50]
        base = o.o_decide(trie, r["text"])
        if abs(want["quality_score"] - base["quality_score"]) > 0.02:
            n_shifted += 1
    # non-vacuous: the ppl component spans its range and moves composite scores
    assert min(ppl_scores) < 0.5 < max(ppl_scores)
    assert n_shifted > 50
