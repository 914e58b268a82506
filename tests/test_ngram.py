"""N-gram LM + perplexity scorer: formula pins and ordering properties."""

import pytest

from chinese_corpus_cleaning_ray.config import PerplexityConfig
from chinese_corpus_cleaning_ray.functions.ngram_lm import NgramModel, PerplexityScorer
from chinese_corpus_cleaning_ray.sources.transcripts import CLEAN_SENTENCES


@pytest.fixture(scope="module")
def model():
    return NgramModel(n=5, alpha=0.01).train(list(CLEAN_SENTENCES))


@pytest.fixture(scope="module")
def scorer(model):
    return PerplexityScorer(model, PerplexityConfig())


def test_training_text_scores_low(model):
    assert model.perplexity(CLEAN_SENTENCES[0]) < 50.0


def test_unseen_gibberish_scores_high(model):
    clean = model.perplexity(CLEAN_SENTENCES[1])
    gibberish = model.perplexity("xqzj kvw 乱七八糟随机堆砌字符流水账胡言乱语")
    assert gibberish > clean * 10


def test_deterministic(model):
    t = "学习一门新的编程语言需要耐心和持续的练习"
    assert model.perplexity(t) == model.perplexity(t)


def test_save_load_roundtrip(model, tmp_path):
    p = str(tmp_path / "lm.json")
    model.save(p)
    loaded = NgramModel.load(p)
    t = CLEAN_SENTENCES[2]
    assert loaded.perplexity(t) == model.perplexity(t)


def test_cap_at_max_ppl(scorer):
    # garbage far outside the training distribution is capped at max_ppl
    ppl = scorer.calculate_perplexity("ΩΨΦ" * 50)
    assert ppl <= scorer.cfg.max_ppl


def test_spam_bump(scorer):
    # spam patterns force ppl to at least threshold*1.2 — ref:lmppl_perplexity.py:83-85
    ppl = scorer.calculate_perplexity("高清视频在线播放不卡一区二区")
    assert ppl >= scorer.cfg.ppl_threshold * 1.2


def test_check_fails_on_spam_even_if_fluent(scorer):
    ok, details = scorer.check_perplexity("精彩内容在线观看")
    assert details["has_spam_patterns"] and not ok


def test_clean_passes_check(scorer):
    ok, details = scorer.check_perplexity(CLEAN_SENTENCES[0])
    assert ok, details


def test_score_formula_edges(scorer):
    # clean training text: ppl ≤ thr/2 → base 1.0, no spam → 1.0
    assert scorer.get_perplexity_score(CLEAN_SENTENCES[0]) == 1.0
    spam_score = scorer.get_perplexity_score("精品视频在线观看一区二区")
    assert spam_score <= 0.5  # ×0.5 spam multiplier


def test_segment_extraction_for_long_text(scorer):
    long_text = "。".join(CLEAN_SENTENCES) * 3
    assert scorer.calculate_perplexity(long_text) < scorer.cfg.ppl_threshold


def test_evaluate_matches_check_and_score(scorer):
    # fused evaluate() must be bit-identical to the check/score pair on
    # clean, spam, gibberish, long, and empty inputs
    cases = [
        CLEAN_SENTENCES[0],
        "精品视频在线观看一区二区",
        "xqzv kjwf plmt 乱码乱码乱码",
        "。".join(CLEAN_SENTENCES) * 3,
        "",
        "精彩内容在线观看",
    ]
    for text in cases:
        ppl, ok, score = scorer.evaluate(text)
        ok2, details = scorer.check_perplexity(text)
        assert ppl == details["perplexity"], text
        assert ok == ok2, text
        assert score == scorer.get_perplexity_score(text), text
