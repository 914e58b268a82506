"""Feature-word scorer vs oracle; tier boundaries and quirks."""

import pytest

from chinese_corpus_cleaning_ray.functions.features import FeatureWordsScorer

import oracle_ref as o


@pytest.fixture(scope="module")
def scorer(wordlist):
    return FeatureWordsScorer(wordlist)


@pytest.fixture(scope="module")
def trie(wordlist):
    return o.build_trie(wordlist)


def test_scores_match_oracle(scorer, trie, sample_texts):
    for text in sample_texts:
        assert scorer.get_feature_score(text) == pytest.approx(
            o.o_feature_score(trie, text), abs=1e-12
        ), f"feature score diverges for {text[:60]!r}"


def test_pass_matches_oracle(scorer, trie, sample_texts):
    for text in sample_texts:
        got, _ = scorer.check_feature_words(text)
        assert got == o.o_feature_pass(trie, text)


def test_empty_text_scores_zero(scorer):
    assert scorer.get_feature_score("") == 0.0


def test_clean_text_scores_one(scorer):
    clean = "清晨的阳光洒在湖面上微风吹过泛起层层涟漪远处的山峦在薄雾中若隐若现" * 2
    assert scorer.get_feature_score(clean) == 1.0


def test_ad_text_scores_low(scorer):
    ad = "年底特价大促销全场优惠不容错过限时抢购免费领取精美礼品加微信领取内部优惠券"
    assert scorer.get_feature_score(ad) == 0.0


def test_negative_context_softening(scorer, trie):
    # long disclaimer text: ratio*0.3 < 0.05 → score floors at 0.8
    base = "我们在会议上回顾了上个季度的工作进展并且对下一阶段的目标进行了详细的规划。" * 16
    text = base + "本平台严格审核所有内容不包含任何色情与赌博信息。"
    got = scorer.get_feature_score(text)
    assert got == pytest.approx(o.o_feature_score(trie, text))
    assert got >= 0.8


def test_numerator_denominator_line_quirk(scorer, trie):
    # a non-blank line shorter than 5 chars contributes matches to the
    # numerator but is excluded from the denominator — ref:feature_words.py:184-205
    text = "特价\n这是一行正常的长句子并无多余词汇在内"
    got_pass, details = scorer.check_feature_words(text)
    assert details["avg_per_line"] == pytest.approx(1.0)  # 1 match / 1 valid line
    assert got_pass == o.o_feature_pass(trie, text) == False  # noqa: E712


def test_common_words_excluded_from_score(scorer, trie):
    # 电话 is in the word list but also a "common word" → excluded from uniques
    text = "这部电话的音质表现相当不错而且续航能力也令人满意值得推荐给大家参考选购"
    assert scorer.get_feature_score(text) == pytest.approx(o.o_feature_score(trie, text)) == 1.0


def test_fused_evaluate_matches_unfused(scorer, sample_texts):
    for text in sample_texts[:400]:
        fused = scorer.evaluate(text, scrub=True)
        passed, details = scorer.check_feature_words(text)
        want_score = scorer.get_feature_score(text, matched=details["feature_words"])
        assert fused["feature_pass"] == passed
        assert fused["feature_score"] == want_score
        assert fused["feature_count"] == details["feature_count"]
        assert fused["scrubbed_text"] == scorer.dfa.filter(text)
