"""Rule-filter kernel vs the independent oracle restatement."""

import pytest

from chinese_corpus_cleaning_ray.config import RuleConfig
from chinese_corpus_cleaning_ray.functions import rules

import oracle_ref as o

CFG = RuleConfig()


def test_checks_match_oracle(sample_texts):
    for text in sample_texts:
        s = rules.rule_stats(text)
        got = dict(zip(rules.CHECK_NAMES, rules.rule_checks(s, CFG)))
        want = o.o_checks(text)
        assert got == want, f"checks diverge for {text[:60]!r}"


def test_score_matches_oracle(sample_texts):
    for text in sample_texts:
        r = rules.evaluate_rules(text, CFG)
        if len(text) == 0:
            assert r["rule_error"] and r["rule_score"] == 0.0
            with pytest.raises(ZeroDivisionError):
                o.o_rule_score(text)
            continue
        assert r["rule_score"] == pytest.approx(o.o_rule_score(text), abs=1e-12)
        assert not r["rule_error"]


def test_short_text_skips_dup_check():
    r = rules.evaluate_rules("短文本十二个字而已哦", CFG)
    assert dict(zip(rules.CHECK_NAMES, r["checks"]))["dup"] is True


def test_empty_text_error_path():
    r = rules.evaluate_rules("", CFG)
    assert r["rule_error"] is True
    assert r["rule_pass"] is False
    assert r["rule_score"] == 0.0


def test_all_pass_is_exactly_one(sample_texts):
    seen = False
    for text in sample_texts:
        r = rules.evaluate_rules(text, CFG)
        if r["rule_pass"]:
            assert r["rule_score"] == 1.0
            seen = True
    assert seen, "fixture mix must contain texts passing all rules"


def test_seo_spam_downweight():
    spam = "|".join(["在线播放", "精品视频在线", "久久久久"] * 5)
    r = rules.evaluate_rules(spam, CFG)
    assert not r["rule_pass"]
    assert r["rule_score"] == pytest.approx(o.o_rule_score(spam))
    assert r["rule_score"] < 0.3  # ×0.3 obvious-spam downweight kicked in


def test_arrow_kernel_matches_scalar(sample_texts):
    """The vectorized Arrow/numpy path must be value-identical to the scalar
    spec over every fixture class (incl. empty / edge rows)."""
    texts = sample_texts
    fast = rules.evaluate_rules_arrow(texts, CFG)
    for i, text in enumerate(texts):
        r = rules.evaluate_rules(text, CFG)
        assert bool(fast["rule_pass"][i]) == r["rule_pass"], text[:50]
        assert bool(fast["rule_error"][i]) == r["rule_error"], text[:50]
        # BIT-identical, not approx: the vectorized path accumulates the
        # weighted sum sequentially (same IEEE op order as the scalar spec
        # and the SQL oracle) — the doc_quality oracle depends on this
        assert fast["rule_score"][i] == r["rule_score"], text[:50]
        want = dict(zip(rules.CHECK_NAMES, r["checks"]))
        for name in rules.CHECK_NAMES:
            assert bool(fast["checks"][name][i]) == want[name], (text[:50], name)


def test_batch_kernel_matches_scalar(sample_texts):
    texts = sample_texts[:300]
    batch = rules.evaluate_rules_batch(texts, CFG)
    for i, text in enumerate(texts):
        r = rules.evaluate_rules(text, CFG)
        assert batch["rule_pass"][i] == r["rule_pass"]
        assert batch["rule_score"][i] == r["rule_score"]
        assert batch["rule_error"][i] == r["rule_error"]
