"""Language-ID heuristic pins + text-cleaning kernels."""

import pytest

from chinese_corpus_cleaning_ray.functions.langid import HeuristicLangId
from chinese_corpus_cleaning_ray.functions import textclean as tc


@pytest.fixture(scope="module")
def lid():
    return HeuristicLangId()


def test_short_circuit_len(lid):
    # ref:tool.py:17-18 — texts under 10 chars never classify
    assert lid.predict("短文本") == ("und", 0.0, False)
    assert lid.predict("") == ("und", 0.0, False)


def test_whitespace_only(lid):
    assert lid.predict(" " * 20) == ("und", 0.0, False)


def test_chinese_text(lid):
    lang, conf, is_zh = lid.predict("清晨的阳光洒在湖面上微风吹过泛起层层涟漪")
    assert lang == "zh" and conf == 1.0 and is_zh


def test_english_text(lid):
    lang, conf, is_zh = lid.predict("The quick brown fox jumps over the lazy dog")
    assert lang == "other" and conf == 0.0 and not is_zh


def test_mixed_below_threshold(lid):
    # zh majority but below the 0.7 confidence bar → lang zh, is_zh False
    text = "这是中文内容 with quite a lot of English words mixed in here 再加一点中文"
    lang, conf, is_zh = lid.predict(text)
    assert lang == "zh" if conf >= 0.5 else "other"
    assert is_zh == (lang == "zh" and conf >= 0.7)


def test_clean_text_ws():
    # ref:tool.py:8-14
    assert tc.clean_text_ws("  a\n\nb\tc  ") == "a b c"
    assert tc.clean_text_ws("x\x00y\x07z") == "xyz"


def test_clean_text_strict_allowlist():
    # ref:clear_redundancy.py:15-51 — drops chars outside the allowlist
    out = tc.clean_text_strict("中文abc123±§漢")
    assert out == "中文abc123漢"


def test_ppl_preprocess():
    # ref:lmppl_perplexity.py:92-125
    assert tc.ppl_preprocess("看看 https://x.example.com/a 吧!!!") == "看看 [URL] 吧!"
    assert tc.ppl_preprocess("等等......") == "等等..."


def test_extract_meaningful_segments():
    # ≤3 sentences → plain truncation; else 2 per third — ref:lmppl_perplexity.py:127-154
    short = "句子一。句子二。"
    assert tc.extract_meaningful_segments(short, 500) == short
    sents = [f"第{i}句内容充实" for i in range(12)]
    text = "。".join(sents) + "。"
    out = tc.extract_meaningful_segments(text, 500)
    assert out.count("。") == 5  # 6 sentences joined by 。
    assert out.startswith("第0句")


def test_spam_patterns():
    # ref:lmppl_perplexity.py:156-189
    assert tc.has_spam_patterns("高清视频在线播放不卡")
    assert tc.has_spam_patterns("a|b|c|d|e|f")
    assert tc.has_spam_patterns("。。。。。正常字。。。。。")  # punct ratio > 0.15
    assert not tc.has_spam_patterns("这是一段完全正常的叙述文字没有任何垃圾特征")


def test_remove_long_repeats():
    base = "这一段足够长的内容会在文本中重复出现超过二十一个字符的长度限制"
    s = "开头" + base + "中间" + base + "结尾"
    out = tc.remove_long_repeated_substrings(s)
    assert out.startswith("开头" + base)
    assert len(out) < len(s)
    assert "结尾" in out
    # short texts untouched
    assert tc.remove_long_repeated_substrings("短文本") == "短文本"


def test_predict_batch_matches_scalar(lid, sample_texts):
    res = lid.predict_batch(sample_texts)
    for i, t in enumerate(sample_texts):
        lang, conf, z = lid.predict(t)
        assert res["lang"][i] == lang and res["is_zh"][i] == z
        assert res["lang_conf"][i] == conf
