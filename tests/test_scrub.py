"""DFA scrub/detect vs oracle; reference regression cases."""

from chinese_corpus_cleaning_ray.functions.scrub import DFAScrubber

import oracle_ref as o


def make(words):
    return DFAScrubber(words), o.build_trie(list(words))


def test_prefix_regression_1989():
    # ref:filter.py:162-165 — adding 1989年 must not scrub bare "1989"
    dfa, trie = make(["1989年"])
    assert dfa.filter("1989") == "1989"
    assert dfa.filter("那年是1989年啊") == "那年是*****啊"
    assert o.o_scrub(trie, "1989") == "1989"


def test_lowercasing_semantics():
    dfa, trie = make(["spamword"])
    out = dfa.filter("Hello SpamWord World")
    # whole message is lowercased, match starred — ref:sensitive_filter.py:82
    assert out == "hello ******** world"
    assert out == o.o_scrub(trie, "Hello SpamWord World")


def test_shortest_match_wins():
    dfa, trie = make(["色情", "色情网站"])
    assert dfa.filter("访问色情网站被拦截") == "访问**网站被拦截"
    assert o.o_scrub(trie, "访问色情网站被拦截") == "访问**网站被拦截"


def test_single_char_word():
    dfa, trie = make(["赌"])
    assert dfa.filter("赌博有害") == "*博有害"
    assert o.o_scrub(trie, "赌博有害") == o.o_scrub(trie, "赌博有害")


def test_resume_after_match():
    dfa, trie = make(["ab"])
    assert dfa.filter("ababab") == "******"
    assert dfa.filter("aab") == "a**"
    assert o.o_scrub(trie, "aab") == "a**"


def test_word_prefix_no_partial_scrub():
    dfa, trie = make(["abc"])
    # "ab" walks into the trie and dies at end-of-string → emit one char, advance
    assert dfa.filter("ab") == "ab"
    assert o.o_scrub(trie, "ab") == "ab"
    assert dfa.filter("abx") == "abx"
    assert o.o_scrub(trie, "abx") == "abx"


def test_detect_returns_lowercased_slices():
    dfa, trie = make(["特价", "promo2026"])
    words = dfa.detect("今日特价 PROMO2026 特价再临")
    assert words == ["特价", "promo2026", "特价"]
    assert words == o.o_detect(trie, "今日特价 PROMO2026 特价再临")


def test_scrub_idempotent(wordlist, sample_texts):
    dfa = DFAScrubber(wordlist)
    for text in sample_texts[:100]:
        once = dfa.filter(text)
        assert dfa.filter(once) == once


def test_full_wordlist_matches_oracle(wordlist, sample_texts):
    dfa = DFAScrubber(wordlist)
    trie = o.build_trie(wordlist)
    for text in sample_texts:
        assert dfa.filter(text) == o.o_scrub(trie, text)
        assert dfa.detect(text) == o.o_detect(trie, text)


def test_empty_inputs(wordlist):
    dfa = DFAScrubber(wordlist)
    assert dfa.filter("") == ""
    assert dfa.detect("") == []
    empty = DFAScrubber([])
    assert empty.filter("任何文本") == "任何文本"
    assert empty.detect("任何文本") == []
