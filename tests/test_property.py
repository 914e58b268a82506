"""Property-based tests (hypothesis) over the pure kernels — invariants that
hold for ALL inputs, beyond the fixture-based parity suites."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# mixed CJK + latin + whitespace + punctuation alphabet
_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4E80),
        st.characters(min_codepoint=32, max_codepoint=126),
        st.sampled_from("\n\t，。！？"),
    ),
    max_size=400,
)
_WORD = st.text(
    alphabet=st.characters(min_codepoint=0x4E00, max_codepoint=0x4E40),
    min_size=2, max_size=5,
)


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, words=st.lists(_WORD, min_size=1, max_size=8, unique=True))
def test_scrub_length_preserving_and_complete(text, words):
    from chinese_corpus_cleaning_ray.functions.scrub import DFAScrubber

    dfa = DFAScrubber(words)
    out = dfa.filter(text)
    low = text.lower()  # reference semantics: whole output is lowercased
    assert len(out) == len(low)                  # '*' per masked char
    assert dfa.detect(out) == []                 # no hit survives the scrub
    assert dfa.filter(out) == out                # idempotent
    # every differing position is a mask char; untouched positions are the
    # lowercased original
    assert all(o == "*" or o == l for o, l in zip(out, low))


@settings(max_examples=60, deadline=None)
@given(text=_TEXT)
def test_clean_text_ws_idempotent(text):
    from chinese_corpus_cleaning_ray.functions.textclean import clean_text_ws

    once = clean_text_ws(text)
    assert clean_text_ws(once) == once


@settings(max_examples=60, deadline=None)
@given(xs=st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=50))
def test_popcount64_matches_python(xs):
    from chinese_corpus_cleaning_ray.functions.dedup import popcount64

    arr = np.array(xs, dtype=np.uint64)
    assert popcount64(arr).tolist() == [bin(x).count("1") for x in xs]


@settings(max_examples=40, deadline=None)
@given(text=_TEXT, k=st.integers(min_value=2, max_value=6))
def test_char_shingles_bounds_and_determinism(text, k):
    from chinese_corpus_cleaning_ray.functions.dedup import char_shingles

    sh = char_shingles(text, k)
    assert len(sh) == len(set(sh.tolist()))               # distinct
    # shorter-than-k texts hash as ONE whole-text shingle (documented)
    bound = max(0, len(text) - k + 1) if len(text) >= k else (1 if text else 0)
    assert len(sh) <= max(bound, 1 if text else 0)
    assert np.array_equal(sh, char_shingles(text, k))     # deterministic


@settings(max_examples=30, deadline=None)
@given(a=_TEXT, b=_TEXT)
def test_minhash_identity_and_symmetry(a, b):
    from chinese_corpus_cleaning_ray.functions.dedup import MinHasher, char_shingles, jaccard

    h = MinHasher(num_perm=32, seed=1)
    sa, sb = char_shingles(a, 3), char_shingles(b, 3)
    siga = h.signatures_batch([sa, sa, sb])
    assert np.array_equal(siga[0], siga[1])               # same text → same sig
    assert 0.0 <= jaccard(sa, sb) <= 1.0
    assert jaccard(sa, sb) == jaccard(sb, sa)
    if sa.size:
        assert jaccard(sa, sa) == 1.0


@settings(max_examples=60, deadline=None)
@given(text=_TEXT)
def test_remove_long_repeats_idempotent_and_shrinking(text):
    from chinese_corpus_cleaning_ray.functions.textclean import (
        remove_long_repeated_substrings,
    )

    once = remove_long_repeated_substrings(text)
    assert len(once) <= len(text)
    assert remove_long_repeated_substrings(once) == once


@settings(max_examples=80, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                    max_size=200, unique=True))
def test_lcg_sample_monotone_in_pct(ids):
    """sample_by_hash's LCG cut is nested: keep(pct) ⊆ keep(pct') for
    pct ≤ pct'; 0 keeps nothing, 100 keeps everything."""
    mod, mult, inc = 2147483648, 1103515245, 12345
    h = [((i % mod) * mult + inc) % mod % 100 for i in ids]
    prev: set[int] = set()
    for pct in (0, 10, 45, 100):
        cur = {i for i, hv in zip(ids, h) if hv < pct}
        assert prev <= cur
        prev = cur
    assert prev == set(ids)  # pct=100


@settings(max_examples=40, deadline=None)
@given(base=st.text(alphabet=st.characters(min_codepoint=0x4E00,
                                           max_codepoint=0x4E80),
                    min_size=64, max_size=200),
       suffix=st.text(alphabet=st.characters(min_codepoint=0x4E00,
                                             max_codepoint=0x4E80),
                      max_size=100))
def test_winnow_fingerprint_monotone_under_append(base, suffix):
    """Window starts are absolute (0, 32, 64, …), so every full window of
    ``base`` is also a window of ``base+suffix`` — the min-MD5 fingerprint
    can only decrease (or stay) as text is appended."""
    import hashlib

    def fp(t, window=64, stride=32):
        starts = range(0, max(len(t) - window + 1, 1), stride)
        return min(hashlib.md5(t[i : i + window].encode()).hexdigest()
                   for i in starts)

    assert fp(base + suffix) <= fp(base)


@settings(max_examples=60, deadline=None)
@given(text=_TEXT)
def test_ppl_segment_extract_bounded(text):
    from chinese_corpus_cleaning_ray.functions.textclean import (
        extract_meaningful_segments,
    )

    out = extract_meaningful_segments(text, 500)
    assert len(out) <= 500 + 1  # ref semantics allow one joining separator


@settings(max_examples=60, deadline=None)
@given(text=_TEXT)
def test_rule_error_iff_empty(text):
    from chinese_corpus_cleaning_ray.config import RuleConfig
    from chinese_corpus_cleaning_ray.functions.rules import evaluate_rules_batch

    rb = evaluate_rules_batch([text], RuleConfig())
    assert rb["rule_error"][0] == (text == "")
    assert 0.0 <= rb["rule_score"][0] <= 1.0
