"""Token counting and lightweight text statistics for training-data pipelines.

No reference analogue (the reference never tokenizes); these are the standard
large-corpus bookkeeping ops the engine exposes as first-class columns:
whitespace tokens, a BPE-ish regex tokenizer (GPT-2-style word/number/punct
split), and quality-signal ratios (stopword / punctuation / length features).
"""

from __future__ import annotations

import re

_WS_TOKEN_RE = re.compile(r"\S+")
# BPE-ish pre-tokenizer: contractions, letter runs, digit runs, CJK chars one
# per token, other non-space symbols as singles.
_BPE_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+|[一-鿿]|[^\sA-Za-z0-9一-鿿]"
)
_ZH_STOPWORDS = frozenset(
    "的了是在我有和就不人都一个上也很到说要去你会着没有看好这那它他她们于对与并"
)
_PUNCT = ".。,，!！?？:：;；、\"'“”‘’()（）[]【】<>《》"


def ws_token_count(text: str) -> int:
    return sum(1 for _ in _WS_TOKEN_RE.finditer(text))


def bpe_token_count(text: str) -> int:
    return sum(1 for _ in _BPE_RE.finditer(text))


def quality_signals(text: str) -> dict[str, float]:
    """Length / punctuation / stopword features for heuristic quality scoring."""
    n = len(text)
    if n == 0:
        return {"n_chars": 0.0, "punct_ratio": 0.0, "stopword_ratio": 0.0, "mean_ws_token_len": 0.0}
    punct = sum(1 for c in text if c in _PUNCT)
    stop = sum(1 for c in text if c in _ZH_STOPWORDS)
    toks = _WS_TOKEN_RE.findall(text)
    mean_tok = sum(len(t) for t in toks) / len(toks) if toks else 0.0
    return {
        "n_chars": float(n),
        "punct_ratio": punct / n,
        "stopword_ratio": stop / n,
        "mean_ws_token_len": mean_tok,
    }
