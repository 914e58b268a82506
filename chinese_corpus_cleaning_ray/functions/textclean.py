"""Text cleaning / normalization kernels.

Two distinct ``clean_text`` variants exist in the reference and are kept
separate on purpose (SURVEY §2.2 M1/M2):

- ``clean_text_ws`` — ref:tool.py:8-14 (collapse whitespace, strip control
  chars, strip ends). Used by language-ID preprocessing.
- ``clean_text_strict`` — ref:Crawl_Page/tools/clear_redundancy.py:15-51
  (emoji removal, hard character allowlist, collapse doubled spaces). Used by
  the crawl-ingest path.

Plus the perplexity preprocessing (ref:utils/lmppl_perplexity.py:92-125),
meaningful-segment extraction (ref::127-154), spam-pattern detection
(ref::156-189) and the ≥21-char long-repeat removal
(ref:clear_redundancy.py:104-170) re-implemented without a suffix automaton.
"""

from __future__ import annotations

import re as _re

_SENT_BOUNDARY = _re.compile(r"(?<=[。！？!?\.])")


def chunk_text(text: str, max_chars: int = 512) -> list[str]:
    """Native replacement for the reference's remote Jina segmenter
    (ref:jina/seg.py:8-22 POSTs to api.jina.ai — external demo service,
    dropped by design in SURVEY §2.2 M22): deterministic sentence-boundary
    chunking. Sentences (split after 。！？!?.) are greedily packed into
    chunks ≤ max_chars; a single sentence longer than max_chars is hard-split.
    Returns [] for empty text."""
    if not text:
        return []
    sents = [s for s in _SENT_BOUNDARY.split(text) if s]
    chunks: list[str] = []
    cur = ""
    for s in sents:
        while len(s) > max_chars:
            if cur:
                chunks.append(cur)
                cur = ""
            chunks.append(s[:max_chars])
            s = s[max_chars:]
        if len(cur) + len(s) <= max_chars:
            cur += s
        else:
            chunks.append(cur)
            cur = s
    if cur:
        chunks.append(cur)
    return chunks

import re

_WS_RE = re.compile(r"\s+")
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


def clean_text_ws(text: str) -> str:
    """ref:tool.py:8-14."""
    text = _WS_RE.sub(" ", text)
    text = _CTRL_RE.sub("", text)
    return text.strip()


_STRICT_EMOJI_RE = re.compile(
    "["
    "\U0001F300-\U0001F5FF"
    "←-⇿"
    "☀-⛿"
    "✀-➿"
    "\U0001F600-\U0001F6FF"
    "\U0001F700-\U0001F77F"
    "\U0001F900-\U0001F9FF"
    "]+"
)
_ALLOWED_PUNCT = set(" !~@#$%^&*()_+<>?:\"{}|,./;'[]\\-！￥……&*（）_+<>？：{}|，。，；【】—")
_KEEP_CHAR_RE = re.compile(r"[一-鿿A-Za-z0-9]")
_MULTISPACE_RE = re.compile(r"\s{2,}")


def clean_text_strict(text: str) -> str:
    """ref:clear_redundancy.py:15-51 — allowlist filter used by crawl ingest."""
    text = _STRICT_EMOJI_RE.sub("", text)
    kept = [c for c in text if _KEEP_CHAR_RE.match(c) or c in _ALLOWED_PUNCT]
    return _MULTISPACE_RE.sub(" ", "".join(kept)).strip()


# ---- perplexity preprocessing — ref:lmppl_perplexity.py:92-125 --------------

_URL_SUB_RE = re.compile(r"https?://\S+|www\.\S+")
_BANG_RE = re.compile(r"[!?]{2,}")
_DOTS_RE = re.compile(r"[.]{3,}")
# NOTE deliberate deviation: the reference's class ends with the range
# \U000024C2-\U0001F251 (ref:lmppl_perplexity.py:119) which swallows the ENTIRE
# CJK block — their GPT-2 preprocessing deletes all Chinese text and scores the
# ASCII/punct residue. (In the rule check the same class is harmless because it
# counts maximal runs, and we reproduce it exactly there —
# functions/rules.py:EMOJI_RE.) Our deterministic n-gram scorer must see the
# Chinese text, so this class keeps the emoji/symbol ranges but stops the last
# range at U+2757 before CJK and re-adds the enclosed-ideograph planes.
_PPL_EMOJI_RE = re.compile(
    "["
    "\U0001F600-\U0001F64F\U0001F300-\U0001F5FF\U0001F680-\U0001F6FF"
    "\U0001F700-\U0001F77F\U0001F780-\U0001F7FF\U0001F800-\U0001F8FF"
    "\U0001F900-\U0001F9FF\U0001FA00-\U0001FA6F\U0001FA70-\U0001FAFF"
    "\U00002702-\U000027B0\U000024C2-\U000024FF\U0001F100-\U0001F251]+"
)


def ppl_preprocess(text: str) -> str:
    """ref:lmppl_perplexity.py:92-125."""
    text = _WS_RE.sub(" ", text)
    text = _URL_SUB_RE.sub("[URL]", text)
    text = _BANG_RE.sub("!", text)
    text = _DOTS_RE.sub("...", text)
    return _PPL_EMOJI_RE.sub("", text)


_SENT_SPLIT_RE = re.compile(r"[。！？.!?]")


def extract_meaningful_segments(text: str, max_length: int = 500) -> str:
    """ref:lmppl_perplexity.py:127-154 — first 2 sentences of each third."""
    sentences = [s for s in _SENT_SPLIT_RE.split(text) if s.strip()]
    if len(sentences) <= 3:
        return text[:max_length]
    third = len(sentences) // 3
    selected = sentences[:third][:2] + sentences[third : 2 * third][:2] + sentences[2 * third :][:2]
    return "。".join(selected)[:max_length]


# ---- spam patterns — ref:lmppl_perplexity.py:156-189 ------------------------

SPAM_RES = [
    re.compile(p)
    for p in (
        r"\d+\s*区\s*\d+",
        r"在线\s*播放",
        r"视频\s*一区\s*二区",
        r"久久+久+",
        r"不卡\s*一区\s*二区",
        r"精品\s*视频\s*在线",
        r"日本\s*韩国\s*欧美",
        r"激情\s*小说",
        r"成人\s*视频",
        r"在线\s*观看",
        r"一本\s*道",
        r"中文\s*字幕",
    )
]
_PUNCT_CHARS = ".。,，!！?？:：;；"


def has_spam_patterns(text: str) -> bool:
    """ref:lmppl_perplexity.py:156-189. NB: the reference divides by len(text)
    unguarded; callers never pass empty text (preprocess happens first and the
    perplexity path truncates) — we return False for empty text."""
    if not text:
        return False
    if any(p.search(text) for p in SPAM_RES):
        return True
    if "|" in text and text.count("|") / len(text) > 0.01:
        return True
    punct = sum(text.count(c) for c in _PUNCT_CHARS)
    return punct / len(text) > 0.15


# ---- long-repeat removal — ref:clear_redundancy.py:104-170 ------------------

_MIN_REPEAT = 21


def remove_long_repeated_substrings(s: str, min_len: int = _MIN_REPEAT) -> str:
    """Delete 2nd+ occurrences of any repeated substring of length ≥ ``min_len``,
    keeping each first occurrence; overlapping delete intervals are merged
    (interval-merge semantics of ref:clear_redundancy.py:138-170).

    Re-expressed with a rolling-hash candidate scan instead of the reference's
    suffix automaton: for every window of exactly ``min_len`` chars that has
    appeared before, the repeated window's 2nd+ occurrences are marked for
    deletion. Extending marked windows greedily and merging adjacent intervals
    yields the same "delete later copies of long repeats" effect; exact
    interval equality with the automaton version is not label-bearing (the
    operator is an optional crawl-ingest stage, disabled in the transcript
    pipeline — SURVEY §2.2 M20).
    """
    n = len(s)
    if n < 2 * min_len:
        return s
    first_pos: dict[int, int] = {}
    to_remove: list[list[int]] = []
    h = 0
    base, mod = 1000003, (1 << 61) - 1
    pow_top = pow(base, min_len - 1, mod)
    for i, ch in enumerate(s):
        h = (h * base + ord(ch)) % mod
        if i >= min_len:
            h = (h - ord(s[i - min_len]) * pow_top * base) % mod
        if i >= min_len - 1:
            start = i - min_len + 1
            prev = first_pos.get(h)
            if prev is not None and s[prev : prev + min_len] == s[start : start + min_len]:
                if to_remove and start <= to_remove[-1][1] + 1:
                    to_remove[-1][1] = max(to_remove[-1][1], i)
                else:
                    to_remove.append([start, i])
            else:
                first_pos.setdefault(h, start)
    if not to_remove:
        return s
    pieces, idx = [], 0
    for a, b in to_remove:
        if idx < a:
            pieces.append(s[idx:a])
        idx = b + 1
    if idx < n:
        pieces.append(s[idx:])
    return "".join(pieces)
