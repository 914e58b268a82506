"""Word-list loading and merging.

The reference ships 16 txt lists merged into a 43,378-entry
``all_sensitive_words.txt`` by a build step (one word per line, utf-8,
union + dedupe + sort — ref:text_quality_filter/utils/merge_all_sensitive_words.py:33-71)
and loads it once per process (ref:feature_words.py:131-142). We ship a small
authored list with the same format at
``chinese_corpus_cleaning_ray/data/feature_words.txt`` (includes the
``1989年`` prefix-regression entry of ref:filter.py:162-165) and reproduce the
merge tool for production-format lists.
"""

from __future__ import annotations

import os

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
DEFAULT_WORDLIST = os.path.join(_DATA_DIR, "feature_words.txt")


def load_words(path: str | None = None) -> list[str]:
    """One word per line, blank lines skipped — ref:feature_words.py:131-142.
    Returns a sorted, deduplicated list (stable across runs)."""
    path = path or DEFAULT_WORDLIST
    words: set[str] = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            w = line.strip()
            if w:
                words.add(w)
    return sorted(words)


def synthesize_wordlist(n: int = 43_378, seed: int = 42,
                        latin_fraction: float = 0.05) -> list[str]:
    """Deterministic synthetic word list at the reference's production scale
    (43,378 merged entries — ref:merge_all_sensitive_words.py:33-71 over 16
    lists). Used to size/benchmark trie build and scrub cost without shipping
    any real sensitive-word content: words are 2–6 char draws from a fixed
    CJK code-point pool (plus a small latin tail), unioned + sorted exactly
    like the production merge output."""
    import random

    rng = random.Random(seed)
    pool = [chr(cp) for cp in range(0x4E00, 0x4E00 + 2048)]
    latin = "abcdefghijklmnopqrstuvwxyz"
    words: set[str] = set()
    while len(words) < n:
        if rng.random() < latin_fraction:
            words.add("".join(rng.choice(latin) for _ in range(rng.randint(4, 10))))
        else:
            words.add("".join(rng.choice(pool) for _ in range(rng.randint(2, 6))))
    return sorted(words)


def merge_wordlists(paths: list[str], out_path: str, sort: bool = True) -> int:
    """Union + dedupe (+ sort) of many lists into one —
    ref:merge_all_sensitive_words.py:33-71. Returns the entry count."""
    words: set[str] = set()
    for p in paths:
        words.update(load_words(p))
    ordered = sorted(words) if sort else list(words)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(ordered) + "\n")
    return len(ordered)
