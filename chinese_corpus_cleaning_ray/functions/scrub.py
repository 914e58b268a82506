"""Sensitive-word scrubbing — a char-trie (DFA) filter with the exact match
semantics of the reference (ref:text_quality_filter/utils/sensitive_filter.py).

Semantics that the byte-exact scrub gate depends on (ref:sensitive_filter.py:72-104):

- the WHOLE message is lowercased first; non-matching characters are emitted
  from the lowercased message, so the output is entirely lowercase
  (ref:sensitive_filter.py:82).
- scanning is left-to-right from each start position; the SHORTEST complete
  word wins (the walk stops the first time it steps into a terminal node —
  ref:sensitive_filter.py:91-96).
- a match of length L is replaced by ``repl * L`` and scanning resumes
  immediately after the matched span (ref:sensitive_filter.py:94-96,102).
- a walk that runs out of trie (or out of message) without completing a word
  emits ONE character and advances one position — so a word that is a strict
  prefix of an entry does not get scrubbed (the ``add("1989年")`` /
  ``filter("1989")`` regression, ref:filter.py:162-165).

The implementation is our own: a nested-dict trie plus a regex "candidate
jump" — positions whose character cannot start any word are copied wholesale
via one C-level regex search instead of a per-char Python loop. This changes
nothing semantically (those positions emit their own lowercased char either
way) and makes clean text nearly free.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

_TERM = "\x00"  # terminal marker key (same sentinel idea as ref:sensitive_filter.py:17)


class DFAScrubber:
    """Trie-based scrub/detect/count with reference-identical semantics."""

    def __init__(self, words: Iterable[str] = ()):
        self.root: dict = {}
        for w in words:
            self.add(w)
        self._candidate_re: re.Pattern | None = None

    def add(self, word: str) -> None:
        # lowercase then strip — ref:sensitive_filter.py:25-27
        chars = word.lower().strip()
        if not chars:
            return
        node = self.root
        for ch in chars:
            node = node.setdefault(ch, {})
        node[_TERM] = True
        self._candidate_re = None

    def parse_list(self, words: Iterable[str]) -> None:  # ref:sensitive_filter.py:63-70
        for w in words:
            self.add(w)

    def parse_file(self, path: str) -> None:  # ref:sensitive_filter.py:46-61
        with open(path, encoding="utf-8") as f:
            for line in f:
                self.add(line.strip())

    # -- internal ---------------------------------------------------------

    def _candidates(self) -> re.Pattern | None:
        """Character class of all possible first chars, for the jump scan."""
        if self._candidate_re is None and self.root:
            cls = "".join(re.escape(c) for c in sorted(self.root))
            self._candidate_re = re.compile(f"[{cls}]")
        return self._candidate_re

    def _match_at(self, msg: str, start: int) -> int:
        """Length of the shortest word starting at ``start``; 0 if none."""
        node = self.root.get(msg[start])
        if node is None:
            return 0
        if _TERM in node:
            return 1
        i = start + 1
        n = len(msg)
        while i < n:
            node = node.get(msg[i])
            if node is None:
                return 0
            if _TERM in node:
                return i - start + 1
            i += 1
        return 0  # ran out of message mid-word — no match (for-else branch, ref::100-101)

    # -- public API -------------------------------------------------------

    def filter(self, message: str, repl: str = "*") -> str:
        """Scrub: lowercased text with every shortest match starred — byte-exact
        vs ref:sensitive_filter.py:72-104."""
        msg = message.lower()
        cand = self._candidates()
        if cand is None:
            return msg
        out: list[str] = []
        start, n = 0, len(msg)
        while start < n:
            m = cand.search(msg, start)
            if m is None:
                out.append(msg[start:])
                break
            pos = m.start()
            if pos > start:
                out.append(msg[start:pos])
            L = self._match_at(msg, pos)
            if L:
                out.append(repl * L)
                start = pos + L
            else:
                out.append(msg[pos])
                start = pos + 1
        return "".join(out)

    def detect(self, message: str) -> list[str]:
        """All (non-overlapping, shortest-first) matches, as lowercased slices —
        ref:sensitive_filter.py:106-134."""
        msg = message.lower()
        cand = self._candidates()
        if cand is None:
            return []
        found: list[str] = []
        start, n = 0, len(msg)
        while start < n:
            m = cand.search(msg, start)
            if m is None:
                break
            pos = m.start()
            L = self._match_at(msg, pos)
            if L:
                found.append(msg[pos : pos + L])
                start = pos + L
            else:
                start = pos + 1
        return found

    def count_sensitive_words(self, message: str) -> tuple[int, list[str]]:
        """(count, words) — ref:sensitive_filter.py:136-146."""
        words = self.detect(message)
        return len(words), words
