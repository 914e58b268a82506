"""Aho-Corasick multi-pattern matcher — the reference's alternative matching
strategy (ref:text_quality_filter/utils/feature_words.py:12-103), selected by
``use_dfa_filter=False`` (ref:config/config.py:26 defaults it to True).

Unlike the DFA scrub path (shortest, non-overlapping matches), AC reports ALL
matches including overlapping ones, as (start_pos, pattern) pairs — the parity
target is the reference's ``search`` output semantics. Implementation is our
own: flat arrays + goto/fail tables built breadth-first, not the reference's
nested-dict-with-id() structure.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterable


class AhoCorasick:
    def __init__(self, patterns: Iterable[str] = ()):
        # node storage: children dicts, fail links, output pattern lists
        self.children: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.output: list[list[str]] = [[]]
        self._built = False
        for p in patterns:
            self.add_pattern(p)

    def add_pattern(self, pattern: str) -> None:
        if not pattern:
            return
        node = 0
        for ch in pattern:
            nxt = self.children[node].get(ch)
            if nxt is None:
                nxt = len(self.children)
                self.children.append({})
                self.fail.append(0)
                self.output.append([])
                self.children[node][ch] = nxt
            node = nxt
        self.output[node].append(pattern)
        self._built = False

    def build(self) -> None:
        queue = deque()
        for child in self.children[0].values():
            self.fail[child] = 0
            queue.append(child)
        while queue:
            node = queue.popleft()
            for ch, child in self.children[node].items():
                queue.append(child)
                f = self.fail[node]
                while f and ch not in self.children[f]:
                    f = self.fail[f]
                self.fail[child] = self.children[f].get(ch, 0) if self.children[f].get(ch, 0) != child else 0
                # merge outputs along the fail chain — ref:feature_words.py:67-69
                self.output[child] = self.output[child] + self.output[self.fail[child]]
        self._built = True

    def search(self, text: str) -> list[tuple[int, str]]:
        """All (start_pos, pattern) matches, overlapping included —
        ref:feature_words.py:73-103 semantics."""
        if not self._built:
            self.build()
        results: list[tuple[int, str]] = []
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self.children[node]:
                node = self.fail[node]
            node = self.children[node].get(ch, 0)
            for pattern in self.output[node]:
                results.append((i - len(pattern) + 1, pattern))
        return results
