"""Blocked Bloom filter over 64-bit content hashes — the seen-side
PREFILTER for incremental-ingestion dedup at corpus scale.

Plain Bloom filters scatter one key's k probes across the whole bit array,
so a distributed build cannot co-locate a key's updates. A BLOCKED Bloom
(Putze/Sanders/Singler 2007, "Cache-, hash- and space-efficient bloom
filters") confines each key to one 512-bit block: key → block via one hash,
k probe bits within the block via double hashing. All of a key's bit
updates then live in 8 consecutive uint64 words, which makes the build a
standard hash-shard groupby (each shard owns a word RANGE) and the probe a
single cache line per key. The price is a modestly higher false-positive
rate than an ideal Bloom at the same bits/key (~2-3×) — measured, not
assumed, in tests.

False positives mean a Bloom can NEVER decide "duplicate" on its own for
dedup (a false positive would silently drop new data). The engine uses it
only as a prefilter: "not in Bloom" is definitive (no false negatives) and
skips the expensive exact path; "possibly in Bloom" routes to exact
verification. Output stays bit-exact; the Bloom only shrinks the exact
anti-join's left side to the candidate subset.

Everything is vectorized numpy on uint64 with natural mod-2^64 wraparound;
no Python per key.
"""

from __future__ import annotations

import numpy as np

BLOCK_WORDS = 8          # 512-bit blocks = one cache line
BLOCK_BITS = BLOCK_WORDS * 64

_MIX1 = np.uint64(0x9E3779B97F4A7C15)   # golden-ratio split-mix multipliers
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _mix(u: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates the int64 content hashes."""
    u = (u ^ (u >> np.uint64(30))) * _MIX2
    u = (u ^ (u >> np.uint64(27))) * _MIX3
    return u ^ (u >> np.uint64(31))


def _probe_words_masks(hashes: np.ndarray, n_blocks: int, k: int):
    """For each key: its k (global word index, bit mask) updates, flattened
    — shape (n*k,). Deterministic pure function of (hash, n_blocks, k)."""
    u = _mix(hashes.astype(np.int64).view(np.uint64))
    block = (u * _MIX1) % np.uint64(n_blocks)
    # in-block probe params must come from HIGH product bits: (x*C) % 512
    # depends only on x's low 9 bits, which would give every key sharing
    # low bits an identical probe pattern (catastrophic FP clustering)
    step = ((u * _MIX2) >> np.uint64(40)) | np.uint64(1)  # odd → all residues
    base = (u * _MIX3) >> np.uint64(40)
    words = np.empty(len(u) * k, dtype=np.int64)
    masks = np.empty(len(u) * k, dtype=np.uint64)
    for i in range(k):
        bit = (base + np.uint64(i) * step) % np.uint64(BLOCK_BITS)
        w = block * np.uint64(BLOCK_WORDS) + (bit >> np.uint64(6))
        words[i::k] = w.astype(np.int64)
        masks[i::k] = np.uint64(1) << (bit & np.uint64(63))
    return words, masks


def batch_word_updates(hashes: np.ndarray, n_blocks: int, k: int):
    """Pre-OR a batch's probe updates per word (the partial-aggregate before
    the shuffle): returns (unique word indices, OR-ed masks) — at most
    min(n*k, 8*distinct blocks) rows leave the batch."""
    if len(hashes) == 0:
        return (np.array([], dtype=np.int64), np.array([], dtype=np.uint64))
    words, masks = _probe_words_masks(hashes, n_blocks, k)
    order = np.argsort(words, kind="stable")
    words, masks = words[order], masks[order]
    bounds = np.flatnonzero(np.diff(words)) + 1
    starts = np.concatenate(([0], bounds))
    out_words = words[starts]
    out_masks = np.bitwise_or.reduceat(masks, starts)
    return out_words, out_masks


class BlockedBloom:
    """The assembled filter: ``words`` is the full uint64 bit array
    (n_blocks * BLOCK_WORDS words). Probe with :meth:`contains`."""

    def __init__(self, n_blocks: int, k: int, words: np.ndarray):
        assert len(words) == n_blocks * BLOCK_WORDS
        self.n_blocks = int(n_blocks)
        self.k = int(k)
        self.words = words

    @classmethod
    def build_local(cls, hashes: np.ndarray, n_blocks: int, k: int = 7):
        """Single-machine build (tests / small seen sides); the distributed
        build lives in stages/dedup_stage.py:build_bloom."""
        words = np.zeros(n_blocks * BLOCK_WORDS, dtype=np.uint64)
        w, m = batch_word_updates(np.asarray(hashes, dtype=np.int64),
                                  n_blocks, k)
        np.bitwise_or.at(words, w, m)
        return cls(n_blocks, k, words)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = POSSIBLY present (verify exactly),
        False = DEFINITELY absent. No Python per key."""
        hashes = np.asarray(hashes, dtype=np.int64)
        words, masks = _probe_words_masks(hashes, self.n_blocks, self.k)
        hit = (self.words[words] & masks) == masks
        return hit.reshape(len(hashes), self.k).all(axis=1)


def n_blocks_for(n_keys: int, bits_per_key: int = 16) -> int:
    """Size the filter: total bits ≈ n_keys * bits_per_key, in whole
    blocks, minimum one block."""
    return max(1, int(-(-n_keys * bits_per_key // BLOCK_BITS)))
