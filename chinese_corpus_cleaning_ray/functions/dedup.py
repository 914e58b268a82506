"""Deduplication kernels: exact hashing, MinHash signatures + LSH banding,
SimHash, and n-gram Jaccard.

The reference's corpus-level near-dup detector is embedding + DBSCAN over an
O(n²) cosine matrix (ref:text_quality_filter/utils/clustering.py:68-90,
ref:utils/embed.py:58-82), disabled by default. Per the north star it is
re-expressed here as MinHash-banded LSH suitable for a groupby shuffle: the
per-row kernels below are pure; the distributed grouping lives in
stages/dedup_stage.py. Per-document 13-gram duplication (ref:rule_filter.py:179-204)
stays in functions/rules.py; the ≥21-char repeat removal in functions/textclean.py.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def text_hash64(text: str) -> int:
    """Stable 64-bit content hash (blake2b-8) for exact dedup group keys.
    Signed int64 so it round-trips Arrow/Parquet/SQL."""
    h = hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest()
    return struct.unpack("<q", h)[0]


def char_shingles(text: str, k: int = 5) -> set[int]:
    """Hashed character k-shingles. Texts shorter than k yield the whole text
    as a single shingle so they still get a signature."""
    if len(text) < k:
        return {hash_shingle(text)} if text else set()
    return {hash_shingle(text[i : i + k]) for i in range(len(text) - k + 1)}


def hash_shingle(s: str) -> int:
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=4).digest()
    return struct.unpack("<I", h)[0]


class MinHasher:
    """num_perm universal-hash permutations h_i(x) = (a_i·x + b_i) mod p,
    vectorized with numpy over the shingle set."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)

    def signature(self, shingles: set[int]) -> np.ndarray:
        """uint32[num_perm]; all-max for empty input (never collides bands
        with real signatures because band hashes include the values)."""
        if not shingles:
            return np.full(self.num_perm, _MAX_HASH, dtype=np.uint32)
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
        # (num_perm, n_shingles) via broadcasting; mod Mersenne prime then fold to 32 bits
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return (vals.min(axis=1) & _MAX_HASH).astype(np.uint32)


def band_hashes(sig: np.ndarray, num_bands: int) -> list[int]:
    """Split the signature into ``num_bands`` rows-per-band chunks; hash each
    chunk to a signed int64 bucket key."""
    r = len(sig) // num_bands
    out = []
    for b in range(num_bands):
        chunk = sig[b * r : (b + 1) * r].tobytes()
        h = hashlib.blake2b(chunk, digest_size=8, salt=str(b).encode()[:16]).digest()
        out.append(struct.unpack("<q", h)[0])
    return out


def simhash64(text: str, k: int = 3) -> int:
    """64-bit SimHash over character k-grams (unweighted). Near-duplicates have
    small Hamming distance."""
    if not text:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    n = max(1, len(text) - k + 1)
    for i in range(n):
        h = hashlib.blake2b(text[i : i + k].encode("utf-8"), digest_size=8).digest()
        (v,) = struct.unpack("<Q", h)
        bits = np.unpackbits(np.frombuffer(struct.pack("<Q", v), dtype=np.uint8))
        acc += np.where(bits > 0, 1, -1)
    out = 0
    for bit in np.where(acc > 0)[0]:
        out |= 1 << int(bit)
    return out - (1 << 64) if out >= (1 << 63) else out  # signed for Arrow


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def rolling_fingerprint(text: str, window: int = 64) -> int:
    """Document fingerprint: min of a rolling polynomial hash over windows
    (winnowing-lite). Stable under small appends; signed int64."""
    if not text:
        return 0
    if len(text) <= window:
        return text_hash64(text)
    base, mod = 1000003, _MERSENNE
    pow_top = pow(base, window - 1, mod)
    h, best = 0, None
    for i, ch in enumerate(text):
        h = (h * base + ord(ch)) % mod
        if i >= window:
            h = (h - ord(text[i - window]) * pow_top * base) % mod
        if i >= window - 1:
            best = h if best is None else min(best, h)
    v = best & ((1 << 64) - 1)
    return v - (1 << 64) if v >= (1 << 63) else v
