"""Deduplication kernels: exact hashing, MinHash signatures + LSH banding,
SimHash, and n-gram Jaccard.

The reference's corpus-level near-dup detector is embedding + DBSCAN over an
O(n²) cosine matrix (ref:text_quality_filter/utils/clustering.py:68-90,
ref:utils/embed.py:58-82), disabled by default. Per the north star it is
re-expressed here as MinHash-banded LSH suitable for a groupby shuffle: the
per-row kernels below are pure; the distributed grouping lives in
stages/dedup_stage.py.

All sketch kernels are numpy-vectorized: a text's character k-shingles are
hashed in O(k) vectorized passes (polynomial rolling hash over the UTF-32
code-point array + a splitmix64-style finalizer), NOT per-shingle Python
hashing — ~50× faster on multi-hundred-char rows.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1
_POLY_BASE = np.uint64(1000003)
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)
_S33 = np.uint64(33)

_OLD_ERR = np.seterr(over="ignore")  # uint64 wraparound is intended
np.seterr(**_OLD_ERR)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche over a uint64 array (wraparound intended)."""
    with np.errstate(over="ignore"):
        x = x.copy()
        x ^= x >> _S33
        x *= _MIX1
        x ^= x >> _S33
        x *= _MIX2
        x ^= x >> _S33
    return x


def text_hash64(text: str) -> int:
    """Stable 64-bit content hash (blake2b-8) for exact dedup group keys.
    Signed int64 so it round-trips Arrow/Parquet/SQL."""
    h = hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest()
    return struct.unpack("<q", h)[0]


def text_hash64_column(col) -> np.ndarray:
    """Vectorized 64-bit content hash over an Arrow (chunked) string array —
    pandas' C siphash kernel, no per-row Python. Deterministic across
    processes (fixed default hash key), equal texts ⇒ equal hashes; a
    DIFFERENT family from :func:`text_hash64`, so consumers must hash both
    sides of any comparison with the same function (every dedup stage does —
    they all go through ``add_text_hash``). Returns int64."""
    import pandas as pd

    s = col.to_pandas() if hasattr(col, "to_pandas") else pd.Series(col)
    h = pd.util.hash_pandas_object(pd.Series(s), index=False).to_numpy()
    return h.view(np.int64)


def _codepoints(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct hashed character k-shingles as a uint64 array (vectorized).
    Texts shorter than k hash as one whole-text shingle."""
    if not text:
        return np.empty(0, dtype=np.uint64)
    codes = _codepoints(text)
    n = len(codes)
    if n < k:
        acc = np.uint64(1469598103934665603)
        with np.errstate(over="ignore"):
            for c in codes:
                acc = (acc ^ c) * _POLY_BASE
        return _mix64(np.array([acc], dtype=np.uint64))
    m = n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            acc = acc * _POLY_BASE + codes[i : m + i]
    return np.unique(_mix64(acc))


class MinHasher:
    """num_perm multiply-shift permutations h_i(x) = (a_i·x mod 2^64) >> 32
    over the mixed shingle hashes (a_i odd). No modulo — one wraparound
    multiply + shift per (perm, shingle); batched across rows with
    ``np.minimum.reduceat`` so the whole map_batches batch is a handful of
    numpy calls."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = (rng.randint(0, 1 << 63, size=num_perm).astype(np.uint64) << np.uint64(1)) | np.uint64(1)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """uint32[num_perm]; all-max for empty input."""
        return self.signatures_batch([shingles])[0]

    def signatures_batch(self, shingle_arrays: list[np.ndarray]) -> np.ndarray:
        """(n_rows, num_perm) uint32 — one reduceat pass for the whole batch."""
        sizes = np.array([a.size for a in shingle_arrays], dtype=np.int64)
        n = len(shingle_arrays)
        out = np.full((n, self.num_perm), _MAX_HASH, dtype=np.uint32)
        nonempty = np.flatnonzero(sizes > 0)
        if nonempty.size == 0:
            return out
        # chunk rows so the (P, N_chunk) intermediate stays ~32 MB
        max_shingles = max(1, (4 << 20) // self.num_perm)
        start = 0
        while start < nonempty.size:
            end = start
            total = 0
            while end < nonempty.size and (total == 0 or total + sizes[nonempty[end]] <= max_shingles):
                total += sizes[nonempty[end]]
                end += 1
            rows = nonempty[start:end]
            x = np.concatenate([shingle_arrays[i] for i in rows])
            with np.errstate(over="ignore"):
                vals = (self.a[:, None] * x[None, :]) >> np.uint64(32)  # (P, N) 32-bit domain
            offsets = np.zeros(rows.size, dtype=np.int64)
            np.cumsum(sizes[rows][:-1], out=offsets[1:])
            mins = np.minimum.reduceat(vals, offsets, axis=1)  # (P, n_rows_chunk)
            out[rows] = mins.T.astype(np.uint32)
            start = end
        return out


def band_hashes_batch(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """(n_rows, num_bands) int64 bucket keys from (n_rows, num_perm) signatures
    — one vectorized fold over the whole batch."""
    n, p = sigs.shape
    r = p // num_bands
    chunks = sigs[:, : num_bands * r].reshape(n, num_bands, r).astype(np.uint64)
    with np.errstate(over="ignore"):
        acc = np.full((n, num_bands), np.uint64(1469598103934665603))
        for j in range(r):
            acc = (acc ^ chunks[:, :, j]) * _MIX1
        acc ^= np.arange(num_bands, dtype=np.uint64)[None, :] * _MIX2
        acc = _mix64(acc.ravel()).reshape(n, num_bands)
    return acc.view(np.int64)


def band_hashes(sig: np.ndarray, num_bands: int) -> list[int]:
    """Single-row convenience wrapper over band_hashes_batch."""
    return band_hashes_batch(sig.reshape(1, -1), num_bands)[0].tolist()


_BIT_WEIGHTS = 1 << np.arange(64, dtype=np.uint64)


def simhash64(text: str, k: int = 3) -> int:
    """64-bit SimHash over character k-grams (unweighted, vectorized).
    Near-duplicates have small Hamming distance."""
    if not text:
        return 0
    grams = char_shingles(text, k)
    bits = ((grams[:, None] & _BIT_WEIGHTS[None, :]) > 0).astype(np.int32)
    acc = (2 * bits - 1).sum(axis=0)
    out = int(((acc > 0).astype(np.uint64) * _BIT_WEIGHTS).sum(dtype=np.uint64))
    return out - (1 << 64) if out >= (1 << 63) else out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over a uint64 ndarray (numpy<2 has no
    bitwise_count). Used for batched Hamming-distance matrices."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & _M1
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two distinct-shingle arrays (as from char_shingles)."""
    if a.size == 0 and b.size == 0:
        return 1.0
    if a.size == 0 or b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


def rolling_fingerprint(text: str, window: int = 64) -> int:
    """Document fingerprint: min of a rolling polynomial hash over windows
    (winnowing-lite, vectorized). Stable under small appends; signed int64."""
    if not text:
        return 0
    if len(text) <= window:
        return text_hash64(text)
    codes = _codepoints(text)
    m = len(codes) - window + 1
    acc = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(window):
            acc = acc * _POLY_BASE + codes[i : m + i]
    v = int(_mix64(acc).min())
    return v - (1 << 64) if v >= (1 << 63) else v
