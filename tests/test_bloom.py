"""Blocked Bloom filter: no false negatives ever, measured FP rates, the
low-bit clustering regression, distributed-vs-local build equality, and the
bloom dedup strategy's bit-identity with the exact path."""

from __future__ import annotations

import numpy as np
import pytest

from chinese_corpus_cleaning_ray.functions.bloom import (
    BlockedBloom,
    n_blocks_for,
)


def test_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(3)
    seen = rng.integers(-2**62, 2**62, 100_000, dtype=np.int64)
    probe = np.setdiff1d(
        rng.integers(-2**62, 2**62, 100_000, dtype=np.int64), seen)
    bf = BlockedBloom.build_local(seen, n_blocks_for(len(seen), 16), k=7)
    assert bf.contains(seen).all()          # a Bloom NEVER false-negatives
    assert bf.contains(probe).mean() < 0.01  # ~0.2% measured at 16 bits/key


def test_low_bit_clustering_regression():
    """Keys sharing LOW bits (sequential ids × stride) must not share probe
    patterns — the original % 512 derivation collapsed to the low 9 bits
    and FP exploded to >10%."""
    seen = (np.arange(100_000, dtype=np.int64) * 512)      # identical low 9 bits
    probe = (np.arange(100_000, 200_000, dtype=np.int64) * 512)
    bf = BlockedBloom.build_local(seen, n_blocks_for(len(seen), 16), k=7)
    assert bf.contains(seen).all()
    assert bf.contains(probe).mean() < 0.01


def test_degenerate_sizes():
    bf = BlockedBloom.build_local(np.array([5], dtype=np.int64),
                                  n_blocks_for(1, 16), k=7)
    assert bf.contains(np.array([5], dtype=np.int64)).all()
    assert bf.n_blocks >= 1
    empty = BlockedBloom.build_local(np.array([], dtype=np.int64), 4, k=7)
    assert not empty.contains(np.array([1, 2, 3], dtype=np.int64)).any()


@pytest.mark.usefixtures("ray_session")
def test_distributed_build_equals_local():
    import pyarrow as pa
    import ray.data

    from chinese_corpus_cleaning_ray.stages.dedup_stage import build_bloom

    rng = np.random.default_rng(9)
    hashes = rng.integers(-2**62, 2**62, 50_000, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"text_hash": pa.array(hashes, pa.int64())})).repartition(9)
    # small target_words_per_shard to force several blob segments
    dist = build_bloom(ds, n_keys_hint=len(hashes), bits_per_key=16, k=7,
                       target_words_per_shard=1024)
    local = BlockedBloom.build_local(hashes, n_blocks_for(len(hashes), 16), k=7)
    assert dist.n_blocks == local.n_blocks and dist.k == local.k
    assert np.array_equal(dist.words, local.words)


@pytest.mark.usefixtures("ray_session")
def test_bloom_strategy_bit_identical_to_exact():
    import ray.data

    from chinese_corpus_cleaning_ray.stages.dedup_stage import dedup_against_corpus

    seen_rows = [{"doc_id": i, "text": f"committed doc {i % 40}"}
                 for i in range(100)]
    new_rows = ([{"doc_id": 1000 + i, "text": f"committed doc {i}"}   # dups of seen
                 for i in range(40)]
                + [{"doc_id": 2000 + i, "text": f"fresh doc {i % 30}"}  # intra-dups
                   for i in range(60)])
    seen = ray.data.from_items(seen_rows)
    new = ray.data.from_items(new_rows)

    exact, _ = dedup_against_corpus(new, seen, id_col="doc_id")
    bloom, _ = dedup_against_corpus(new, seen, id_col="doc_id",
                                    strategy="bloom")
    e = sorted(exact.to_pandas()["doc_id"])
    b = sorted(bloom.to_pandas()["doc_id"])
    assert e == b
    assert e == [2000 + i for i in range(30)]  # first of each fresh text
