"""Round-5 regression tests: ADVICE-r4 fixes (asof nullable-int keys,
CJK-aware shard-export token mass, atomic text-dir publication) and the
vectorized content-hash / row-key mark stages (VERDICT-r4 item 3)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_asof_join_nullable_int_on_column(ray_session):
    """ADVICE-r4: an int64 `on` with nulls on the LEFT becomes float64 in
    pandas while the null-free right stays int64 — merge_asof used to raise
    MergeError('incompatible merge keys'). Null-on left rows must bypass the
    match (null right columns) under how='left'."""
    import ray

    from chinese_corpus_cleaning_ray.stages.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a", "b"]),
        "t": pa.array([10, None, 30, 5], pa.int64()),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "b"]),
        "t": pa.array([8, 25, 100], pa.int64()),
        "r": pa.array([100, 200, 300], pa.int64()),
    }))
    out = asof_join(left, right, on="t", by="k", how="left",
                    shards=4).to_pandas().sort_values("v").reset_index(drop=True)
    assert len(out) == 4
    # v=1 (t=10) matches right t=8; v=3 (t=30) matches t=25;
    # v=2 (t=null) bypasses; v=4 (b, t=5) has no right row ≤ 5
    by_v = {int(r["v"]): r for _, r in out.iterrows()}
    assert by_v[1]["r"] == 100
    assert by_v[3]["r"] == 200
    assert pd.isna(by_v[2]["r"]) and pd.isna(by_v[2]["t"])
    assert pd.isna(by_v[4]["r"])
    # declared Arrow types survive: `t` casts back to int64-with-null
    tbl = pa.Table.from_pandas(out)
    assert out["v"].dtype == np.int64


def test_asof_join_inner_nullable_on(ray_session):
    import ray

    from chinese_corpus_cleaning_ray.stages.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a"]),
        "t": pa.array([None, 30], pa.int64()),
        "v": pa.array([1, 2], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"]),
        "t": pa.array([25], pa.int64()),
        "r": pa.array([7], pa.int64()),
    }))
    out = asof_join(left, right, on="t", by="k", how="inner",
                    shards=2).to_pandas()
    assert list(out["v"]) == [2] and list(out["r"]) == [7]


def test_export_training_shards_cjk_token_mass(ray_session, tmp_path):
    """ADVICE-r4: `\\S+` counts an unsegmented Chinese doc as ~1 token. The
    CJK-aware default must size n_shards from character mass instead."""
    import ray

    from chinese_corpus_cleaning_ray.stages.analysis import (
        export_training_shards,
    )

    rows = [{"doc_id": i, "text": "中文语料清洗引擎质量过滤" * 50}
            for i in range(40)]  # 12 CJK chars * 50 = 600 tokens per doc
    ds = ray.data.from_items(rows)
    m = export_training_shards(ds, str(tmp_path / "out"), shard_tokens=6000)
    assert m["total_tokens"] == 40 * 600
    assert m["n_shards"] == 4  # 24000 / 6000 — the \S+ proxy would give 1
    # opt-out reproduces the classic whitespace proxy
    m2 = export_training_shards(ds, str(tmp_path / "out2"),
                                shard_tokens=6000, token_pattern=r"\S+")
    assert m2["total_tokens"] == 40 and m2["n_shards"] == 1


def test_write_text_dir_atomic_publish_and_counts(ray_session, tmp_path):
    """ADVICE-r4: the overwrite probe must not materialize an empty file at
    the final path — publication is link/replace only, and counters still
    distinguish fresh writes from overwrites."""
    import ray

    from chinese_corpus_cleaning_ray.sources.textdir import write_text_dir

    out = str(tmp_path / "txt")
    rows = [{"doc_id": f"d{i}", "text": f"body {i}"} for i in range(20)]
    ds = ray.data.from_items(rows).repartition(5)
    stats = write_text_dir(ds, out).to_pandas()
    assert int(stats["files_written"].sum()) == 20
    assert int(stats["files_overwritten"].sum()) == 0
    for i in range(20):
        with open(os.path.join(out, f"d{i}.txt")) as f:
            assert f.read() == f"body {i}"
    # second run overwrites every file exactly once
    stats2 = write_text_dir(ds, out).to_pandas()
    assert int(stats2["files_overwritten"].sum()) == 20
    # no stray tmp files left behind by the link/unlink publish
    assert not [p for p in os.listdir(out) if p.endswith(".tmp")]


def test_text_hash_vectorized_consistency(ray_session):
    """Vectorized mark stage: equal texts share a hash, distinct texts don't
    (on this fixture), and both dedup sides hash identically."""
    import ray

    from chinese_corpus_cleaning_ray.stages.dedup_stage import add_text_hash

    texts = ["alpha", "beta", "alpha", "gamma", "beta", "中文文本"]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]).repartition(3)
    out = add_text_hash(ds, "text").to_pandas().sort_values("doc_id")
    h = dict(zip(out["doc_id"], out["text_hash"]))
    assert h[0] == h[2] and h[1] == h[4]
    assert len({h[0], h[1], h[3], h[5]}) == 4
    assert out["text_hash"].dtype == np.int64
    # a second independent pass (the "seen corpus" side) agrees bit-for-bit
    out2 = add_text_hash(ds, "text").to_pandas().sort_values("doc_id")
    assert list(out2["text_hash"]) == list(out["text_hash"])


def test_make_row_key_matches_python_formatter(ray_session):
    from chinese_corpus_cleaning_ray.stages.dedup_stage import make_row_key

    batch = pa.table({
        "conv_id": pa.array(["c1", "c1", "zz", "c10"]),
        "turn_idx": pa.array([0, 12, 3, 9876543], pa.int32()),
    })
    got = make_row_key(batch).column("row_key").to_pylist()
    want = [f"{c}#{t:010d}" for c, t in zip(
        batch.column("conv_id").to_pylist(),
        batch.column("turn_idx").to_pylist())]
    assert got == want
    # negative turn_idx falls back to the exact historical bytes
    nb = pa.table({"conv_id": pa.array(["c"]),
                   "turn_idx": pa.array([-5], pa.int32())})
    assert make_row_key(nb).column("row_key").to_pylist() == [f"c#{-5:010d}"]
    # empty batch round-trips
    eb = pa.table({"conv_id": pa.array([], pa.string()),
                   "turn_idx": pa.array([], pa.int32())})
    assert make_row_key(eb).num_rows == 0
