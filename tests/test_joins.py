"""Robust manual hash_join (union + one groupby) — the Dataset.join
replacement that survives sparse/skewed sides."""

import numpy as np
import pandas as pd
import pytest


def _pdf(rows):
    return pd.DataFrame(rows)


def test_hash_join_inner_matches_pandas(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    rng = np.random.RandomState(3)
    left = [{"k": int(rng.randint(0, 40)), "lv": i} for i in range(200)]
    right = [{"k": int(k), "rv": f"r{k}"} for k in range(0, 40, 3)]
    out = hash_join(rd.from_items(left).repartition(4),
                    rd.from_items(right).repartition(2), on="k").to_pandas()
    exp = _pdf(left).merge(_pdf(right), on="k")
    key = ["k", "lv", "rv"]
    assert (out.sort_values(key).reset_index(drop=True)[key]
            .equals(exp.sort_values(key).reset_index(drop=True)[key]))


def test_hash_join_left_keeps_unmatched(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    left = [{"k": i, "lv": i * 10} for i in range(6)]
    right = [{"k": 2, "rv": "x"}, {"k": 4, "rv": "y"}]
    out = hash_join(rd.from_items(left), rd.from_items(right), on="k",
                    how="left").to_pandas().sort_values("k").reset_index(drop=True)
    assert len(out) == 6
    assert out.loc[out["k"] == 2, "rv"].iloc[0] == "x"
    assert out.loc[out["k"] == 1, "rv"].isna().all()


def test_hash_join_sparse_right_one_key(ray_session):
    """The shape that kills Dataset.join: ONE right row, many partitions."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    left = [{"k": i, "lv": i} for i in range(100)]
    right = [{"k": 37, "rv": "only"}]
    out = hash_join(rd.from_items(left).repartition(8),
                    rd.from_items(right), on="k", shards=16).to_pandas()
    assert len(out) == 1 and out["k"].iloc[0] == 37 and out["rv"].iloc[0] == "only"


def test_hash_join_suffix_collision(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    left = [{"k": 1, "v": "L"}]
    right = [{"k": 1, "v": "R"}]
    out = hash_join(rd.from_items(left), rd.from_items(right), on="k").to_pandas()
    assert out["v"].iloc[0] == "L" and out["v_r"].iloc[0] == "R"


def test_hash_join_rejects_unknown_how(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    with pytest.raises(ValueError, match="inner"):
        hash_join(rd.from_items([{"k": 1}]), rd.from_items([{"k": 1}]),
                  on="k", how="outer")


def test_hash_join_skewed_key(ray_session):
    """A hot key (half the left side) lands in one shard but stays correct."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    left = [{"k": 7 if i % 2 == 0 else i, "lv": i} for i in range(400)]
    right = [{"k": k, "rv": k * 2} for k in range(400)]
    out = hash_join(rd.from_items(left).repartition(6),
                    rd.from_items(right).repartition(6), on="k").to_pandas()
    exp = _pdf(left).merge(_pdf(right), on="k")
    assert len(out) == len(exp) == 400
    assert (out["rv"] == out["k"] * 2).all()
