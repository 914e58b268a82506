"""asof_join / range_join — the custom join operators Ray Data lacks
(build-brief "custom operators": as-of join, range join). Both are checked
against brute-force pandas restatements on randomized inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_asof(left: pd.DataFrame, right: pd.DataFrame, on, by, how,
                tolerance=None):
    rows = []
    for _, lr in left.iterrows():
        cand = right[(right[by] == lr[by]) & right[on].notna()]
        if pd.notna(lr[on]):
            cand = cand[cand[on] <= lr[on]]
            if tolerance is not None:
                cand = cand[lr[on] - cand[on] <= tolerance]
        else:
            cand = cand.iloc[0:0]
        if len(cand):
            best = cand.loc[cand[on].idxmax()]
            rows.append({**lr.to_dict(),
                         **{c: best[c] for c in right.columns
                            if c not in (on, by)}})
        elif how == "left":
            rows.append({**lr.to_dict(),
                         **{c: None for c in right.columns
                            if c not in (on, by)}})
    return pd.DataFrame(rows)


def test_asof_join_matches_brute(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import asof_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame({
        "k": rng.randint(0, 12, 300),
        "t": rng.randint(0, 1000, 300).astype(np.int64),
        "lv": np.arange(300),
    })
    # unique (k, t) on the right (the documented determinism contract)
    right = pd.DataFrame({
        "k": rng.randint(0, 14, 200),
        "t": rng.randint(0, 1000, 200).astype(np.int64),
        "rv": np.arange(200) * 1.5,
    }).drop_duplicates(["k", "t"])
    for how in ("left", "inner"):
        out = asof_join(rd.from_pandas(left).repartition(5),
                        rd.from_pandas(right).repartition(3),
                        on="t", by="k", how=how).to_pandas()
        exp = _brute_asof(left, right, "t", "k", how)
        key = ["k", "t", "lv"]
        out = out.sort_values(key).reset_index(drop=True)
        exp = exp.sort_values(key).reset_index(drop=True)
        assert len(out) == len(exp), how
        assert out[key].equals(exp[key].astype(out[key].dtypes)), how
        pd.testing.assert_series_equal(
            out["rv"], exp["rv"].astype("float64"), check_names=False)


def test_asof_join_tolerance_and_null_on(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import asof_join

    left = pd.DataFrame({"k": [1, 1, 1, 2], "t": [10, 100, None, 50],
                         "lv": [0, 1, 2, 3]})
    right = pd.DataFrame({"k": [1, 1, 2], "t": [8, 20, None],
                          "rv": ["a", "b", "c"]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="t", by="k", how="left", tolerance=30
                    ).to_pandas().sort_values("lv").reset_index(drop=True)
    # lv=0: t=10 → rv=a (within 30); lv=1: t=100, nearest 20 is 80 back —
    # outside tolerance → null; lv=2: null t → null; lv=3: right t null → null
    assert out["rv"].tolist() == ["a", None, None, None]
    assert len(out) == 4


def test_asof_join_preserves_timestamp_dtype(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import asof_join

    ts = pa.array([1_000_000, 2_000_000, 3_000_000], pa.timestamp("us"))
    left = rd.from_arrow(pa.table({"k": [1, 1, 1], "t": [1, 2, 3],
                                   "lts": ts}))
    right = rd.from_arrow(pa.table({"k": [1], "t": [2],
                                    "rts": ts.slice(0, 1)}))
    out_t = pa.Table.from_pandas(
        asof_join(left, right, on="t", by="k").to_pandas())
    sch = asof_join(left, right, on="t", by="k").schema().base_schema
    assert sch.field("lts").type == pa.timestamp("us")
    assert sch.field("rts").type == pa.timestamp("us")
    pdf = asof_join(left, right, on="t", by="k").to_pandas()
    assert pdf.sort_values("t")["rts"].notna().tolist() == [False, True, True]
    del out_t


def _brute_range(points: pd.DataFrame, ivs: pd.DataFrame, by, how):
    rows = []
    for _, p in points.iterrows():
        cand = ivs
        if by:
            cand = cand[cand[by] == p[by]]
        if pd.notna(p["t"]):
            cand = cand[(cand["lo"] <= p["t"]) & (p["t"] <= cand["hi"])]
        else:
            cand = cand.iloc[0:0]
        if len(cand):
            for _, iv in cand.iterrows():
                rows.append({**p.to_dict(),
                             **{c: iv[c] for c in ivs.columns if c != by}})
        elif how == "left":
            rows.append({**p.to_dict(),
                         **{c: None for c in ivs.columns if c != by}})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("bucket_width", [7, 100, 5000])
def test_range_join_matches_brute_and_is_width_invariant(ray_session,
                                                         bucket_width):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import range_join

    rng = np.random.RandomState(11)
    points = pd.DataFrame({
        "k": rng.randint(0, 8, 250),
        "t": rng.randint(0, 500, 250).astype(np.int64),
        "pid": np.arange(250),
    })
    lo = rng.randint(0, 480, 60).astype(np.int64)
    ivs = pd.DataFrame({
        "k": rng.randint(0, 8, 60),
        "lo": lo,
        "hi": lo + rng.randint(0, 60, 60),
        "iid": np.arange(60),
    })
    for how in ("inner", "left"):
        out = range_join(rd.from_pandas(points).repartition(4),
                         rd.from_pandas(ivs).repartition(2),
                         point_col="t", start_col="lo", end_col="hi",
                         by="k", bucket_width=bucket_width, how=how
                         ).to_pandas()
        exp = _brute_range(points, ivs, "k", how)
        key = ["pid", "iid"]
        out = out.sort_values(key).reset_index(drop=True)
        exp = exp.sort_values(key).reset_index(drop=True)
        assert len(out) == len(exp), (how, bucket_width)
        assert out["pid"].tolist() == exp["pid"].tolist()
        assert out["iid"].astype("float64").fillna(-1).tolist() == \
            exp["iid"].astype("float64").fillna(-1).tolist()


def test_range_join_no_by_and_overlaps(ray_session):
    """Overlapping intervals multiply points; no `by` key path."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import range_join

    points = pd.DataFrame({"t": [5, 15, 99], "pid": [0, 1, 2]})
    ivs = pd.DataFrame({"lo": [0, 0, 90], "hi": [10, 20, 90],
                        "iid": [0, 1, 2]})
    out = range_join(rd.from_pandas(points), rd.from_pandas(ivs),
                     point_col="t", start_col="lo", end_col="hi",
                     bucket_width=8, how="inner").to_pandas()
    got = sorted(zip(out["pid"], out["iid"]))
    # t=5 ∈ [0,10] and [0,20]; t=15 ∈ [0,20]; t=99 matches nothing
    assert got == [(0, 0), (0, 1), (1, 1)]


def test_range_join_suffix_collision(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import range_join

    points = pd.DataFrame({"t": [5], "tag": ["p"]})
    ivs = pd.DataFrame({"lo": [0], "hi": [10], "tag": ["i"]})
    out = range_join(rd.from_pandas(points), rd.from_pandas(ivs),
                     point_col="t", start_col="lo", end_col="hi",
                     bucket_width=4).to_pandas()
    assert out["tag"].tolist() == ["p"] and out["tag_r"].tolist() == ["i"]


def test_range_join_null_points_left_semantics(ray_session):
    """how='left' keeps null-t points (null interval cols, no bucket trip);
    how='inner' drops them."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import range_join

    points = pd.DataFrame({"k": [1, 1, 2], "t": [5.0, np.nan, np.nan],
                           "pid": [0, 1, 2]})
    ivs = pd.DataFrame({"k": [1], "lo": [0], "hi": [10], "iid": [7]})
    left = range_join(rd.from_pandas(points), rd.from_pandas(ivs),
                      point_col="t", start_col="lo", end_col="hi", by="k",
                      bucket_width=100, how="left").to_pandas()
    left = left.sort_values("pid").reset_index(drop=True)
    assert left["pid"].tolist() == [0, 1, 2]
    assert left["iid"].notna().tolist() == [True, False, False]
    inner = range_join(rd.from_pandas(points), rd.from_pandas(ivs),
                       point_col="t", start_col="lo", end_col="hi", by="k",
                       bucket_width=100, how="inner").to_pandas()
    assert inner["pid"].tolist() == [0]


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_directions_match_local_merge_asof(ray_session, direction):
    """Randomized equivalence with a driver-side merge_asof for every
    direction: the distributed shard plan must be invisible."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import asof_join

    rng = np.random.RandomState(23)
    left = pd.DataFrame({
        "k": rng.randint(0, 6, 300),
        "t": rng.randint(0, 1000, 300).astype(np.int64),
        "lid": np.arange(300),
    })
    right = (pd.DataFrame({
        "k": rng.randint(0, 6, 120),
        "t": rng.randint(0, 1000, 120).astype(np.int64),
        "val": rng.randn(120),
    }).groupby(["k", "t"], as_index=False).agg(val=("val", "max")))

    out = asof_join(rd.from_pandas(left).repartition(5),
                    rd.from_pandas(right).repartition(3),
                    on="t", by="k", how="left",
                    direction=direction).to_pandas()
    exp = pd.merge_asof(left.sort_values("t", kind="mergesort"),
                        right.sort_values("t", kind="mergesort"),
                        on="t", by="k", direction=direction)
    out = out.sort_values("lid").reset_index(drop=True)
    exp = exp.sort_values("lid").reset_index(drop=True)
    assert out["lid"].tolist() == exp["lid"].tolist()
    assert np.allclose(out["val"].to_numpy(float),
                       exp["val"].to_numpy(float), equal_nan=True)


def test_asof_join_rejects_bad_direction(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import asof_join

    ds = rd.from_pandas(pd.DataFrame({"k": [1], "t": [1]}))
    with pytest.raises(ValueError, match="direction"):
        asof_join(ds, ds, on="t", by="k", direction="sideways")


def test_joins_survive_hot_key_skew(ray_session):
    """All rows on ONE by-key: the plan inflates one shard (never one Python
    group per key) and stays correct."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.joins import asof_join, range_join

    n = 20_000
    left = pd.DataFrame({"k": np.ones(n, dtype=np.int64),
                         "t": np.arange(n, dtype=np.int64),
                         "lid": np.arange(n)})
    right = pd.DataFrame({"k": [1, 1], "t": [0, 10_000],
                          "val": [1.0, 2.0]})
    out = asof_join(rd.from_pandas(left).repartition(8),
                    rd.from_pandas(right), on="t", by="k").to_pandas()
    assert len(out) == n
    assert (out.loc[out["t"] < 10_000, "val"] == 1.0).all()
    assert (out.loc[out["t"] >= 10_000, "val"] == 2.0).all()

    ivs = pd.DataFrame({"k": [1], "lo": [0], "hi": [n], "iid": [0]})
    rj = range_join(rd.from_pandas(left).repartition(8),
                    rd.from_pandas(ivs), point_col="t", start_col="lo",
                    end_col="hi", by="k", bucket_width=1000).to_pandas()
    assert len(rj) == n  # every point in the single spanning interval, once
