"""Driver-contract self-check: every queries() entry runs at sf0.001; entries
with an oracle_sql() must match DuckDB exactly (row count, schema-shape,
values — floats bit-exact, mirroring the driver's value-hash)."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as mod

    importlib.reload(mod)
    return mod


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_match(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert len(ray_df) == len(sql_df), f"{name}: row count {len(ray_df)} != {len(sql_df)}"
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    )
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = list(a[col]), list(b[col])
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r} (float not bit-exact)"
            else:
                assert x == y or (pd.isna(x) and pd.isna(y)), f"{name}.{col}[{i}]: {x!r} != {y!r}"


def test_entry_smoke(entry_mod):
    ds = entry_mod.entry()
    df = _to_df(ds)
    assert len(df) >= 0
    assert {"conv_id", "turn_idx", "keep", "quality_score", "scrubbed_text"} <= set(df.columns)


def test_every_query_runs(entry_mod):
    qs = entry_mod.queries()
    assert len(qs) >= 15
    for name, fn in qs.items():
        df = _to_df(fn(SF_DIR))
        assert len(df) >= 0, name


def test_oracle_keys_subset(entry_mod):
    qs, sqls = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(sqls) >= 10


@pytest.mark.parametrize("name", [
    "agg_pricing_summary", "topk_users_by_events", "join_orders_by_nation",
    "events_hourly", "event_type_counts", "doc_rule_metrics", "doc_langid",
    "doc_token_stats", "doc_exact_dedup", "doc_distinct_sources", "knn_brute",
    "transcripts_rule_metrics", "transcripts_langid",
    "transcripts_conversation_stats", "events_sessionize",
    "transcripts_prefix_dedup", "transcripts_tool_stats",
    "transcripts_sft_pairs", "transcripts_context_clip",
    "transcripts_sft_pipeline", "transcripts_conv_langid",
    "transcripts_format_check",
    "transcripts_selfrep", "transcripts_conv_complete",
    "transcripts_turn_latency", "transcripts_session_split",
    "transcripts_conv_qa_gate", "transcripts_response_dedup",
    "transcripts_incr_prefix_dedup", "transcripts_profile",
    "transcripts_qa_pipeline", "transcripts_tool_latency",
])
def test_query_matches_oracle(entry_mod, con, name):
    ray_df = _to_df(entry_mod.queries()[name](SF_DIR))
    sql_df = con.execute(entry_mod.oracle_sql()[name]).df()
    assert_frames_match(ray_df, sql_df, name)
