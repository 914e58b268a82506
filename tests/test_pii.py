"""Structured-PII redaction: planted cases, hostile inputs, randomized
RE2-equivalence against DuckDB (the oracle's engine), and the Dataset op."""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pytest

from chinese_corpus_cleaning_ray.functions.pii import (
    PII_PATTERNS,
    redact_pii,
    redact_pii_batch,
)


def test_planted_categories():
    out = redact_pii_batch(pa.array([
        "write to a.b+c@ex-ample.co.uk today",
        "身份证号12345678901234567X留存",
        "手机13912345678联系",
        "server at 192.168.0.1:8080",
        "all: x@y.zz 13300000000 1.2.3.4 00000000000000000X",
    ]))
    assert out["redacted_text"].to_pylist() == [
        "write to <EMAIL> today",
        "身份证号<IDCARD>留存",
        "手机<PHONE>联系",
        "server at <IP>:8080",
        "all: <EMAIL> <PHONE> <IP> <IDCARD>",
    ]
    assert out["email_count"].to_pylist() == [1, 0, 0, 0, 1]
    assert out["idcard_count"].to_pylist() == [0, 1, 0, 0, 1]
    assert out["phone_count"].to_pylist() == [0, 0, 1, 0, 1]
    assert out["ipv4_count"].to_pylist() == [0, 0, 0, 1, 1]
    assert out["pii_total"].to_pylist() == [1, 1, 1, 1, 4]


def test_order_and_boundaries():
    out = redact_pii_batch(pa.array([
        # 18-digit id must NOT be half-eaten as a phone (idcard runs first)
        "13912345678901234567",  # 20 digits: no \b inside -> nothing matches
        "139123456789012345678",  # 21 digits: nothing
        "12345678901234567X",  # exactly an idcard
        "13912345678",  # exactly a phone
        "phone13912345678",  # glued to ASCII word chars: no boundary
        "1.2.3.4.5",  # leftmost ip wins, trailing .5 survives
        "a@b.c",  # TLD too short: not an email
    ]))
    assert out["redacted_text"].to_pylist() == [
        "13912345678901234567", "139123456789012345678", "<IDCARD>",
        "<PHONE>", "phone13912345678", "<IP>.5", "a@b.c",
    ]


def test_hostile_inputs():
    texts = ["", "   ", "\x00\x01", "😀" * 100, "a" * 100_000, None]
    out = redact_pii_batch(pa.array(texts, pa.string()))
    got = out["redacted_text"].to_pylist()
    assert got[:5] == texts[:5]
    assert got[5] is None  # nulls propagate
    assert out["pii_total"].to_pylist()[:5] == [0, 0, 0, 0, 0]
    assert out["pii_total"].to_pylist()[5] is None


def test_large_string_input():
    texts = pa.array(["mail x@y.zz now", "13912345678"], pa.large_string())
    out = redact_pii_batch(texts)
    assert out["redacted_text"].to_pylist() == ["mail <EMAIL> now", "<PHONE>"]


def test_randomized_duckdb_equivalence():
    """The oracle's guarantee in miniature: pyarrow and DuckDB both run RE2,
    so sequential replace + count agree byte-for-byte on adversarial text."""
    rng = random.Random(7)
    frags = ["user@ex.com", "13912345678", "10.0.0.1", "1" * 18,
             "12345678901234567X", "文本", "a b", "@", ".", "1.2",
             "x@y", "139", "...", "①", "\n", "-" * 5]
    texts = ["".join(rng.choice(frags) for _ in range(rng.randint(0, 12)))
             for _ in range(300)]
    mine = redact_pii_batch(pa.array(texts))

    con = duckdb.connect()
    expr = "t"
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            f"len(regexp_extract_all({expr}, '{pat}')) AS {name}_count")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    df = con.execute(
        f"SELECT {', '.join(counts)}, {expr} AS redacted_text "
        "FROM (SELECT unnest(?::VARCHAR[]) AS t)", [texts]).df()
    assert mine["redacted_text"].to_pylist() == df["redacted_text"].tolist()
    for name, _, _ in PII_PATTERNS:
        assert (mine[f"{name}_count"].to_pylist()
                == df[f"{name}_count"].astype(int).tolist()), name


@pytest.mark.usefixtures("ray_session")
def test_redact_pii_dataset_op():
    import ray.data

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "reach me: who@where.org or 13812345678"},
        {"doc_id": 2, "text": "clean"},
    ])
    out = redact_pii(ds).to_pandas().sort_values("doc_id")
    assert list(out["redacted_text"]) == [
        "reach me: <EMAIL> or <PHONE>", "clean"]
    assert list(out["pii_total"]) == [2, 0]
    assert str(out["email_count"].dtype) == "int64"


@pytest.mark.usefixtures("ray_session")
def test_quality_pipeline_pii_toggle():
    """enable_pii_redact appends redacted_text/pii_total AFTER the word
    scrub (the structured pass sees scrubbed_text), and the parity-bearing
    scrubbed_text column is untouched."""
    import dataclasses

    import ray.data

    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
    from chinese_corpus_cleaning_ray.pipelines.quality import build_quality_pipeline

    cfg = dataclasses.replace(DEFAULT_CONFIG, enable_pii_redact=True)
    ds = ray.data.from_items([
        {"conv_id": "c0", "turn_idx": 0,
         "text": "这是一段足够长的正常中文文本，请联系 someone@example.com 获取更多信息，质量检查应当通过。"},
    ])
    out = build_quality_pipeline(ds, cfg).to_pandas()
    assert "redacted_text" in out.columns and "pii_total" in out.columns
    assert "<EMAIL>" in out["redacted_text"].iloc[0]
    assert out["pii_total"].iloc[0] == 1
    assert "someone@example.com" in out["scrubbed_text"].iloc[0]  # untouched

    off = build_quality_pipeline(ds, DEFAULT_CONFIG).to_pandas()
    assert "redacted_text" not in off.columns


def test_url_parts_kernel():
    import pyarrow as pa

    from chinese_corpus_cleaning_ray.functions.urls import url_parts_batch

    out = url_parts_batch(pa.array([
        "https://www.example.co.uk:8080/a/b?q=1#f",
        "http://sub.site.example/page/33",
        "not a url", "", None, "https://single/",
    ], pa.string()))
    assert out["host"].to_pylist() == [
        "www.example.co.uk", "sub.site.example", "", "", "", "single"]
    assert out["domain"].to_pylist() == [
        "co.uk", "site.example", "", "", "", ""]
    assert out["path"].to_pylist() == ["/a/b", "/page/33", "", "", "", "/"]
