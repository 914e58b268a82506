"""Crawl ingest pipeline (SURVEY §2.8 C9 — the reference's EP3 chain).

The reference runs download → subsample → convert-to-HTML as three separate
scripts over directories (ref:Crawl_Page/download_warcfile.py,
subsample_warc_warc.py, convert_warc_to_htmls.py), re-reading every archive
per step. Here the whole chain is ONE streaming Dataset plan:

    WARC shards → parse records (flat_map inside the read task)
                → HTML strip + clean (vectorized batch fn)
                → language-ID (Arrow kernels)
                → keep Chinese pages (is_zh, threshold per ref:tool.py:16)
                → write partitioned Parquet (one output dir per job)

The downloader head (sources/crawl_fetch.py) and the WARC re-writer sink
(sources/warc.py:subsample_warc) compose with this for the full EP3 surface.
"""

from __future__ import annotations

import pyarrow as pa


def build_crawl_pipeline(warc_paths, langid_cfg=None):
    """Lazy Dataset: one row per Chinese response page —
    (warc_path, record_id, target_uri, clean_text, lang, lang_conf)."""
    from chinese_corpus_cleaning_ray.config import LangIdConfig
    from chinese_corpus_cleaning_ray.functions.langid import make_langid
    from chinese_corpus_cleaning_ray.functions.textclean import (
        clean_text_ws,
        remove_long_repeated_substrings,
    )
    from chinese_corpus_cleaning_ray.sources.warc import read_warc
    from chinese_corpus_cleaning_ray.stages.analysis import strip_html_text

    cfg = langid_cfg or LangIdConfig()
    ds = read_warc(warc_paths)

    def extract(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        texts = [
            remove_long_repeated_substrings(
                clean_text_ws(strip_html_text(p.decode("utf-8", errors="ignore"))))
            for p in payloads
        ]
        batch = batch.drop_columns(["payload"])
        return batch.append_column("clean_text", pa.array(texts, pa.string()))

    def langid(batch: pa.Table) -> pa.Table:
        lid = make_langid(cfg)
        res = lid.predict_batch(batch.column("clean_text").to_pylist())
        batch = batch.append_column("lang", pa.array(res["lang"], pa.string()))
        batch = batch.append_column("lang_conf", pa.array(res["lang_conf"], pa.float64()))
        keep = pa.array(res["is_zh"], pa.bool_())
        return batch.filter(keep)

    return ds.map_batches(extract, batch_format="pyarrow").map_batches(
        langid, batch_format="pyarrow"
    )


def run_crawl_job(warc_paths, out_dir: str, langid_cfg=None) -> dict:
    """Execute the crawl pipeline and write Parquet; returns counters."""
    ds = build_crawl_pipeline(warc_paths, langid_cfg)
    ds = ds.materialize()
    n = ds.count()
    if n:
        ds.write_parquet(out_dir)
    return {"pages_kept": n, "out_dir": out_dir}


def crawl_pages_to_transcripts(pages_path, out_dir: str, ts_epoch_us: int = 0) -> str:
    """EP3 → EP1 hand-off adapter (the reference feeds convert_warc_to_htmls
    output into the text_quality_filter driver, ref:Crawl_Page/test.py →
    main.py): reshape crawl-page Parquet into the transcript schema the
    quality job consumes — one single-turn 'conversation' per page:
    (conv_id=record_id-or-uri, turn_idx=0, role='page', text=clean_text,
    tool=target_uri, ts). Streaming map_batches + write_parquet; returns
    ``out_dir``."""
    import ray.data as rd

    def reshape(batch: pa.Table) -> pa.Table:
        rid = batch.column("record_id").to_pylist()
        uri = batch.column("target_uri").to_pylist()
        conv = [r or u for r, u in zip(rid, uri)]
        n = batch.num_rows
        return pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array([0] * n, pa.int32()),
                "role": pa.array(["page"] * n, pa.string()),
                "text": batch.column("clean_text").cast(pa.string()),
                "tool": pa.array(uri, pa.string()),
                "ts": pa.array([ts_epoch_us] * n, pa.timestamp("us")),
            }
        )

    rd.read_parquet(pages_path).map_batches(
        reshape, batch_format="pyarrow"
    ).write_parquet(out_dir)
    return out_dir
