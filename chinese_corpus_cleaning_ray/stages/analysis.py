"""Text-analysis stages: token counts, quality signals, fingerprints, and the
ingest normalizers (HTML strip / clean / long-repeat removal) as batch
transforms. These correspond to SURVEY §2.2 M1-M4/M20 plus the added
training-data bookkeeping ops (tokens/fingerprints)."""

from __future__ import annotations

import pyarrow as pa

from chinese_corpus_cleaning_ray.functions.dedup import rolling_fingerprint, simhash64
from chinese_corpus_cleaning_ray.functions.textclean import (
    clean_text_strict,
    clean_text_ws,
    remove_long_repeated_substrings,
)
from chinese_corpus_cleaning_ray.functions.tokens import (
    bpe_token_count,
    quality_signals,
    ws_token_count,
)


def add_token_stats(ds, text_col: str = "text"):
    """ws_tokens, bpe_tokens, n_chars, punct_ratio, stopword_ratio columns."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ws = [ws_token_count(t) for t in texts]
        bpe = [bpe_token_count(t) for t in texts]
        sigs = [quality_signals(t) for t in texts]
        batch = batch.append_column("ws_tokens", pa.array(ws, pa.int64()))
        batch = batch.append_column("bpe_tokens", pa.array(bpe, pa.int64()))
        batch = batch.append_column("punct_ratio", pa.array([s["punct_ratio"] for s in sigs], pa.float64()))
        batch = batch.append_column("stopword_ratio", pa.array([s["stopword_ratio"] for s in sigs], pa.float64()))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def add_fingerprints(ds, text_col: str = "text", window: int = 64, simhash_k: int = 3):
    """rolling-hash doc fingerprint + 64-bit simhash columns."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        fps = [rolling_fingerprint(t, window) for t in texts]
        sh = [simhash64(t, simhash_k) for t in texts]
        batch = batch.append_column("fingerprint", pa.array(fps, pa.int64()))
        batch = batch.append_column("simhash", pa.array(sh, pa.int64()))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def add_clean_text(ds, text_col: str = "text", variant: str = "ws",
                   remove_repeats: bool = False, out_col: str = "clean_text"):
    """M1/M2 normalizers (+ optional M20 ≥21-char repeat removal) as a column."""
    clean = clean_text_ws if variant == "ws" else clean_text_strict

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out = [clean(t) for t in texts]
        if remove_repeats:
            out = [remove_long_repeated_substrings(t) for t in out]
        return batch.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def segment_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                      max_chars: int = 512):
    """One row per chunk: (id_col, chunk_idx, text) — the embedding-prep
    chunking step (native M22 replacement; see functions.textclean.chunk_text).
    flat_map-shaped via map_batches so output stays columnar Arrow."""
    import pyarrow as pa

    from chinese_corpus_cleaning_ray.functions.textclean import chunk_text

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_idx, out_text = [], [], []
        for i, t in zip(ids, texts):
            for j, c in enumerate(chunk_text(t, max_chars)):
                out_id.append(i)
                out_idx.append(j)
                out_text.append(c)
        return pa.table({
            id_col: pa.array(out_id, batch.schema.field(id_col).type),
            "chunk_idx": pa.array(out_idx, pa.int32()),
            "text": pa.array(out_text, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def strip_html_text(html: str) -> str:
    """Scalar HTML→text (ref:tool.py:38-63 semantics): bs4 when available,
    regex tag stripper fallback. Row-local helper for task-side sinks; the
    Dataset-level variant is ``strip_html``."""
    import re

    if not html:
        return ""
    try:
        from bs4 import BeautifulSoup  # optional

        soup = BeautifulSoup(html, "html.parser")
        for el in soup(["script", "style", "meta", "noscript", "header", "footer", "nav"]):
            el.extract()
        return clean_text_ws(soup.get_text(separator=" "))
    except ImportError:
        script_re = re.compile(
            r"<(script|style|meta|noscript|header|footer|nav)\b[^>]*>.*?</\1>",
            re.IGNORECASE | re.DOTALL,
        )
        return clean_text_ws(re.sub(r"<[^>]+>", " ", script_re.sub(" ", html)))


def strip_html(ds, html_col: str = "text", out_col: str = "clean_text",
               drop_tags: bool = True):
    """ref:tool.py:38-63 — bs4 HTML strip; gated behind an import-try since
    bs4 may be absent. Falls back to a regex tag stripper (documented
    approximation) when bs4 is unavailable."""
    import re

    tag_re = re.compile(r"<[^>]+>")
    script_re = re.compile(
        r"<(script|style|meta|noscript|header|footer|nav)\b[^>]*>.*?</\1>",
        re.IGNORECASE | re.DOTALL,
    )

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(html_col).to_pylist()
        out = []
        try:
            from bs4 import BeautifulSoup  # optional

            for t in texts:
                if not t:
                    out.append("")
                    continue
                soup = BeautifulSoup(t, "html.parser")
                if drop_tags:
                    for el in soup(["script", "style", "meta", "noscript", "header", "footer", "nav"]):
                        el.extract()
                out.append(clean_text_ws(soup.get_text(separator=" ")))
        except ImportError:
            for t in texts:
                t = script_re.sub(" ", t or "")
                out.append(clean_text_ws(tag_re.sub(" ", t)))
        return batch.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
