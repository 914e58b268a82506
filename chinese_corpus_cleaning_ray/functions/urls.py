"""URL structure extraction — host / naive registrable domain / path
columns for the per-domain operations a crawl corpus needs (domain quotas,
blocklists, per-site quality stats; the crawl pipeline's pages carry a
``target_uri``, ref:`Crawl_Page/subsample_warc_warc.py` keys its output
files off the URI too).

One RE2 pass via ``pyarrow.compute.extract_regex`` (named groups → struct,
zero Python per row). Non-matching rows (not http/https, empty, garbage)
yield empty strings, never errors. DuckDB's ``regexp_extract`` runs the
same RE2 with the same groups, so the driver oracle is byte-exact.

``domain`` is the LAST TWO dot labels of the host — deliberately naive (no
public-suffix list in this environment, and none is shippable as a
constant without drift); ``co.uk`` style suffixes therefore collapse, which
is fine for quota/grouping keys and documented here rather than hidden.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

URL_PATTERN = (r"^(?P<scheme>https?)://(?P<host>[^/:?#]+)"
               r"(?::(?P<port>\d+))?(?P<path>[^?#]*)")
_DOMAIN_PATTERN = r"(?P<d>[^.]+\.[^.]+)$"


def url_parts_batch(urls: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Vectorized extraction: ``{"host", "domain", "path"}`` string arrays,
    empty string for any non-matching / null input."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ex = pc.extract_regex(urls, pattern=URL_PATTERN)
    host = pc.fill_null(pc.struct_field(ex, "host"), "")
    path = pc.fill_null(pc.struct_field(ex, "path"), "")
    dom = pc.fill_null(pc.struct_field(
        pc.extract_regex(host, pattern=_DOMAIN_PATTERN), "d"), "")
    return {"host": host, "domain": dom, "path": path}


def add_url_parts(ds, url_col: str, prefix: str = "url_"):
    """Dataset op: append ``<prefix>host``, ``<prefix>domain``,
    ``<prefix>path``. Stateless task stage, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        parts = url_parts_batch(batch.column(url_col))
        for name, arr in parts.items():
            batch = batch.append_column(prefix + name, arr)
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")
