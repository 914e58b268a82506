"""WARC ingest source — self-contained WARC/1.x parser (no warcio dependency).

The reference's crawl path streams gzip CommonCrawl WARCs with warcio and
keeps Chinese 'response' records (ref:Crawl_Page/subsample_warc_warc.py:16-90,
two passes + a 1 s watchdog thread per record). Re-expression:

- ``iter_warc_records(stream)`` — minimal single-pass parser for the WARC/1.0
  format (header block, Content-Length-framed payload, CRLF CRLF terminators);
  handles plain and gzip streams (member-concatenated gzip works through
  ``gzip.GzipFile`` which reads across members).
- ``read_warc(paths)`` — Ray Data plan: ``read_binary_files`` over the .warc /
  .warc.gz shards → flat_map one row per response record
  ``(warc_path, record_id, target_uri, payload: binary)``. One pass — the
  reference's offset-collection + rewrite double scan collapses into a
  ``filter`` on the resulting Dataset (SURVEY §2.5 G4).
- ``http_payload(body)`` — strip the HTTP response head from a response
  record's block, yielding the entity body (HTML bytes).

The HTML→text + langid stages then apply downstream (stages/analysis.strip_html,
functions/langid) exactly like the reference's EP3 chain.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator


def _read_headers(fp) -> dict[str, str] | None:
    """Read a CRLF-terminated header block; None on clean EOF."""
    line = fp.readline()
    while line in (b"\r\n", b"\n"):  # skip inter-record blank lines
        line = fp.readline()
    if not line:
        return None
    headers: dict[str, str] = {}
    first = line.decode("utf-8", errors="ignore").strip()
    headers["__version__"] = first
    while True:
        line = fp.readline()
        if not line or line in (b"\r\n", b"\n"):
            break
        text = line.decode("utf-8", errors="ignore").rstrip("\r\n")
        if ":" in text:
            k, v = text.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def iter_warc_records(stream) -> Iterator[dict]:
    """Yield {'headers': dict, 'payload': bytes} per WARC record."""
    while True:
        headers = _read_headers(stream)
        if headers is None:
            return
        if not headers.get("__version__", "").startswith("WARC/"):
            # tolerate garbage between records by scanning forward
            continue
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated archive
        yield {"headers": headers, "payload": payload}


def http_payload(block: bytes) -> bytes:
    """Entity body of an HTTP response block (drop the status+header head)."""
    sep = block.find(b"\r\n\r\n")
    if sep == -1:
        sep = block.find(b"\n\n")
        return block[sep + 2 :] if sep != -1 else block
    return block[sep + 4 :]


def parse_warc_bytes(data: bytes, path: str = "", record_types: tuple = ("response",)) -> list[dict]:
    """All wanted records of one WARC file as rows."""
    # magic-byte check only: Ray's read_binary_files already decompresses
    # .gz paths, so the extension says nothing about the bytes we get
    if data[:2] == b"\x1f\x8b":
        stream = gzip.GzipFile(fileobj=io.BytesIO(data))
    else:
        stream = io.BytesIO(data)
    rows = []
    for rec in iter_warc_records(stream):
        h = rec["headers"]
        if record_types and h.get("warc-type") not in record_types:
            continue
        rows.append(
            {
                "warc_path": path,
                "record_id": h.get("warc-record-id", ""),
                "target_uri": h.get("warc-target-uri", ""),
                "payload": http_payload(rec["payload"]) if h.get("warc-type") == "response" else rec["payload"],
            }
        )
    return rows


def build_warc_record(target_uri: str, payload: bytes, record_id: str = "") -> bytes:
    """Serialize one WARC/1.0 response record (SURVEY §2.1 S8 — the
    reference's writer is warcio's WARCWriter,
    ref:Crawl_Page/subsample_warc_warc.py:81-89). The payload is framed as a
    minimal HTTP/1.1 response entity so ``read_warc`` round-trips it."""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Length: "
        + str(len(payload)).encode() + b"\r\n\r\n" + payload
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: " + (record_id or "<urn:uuid:none>").encode(),
        b"WARC-Target-URI: " + target_uri.encode("utf-8", errors="ignore"),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(http)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + http + b"\r\n\r\n"


def write_warc_records(rows: list[dict], out_path: str, gzip_output: bool = True) -> int:
    """Write rows (record_id, target_uri, payload) as one WARC file
    (tmp-then-rename). Returns the record count."""
    import os

    records = [
        build_warc_record(r.get("target_uri", ""), r.get("payload", b""),
                          r.get("record_id", "")) for r in rows
    ]
    if gzip_output:
        # one gzip member PER RECORD (concatenated members), the .warc.gz
        # wire format warcio and CommonCrawl tooling expect — a per-record
        # seek can start at any member boundary. gzip.GzipFile reads across
        # members, so our own read path is unchanged.
        data = b"".join(gzip.compress(rec) for rec in records)
    else:
        data = b"".join(records)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, out_path)
    return len(rows)


def subsample_warc(paths, out_dir: str, keep_fn, gzip_output: bool = True):
    """The reference's two-pass Chinese-page subsampler
    (ref:subsample_warc_warc.py:16-90: offset-collect scan, then re-scan +
    rewrite) as ONE streaming Ray pass: read records → keep_fn(texts)->mask →
    write each input shard's surviving records to ``out_dir/<stem>-sub.warc[.gz]``
    inside the map task (task-local write, no shuffle; one output file per
    input shard keeps the job resumable at shard granularity).

    ``keep_fn``: list[payload bytes] -> list[bool]. Returns a Dataset of
    per-shard counter rows (warc_path, records_in, records_kept)."""
    import os

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    files = _read_binary(paths)

    def process(row: dict) -> list[dict]:
        import hashlib

        rows = parse_warc_bytes(row["bytes"], row["path"])
        mask = keep_fn([r["payload"] for r in rows]) if rows else []
        kept = [r for r, m in zip(rows, mask) if m]
        # short full-path hash in the stem: two shards with the same basename
        # in different directories must not overwrite each other's output
        path_tag = hashlib.sha1(row["path"].encode()).hexdigest()[:8]
        stem = f'{os.path.basename(row["path"]).split(".")[0]}-{path_tag}'
        suffix = ".warc.gz" if gzip_output else ".warc"
        if kept:
            write_warc_records(kept, os.path.join(out_dir, f"{stem}-sub{suffix}"),
                               gzip_output)
        return [{"warc_path": row["path"], "records_in": len(rows),
                 "records_kept": len(kept)}]

    return files.flat_map(process)


def _read_binary(paths):
    import ray.data as rd

    return rd.read_binary_files(paths, include_paths=True)


def url_to_filename(url: str) -> str:
    """SURVEY §2.2 M5 — ref:Crawl_Page/convert_warc_to_htmls.py:13-19 byte for
    byte: strip protocol, non-alphanumerics → '_', truncate to 100, '.html'."""
    import re

    name = re.sub(r"^https?://", "", url)
    name = re.sub(r"[^a-zA-Z0-9]", "_", name)
    return name[:100] + ".html"


def warc_to_html_files(paths, htmls_dir: str):
    """SURVEY §2.1 S9 — ref:convert_warc_to_htmls.py:21-57 (the repo's copy is
    merge-conflict-broken; semantics reconstructed): for each response record
    whose extracted text survives strip→clean→long-repeat-removal, write the
    RAW payload to ``htmls_dir/url_to_filename(uri)``. Writes happen inside
    the map task (task-local, no shuffle); returns a counter Dataset
    (warc_path, records_in, files_written)."""
    import os

    from chinese_corpus_cleaning_ray.functions.textclean import (
        clean_text_ws,
        remove_long_repeated_substrings,
    )
    from chinese_corpus_cleaning_ray.stages.analysis import strip_html_text

    os.makedirs(htmls_dir, exist_ok=True)
    files = _read_binary(paths)

    def process(row: dict) -> list[dict]:
        rows = parse_warc_bytes(row["bytes"], row["path"])
        written = 0
        for r in rows:
            html = r["payload"].decode("utf-8", errors="ignore")
            text = remove_long_repeated_substrings(clean_text_ws(strip_html_text(html)))
            if not text.strip():
                continue
            with open(os.path.join(htmls_dir, url_to_filename(r["target_uri"])), "wb") as f:
                f.write(r["payload"])
            written += 1
        return [{"warc_path": row["path"], "records_in": len(rows),
                 "files_written": written}]

    return files.flat_map(process)


def read_warc(paths, record_types: tuple = ("response",)):
    """Ray Data plan: one row per WARC record of the wanted types. Each file is
    parsed inside the reading task (flat_map over binary files) — streaming,
    single pass, no driver-side loops."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def explode(row: dict) -> list[dict]:
        return parse_warc_bytes(row["bytes"], row["path"], record_types)

    return files.flat_map(explode)
