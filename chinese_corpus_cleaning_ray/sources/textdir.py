"""Text-file-directory source/sink — the reference's NATIVE ingestion mode.

EP1 walks a directory of .txt documents, one doc per file
(ref:text_quality_filter/main.py:253-280 ``os.listdir`` + per-file read) and
writes kept/cleaned documents back as one .txt per doc
(ref:process_documents.py:40-70). The engine's flagship consumes Parquet
transcripts (the scale-correct shape), but a reference user's first corpus
is a txt directory — these adapters make the switch a one-liner:

    ds = read_text_dir("/corpus/txt")               # (doc_id, path, text)
    ... any pipeline ...
    write_text_dir(ds, "/out/txt")                  # one file per doc

Both are streaming: the read decodes inside Ray's binary-file read tasks;
the write happens inside the map task (task-local, no shuffle, tmp-then-
rename per file), returning a counter Dataset like the WARC sinks.
"""

from __future__ import annotations

import os

import pyarrow as pa


def read_text_dir(paths, encoding: str = "utf-8", errors: str = "replace"):
    """One row per text file: (doc_id = filename stem, path, text).
    ``paths`` may be a directory, a glob, or a list — anything
    ``read_binary_files`` accepts."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        ps = batch.column("path").to_pylist()
        texts = [b.decode(encoding, errors=errors)
                 for b in batch.column("bytes").to_pylist()]
        stems = [os.path.splitext(os.path.basename(p))[0] for p in ps]
        return pa.table(
            {
                "doc_id": pa.array(stems, pa.string()),
                "path": pa.array(ps, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return files.map_batches(decode, batch_format="pyarrow")


def _safe_filename(doc_id) -> str:
    """Injective escape of the characters that would let a doc_id write
    outside out_dir (or crash the tmp-rename): path separators and NUL are
    percent-encoded, and '%' itself is encoded first so distinct ids can
    never collide after escaping. Everything else — including non-ASCII —
    passes through untouched, so ordinary (e.g. Chinese) ids keep their
    reference-style filenames. A bare '..' id becomes a plain odd filename,
    not a traversal: traversal needs a separator, and none survive."""
    s = str(doc_id)
    return (s.replace("%", "%25").replace("/", "%2F")
             .replace("\\", "%5C").replace("\0", "%00"))


def write_text_dir(ds, out_dir: str, text_col: str = "text",
                   id_col: str = "doc_id", suffix: str = ".txt",
                   encoding: str = "utf-8"):
    """One output file per row, named ``<escaped-id>.txt`` (tmp-then-rename),
    written inside the map task. Returns the per-batch counter Dataset —
    consume it (e.g. ``.sum("files_written")``) to drive execution.
    ``files_overwritten`` counts renames that replaced an existing file
    (duplicate ids across rows, or a pre-existing output) so silent
    last-writer-wins collisions are at least visible in the counters."""
    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        import uuid

        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        n = 0
        overwrote = 0
        # tmp names must be unique PER WRITER: duplicate ids land in
        # different parallel tasks, and a shared tmp path races — one task's
        # os.replace yanks the tmp from under the other's (observed as an
        # intermittent FileNotFoundError under the full suite's load)
        wtag = f"{os.getpid()}.{uuid.uuid4().hex[:8]}"
        for i, t in zip(ids, texts):
            name = _safe_filename(i)
            tmp = os.path.join(out_dir, f".{name}{suffix}.{wtag}.tmp")
            final = os.path.join(out_dir, f"{name}{suffix}")
            with open(tmp, "w", encoding=encoding) as f:
                f.write(t if t is not None else "")
            # atomic first-publication probe: os.link publishes the COMPLETE
            # tmp content iff `final` is absent, so a reader never observes
            # an empty destination (an O_CREAT|O_EXCL probe would create one
            # before the replace); exactly ONE concurrent writer of a given
            # id sees the link succeed, so the overwrite counter cannot
            # double-count (a plain exists() check races to 0)
            try:
                os.link(tmp, final)
            except FileExistsError:
                overwrote += 1
                os.replace(tmp, final)
            except OSError:
                # hardlinks unsupported on this filesystem — plain replace
                # keeps publication atomic; the overwrite count degrades to
                # a best-effort exists() probe
                if os.path.exists(final):
                    overwrote += 1
                os.replace(tmp, final)
            else:
                os.unlink(tmp)
            n += 1
        return pa.table({"files_written": pa.array([n], pa.int64()),
                         "files_overwritten": pa.array([overwrote], pa.int64())})

    return ds.map_batches(write, batch_format="pyarrow")
