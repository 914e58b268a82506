"""S8 WARC writer (round-trip through our own reader, single-pass subsample
pipeline) and S10 Range-resume downloader (injectable transport)."""

import gzip
import os

import numpy as np
import pytest


def test_warc_writer_roundtrip(tmp_path):
    from chinese_corpus_cleaning_ray.sources.warc import (
        parse_warc_bytes,
        write_warc_records,
    )

    rows = [
        {"record_id": f"<urn:uuid:{i}>", "target_uri": f"http://s{i}.example/",
         "payload": f"<html>正文 {i}</html>".encode()}
        for i in range(4)
    ]
    out = str(tmp_path / "out.warc.gz")
    assert write_warc_records(rows, out) == 4
    back = parse_warc_bytes(open(out, "rb").read(), out)
    assert [r["target_uri"] for r in back] == [r["target_uri"] for r in rows]
    assert [r["payload"] for r in back] == [r["payload"] for r in rows]

    # uncompressed variant too
    out2 = str(tmp_path / "out.warc")
    write_warc_records(rows[:2], out2, gzip_output=False)
    assert len(parse_warc_bytes(open(out2, "rb").read(), out2)) == 2


def test_subsample_warc_single_pass(ray_session, tmp_path):
    """ref:subsample_warc_warc.py two-pass offset scheme as one streaming
    pass: keep Chinese pages, write one output shard per input shard."""
    from chinese_corpus_cleaning_ray.sources.warc import (
        build_warc_record,
        parse_warc_bytes,
        subsample_warc,
    )

    recs = []
    for i in range(6):
        body = ("<html>中文网页内容，质量很高，这是第%d篇。</html>" % i
                if i % 2 == 0 else "<html>english only page %d</html>" % i)
        recs.append(build_warc_record(f"http://p{i}.example/", body.encode(), f"<urn:{i}>"))
    src = tmp_path / "shard0.warc.gz"
    src.write_bytes(gzip.compress(b"".join(recs)))

    def keep_zh(payloads):
        return [sum(1 for ch in p.decode("utf-8", "ignore") if "一" <= ch <= "鿿") > 3
                for p in payloads]

    out_dir = str(tmp_path / "sub")
    counters = subsample_warc(str(src), out_dir, keep_zh).to_pandas()
    assert counters["records_in"].sum() == 6
    assert counters["records_kept"].sum() == 3
    written = os.listdir(out_dir)
    assert len(written) == 1
    # stem keeps the basename plus a short full-path hash (collision guard)
    assert written[0].startswith("shard0-") and written[0].endswith("-sub.warc.gz")
    back = parse_warc_bytes(open(os.path.join(out_dir, written[0]), "rb").read(), "x")
    assert [r["target_uri"] for r in back] == [f"http://p{i}.example/" for i in (0, 2, 4)]


def test_subsample_warc_same_basename_no_collision(ray_session, tmp_path):
    """Two input shards with the SAME basename in different directories must
    produce two distinct -sub outputs (path-hash in the stem)."""
    from chinese_corpus_cleaning_ray.sources.warc import build_warc_record, subsample_warc

    for d in ("a", "b"):
        sub = tmp_path / d
        sub.mkdir()
        rec = build_warc_record(f"http://{d}.example/", "中文网页正文内容很长".encode(), f"<u:{d}>")
        (sub / "shard.warc").write_bytes(rec)

    out_dir = str(tmp_path / "sub")
    counters = subsample_warc(
        [str(tmp_path / "a" / "shard.warc"), str(tmp_path / "b" / "shard.warc")],
        out_dir, lambda ps: [True] * len(ps), gzip_output=False,
    ).to_pandas()
    assert counters["records_kept"].sum() == 2
    assert len(os.listdir(out_dir)) == 2  # no overwrite


def test_warc_gz_one_member_per_record(tmp_path):
    """.warc.gz output uses one gzip member per record (warcio wire format)."""
    import zlib

    from chinese_corpus_cleaning_ray.sources.warc import write_warc_records

    rows = [{"record_id": f"<u:{i}>", "target_uri": f"http://m{i}.example/",
             "payload": f"<html>正文 {i}</html>".encode()} for i in range(5)]
    out = str(tmp_path / "members.warc.gz")
    write_warc_records(rows, out)
    data = open(out, "rb").read()
    members = 0
    while data:
        d = zlib.decompressobj(wbits=31)
        d.decompress(data)
        members += 1
        data = d.unused_data
    assert members == 5


class _FakeTransport:
    """Serves a fixed blob, honoring Range semantics; counts bytes shipped."""

    def __init__(self, blob: bytes, fail_after: int | None = None):
        self.blob = blob
        self.fail_after = fail_after
        self.bytes_shipped = 0

    def __call__(self, url: str, start: int):
        def chunks():
            sent = 0
            for off in range(start, len(self.blob), 10):
                chunk = self.blob[off : off + 10]
                if self.fail_after is not None and sent + len(chunk) > self.fail_after:
                    part = self.fail_after - sent
                    if part > 0:
                        self.bytes_shipped += part
                        yield chunk[:part]
                    raise ConnectionError("simulated drop")
                sent += len(chunk)
                self.bytes_shipped += len(chunk)
                yield chunk

        return len(self.blob), chunks()


def test_download_resumable_resumes_from_partial(tmp_path):
    from chinese_corpus_cleaning_ray.sources.crawl_fetch import download_resumable

    blob = bytes(np.random.RandomState(0).randint(0, 256, 333, dtype=np.uint8))
    path = str(tmp_path / "archive.warc.gz")

    # first attempt drops mid-stream
    t1 = _FakeTransport(blob, fail_after=100)
    with pytest.raises(ConnectionError):
        download_resumable("http://x/archive.warc.gz", path, t1)
    assert os.path.getsize(path) == 100

    # second attempt resumes from byte 100, ships ONLY the remainder
    t2 = _FakeTransport(blob)
    res = download_resumable("http://x/archive.warc.gz", path, t2)
    assert res["resumed_from"] == 100 and res["complete"]
    assert t2.bytes_shipped == len(blob) - 100
    assert open(path, "rb").read() == blob

    # complete file is a no-op
    t3 = _FakeTransport(blob)
    res2 = download_resumable("http://x/archive.warc.gz", path, t3)
    assert res2["complete"] and t3.bytes_shipped == 0


def test_requests_fetcher_416_is_complete(tmp_path, monkeypatch):
    """An already-complete file sends Range past EOF; the server answers 416
    and the fetcher must report total == start (no-op) instead of raising."""
    import sys
    import types

    class _Resp:
        status_code = 416
        headers = {"Content-Range": "bytes */333"}

    fake = types.ModuleType("requests")
    fake.get = lambda url, headers=None, stream=None, timeout=None: _Resp()
    monkeypatch.setitem(sys.modules, "requests", fake)

    from chinese_corpus_cleaning_ray.sources.crawl_fetch import download_resumable

    path = str(tmp_path / "full.bin")
    with open(path, "wb") as f:
        f.write(b"x" * 333)
    res = download_resumable("http://x/full.bin", path)  # default fetcher
    assert res["complete"] and res["resumed_from"] == 333
    assert os.path.getsize(path) == 333  # untouched


def test_download_many_continues_on_error(ray_session, tmp_path):
    """One failing archive must not abort the whole fan-out."""
    from chinese_corpus_cleaning_ray.sources.crawl_fetch import download_many

    blob = b"payload-bytes" * 10

    def flaky(url: str, start: int):
        if "bad" in url:
            raise ConnectionError("boom")
        return len(blob), iter([blob[start:]])

    res = download_many(
        ["http://x/ok1.warc", "http://x/bad.warc", "http://x/ok2.warc"],
        str(tmp_path / "dl"), fetcher=flaky,
    )
    by_url = {r["url"]: r for r in res}
    assert by_url["http://x/ok1.warc"]["complete"]
    assert by_url["http://x/ok2.warc"]["complete"]
    bad = by_url["http://x/bad.warc"]
    assert not bad["complete"] and "ConnectionError" in bad["error"]


def test_sessionize_rejects_non_pow2_shards(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.pipelines.conversations import sessionize_events

    with pytest.raises(ValueError, match="power of two"):
        sessionize_events(rd.from_items([{"user_id": 1}]), shards=100)


def test_url_to_filename_matches_reference_semantics():
    from chinese_corpus_cleaning_ray.sources.warc import url_to_filename

    assert url_to_filename("https://example.com/path/页面?q=1") == \
        "example_com_path____q_1.html"
    assert url_to_filename("http://a.b/c") == "a_b_c.html"
    long = "https://" + "x" * 300
    assert len(url_to_filename(long)) == 105  # 100 + ".html"


def test_warc_to_html_files_sink(ray_session, tmp_path):
    from chinese_corpus_cleaning_ray.sources.warc import (
        build_warc_record,
        url_to_filename,
        warc_to_html_files,
    )

    recs = [
        build_warc_record("http://keep.example/page", "<html><body>这是一段足够长的正文内容保留下来</body></html>".encode(), "<u:1>"),
        build_warc_record("http://empty.example/", b"<html><script>var x=1;</script></html>", "<u:2>"),
    ]
    src = tmp_path / "in.warc"
    src.write_bytes(b"".join(recs))
    out = str(tmp_path / "htmls")
    counters = warc_to_html_files(str(src), out).to_pandas()
    assert counters["records_in"].sum() == 2
    assert counters["files_written"].sum() == 1
    assert os.listdir(out) == [url_to_filename("http://keep.example/page")]


def test_crawl_pipeline_end_to_end(ray_session, tmp_path):
    """C9: WARC → strip → clean → langid → keep zh → parquet, one plan."""
    import pyarrow.dataset as pads

    from chinese_corpus_cleaning_ray.pipelines.crawl import run_crawl_job
    from chinese_corpus_cleaning_ray.sources.warc import build_warc_record

    zh = "<html><body>" + "这里是一段高质量的中文网页正文内容，讨论分布式计算。" * 3 + "</body></html>"
    en = "<html><body>" + "This is an english only page about nothing much at all. " * 3 + "</body></html>"
    recs = [build_warc_record(f"http://p{i}.example/", (zh if i % 2 == 0 else en).encode(), f"<u:{i}>")
            for i in range(4)]
    src = tmp_path / "crawl.warc"
    src.write_bytes(b"".join(recs))
    out = str(tmp_path / "pages")
    stats = run_crawl_job(str(src), out)
    assert stats["pages_kept"] == 2
    t = pads.dataset(out).to_table()
    assert sorted(t.column("target_uri").to_pylist()) == \
        ["http://p0.example/", "http://p2.example/"]
    assert set(t.column("lang").to_pylist()) == {"zh"}
