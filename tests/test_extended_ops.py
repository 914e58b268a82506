"""SimHash dedup, embedding dedup, Aho-Corasick, WARC reader, embed stage, CLI."""

import gzip
import os

import numpy as np
import pytest


def test_aho_corasick_overlapping_matches():
    from chinese_corpus_cleaning_ray.functions.ac import AhoCorasick

    ac = AhoCorasick(["he", "she", "his", "hers"])
    got = sorted(ac.search("ushers"))
    assert got == [(1, "she"), (2, "he"), (2, "hers")]


def test_ac_chinese_and_fail_links():
    from chinese_corpus_cleaning_ray.functions.ac import AhoCorasick

    ac = AhoCorasick(["色情", "色情网站", "网站"])
    got = sorted(ac.search("访问色情网站吧"))
    assert got == [(2, "色情"), (2, "色情网站"), (4, "网站")]


def test_feature_scorer_ac_strategy(wordlist):
    from chinese_corpus_cleaning_ray.functions.features import FeatureWordsScorer

    dfa = FeatureWordsScorer(wordlist, use_dfa=True)
    ac = FeatureWordsScorer(wordlist, use_dfa=False)
    text = "年底特价大促销\n正常的一句话而已"
    p1, d1 = dfa.check_feature_words(text)
    p2, d2 = ac.check_feature_words(text)
    assert set(d1["feature_words"]) <= set(d2["feature_words"])  # AC ⊇ DFA
    assert isinstance(p1, bool) and isinstance(p2, bool)
    assert 0.0 <= ac.get_feature_score(text) <= 1.0


def _make_warc(records):
    out = b""
    for uri, body in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{abs(hash(uri))}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode()
        out += head + http + b"\r\n\r\n"
    return out


def test_warc_parser_roundtrip(tmp_path):
    from chinese_corpus_cleaning_ray.sources.warc import parse_warc_bytes

    raw = _make_warc([("http://a.example/x", b"<html>\xe4\xb8\xad\xe6\x96\x87</html>"),
                      ("http://b.example/y", b"<html>two</html>")])
    rows = parse_warc_bytes(raw, "test.warc")
    assert len(rows) == 2
    assert rows[0]["target_uri"] == "http://a.example/x"
    assert rows[0]["payload"] == "<html>中文</html>".encode()
    # gzip variant
    rows2 = parse_warc_bytes(gzip.compress(raw), "test.warc.gz")
    assert [r["target_uri"] for r in rows2] == [r["target_uri"] for r in rows]


def test_warc_ray_reader(ray_session, tmp_path):
    from chinese_corpus_cleaning_ray.sources.warc import read_warc

    raw = _make_warc([(f"http://site{i}.example/", f"<p>doc {i}</p>".encode()) for i in range(5)])
    p = tmp_path / "sample.warc.gz"
    p.write_bytes(gzip.compress(raw))
    ds = read_warc(str(p))
    rows = ds.take_all()
    assert len(rows) == 5
    assert all(r["payload"].startswith(b"<p>doc") for r in rows)


def test_simhash_dedup(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.dedup_stage import simhash_dedup

    base = "机器学习模型的训练过程需要大量高质量的数据支持数据清洗与预处理环节直接影响最终效果"
    rows = [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + "。"},
            {"doc_id": 3, "text": "完全不同的另一段文字内容与上面毫无相似之处是独立的句子"}]
    deduped, dups = simhash_dedup(rd.from_items(rows).repartition(2), id_col="doc_id")
    kept = sorted(deduped.to_pandas()["doc_id"])
    assert 0 in kept and 3 in kept
    assert 1 in dups


def test_embedding_dedup(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.similarity import embedding_dedup

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((50, 16))
    vecs[7] = vecs[0] + rng.standard_normal(16) * 1e-4   # near-identical pair
    vecs[9] = vecs[0] * 1.5 + rng.standard_normal(16) * 1e-4
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    deduped, dups = embedding_dedup(rd.from_items(rows).repartition(2), threshold=0.95)
    kept = set(deduped.to_pandas()["vec_id"])
    assert 0 in kept and 7 not in kept and 9 not in kept
    assert len(kept) >= 45


def test_embed_stage_and_knn_integration(ray_session):
    import ray.data as rd

    from chinese_corpus_cleaning_ray.stages.embed import DeterministicFakeEmbedder, embed_texts
    from chinese_corpus_cleaning_ray.stages.similarity import knn_brute

    rows = [{"doc_id": i, "text": f"文档内容编号{i}包含一些共同的词语以及差异部分{i*7}"} for i in range(30)]
    rows.append({"doc_id": 99, "text": rows[0]["text"]})  # identical text
    ds = embed_texts(rd.from_items(rows).repartition(2))
    emb = {r["doc_id"]: r["embedding"] for r in ds.take_all()}
    assert len(emb[0]) == 64
    q = np.array([emb[0]], dtype=np.float64)
    out = knn_brute(ds, q, k=2, id_col="doc_id").to_pandas()
    assert set(out["doc_id"]) == {0, 99}  # identical text is the nearest neighbor


def test_embedder_deterministic():
    from chinese_corpus_cleaning_ray.stages.embed import DeterministicFakeEmbedder

    e = DeterministicFakeEmbedder()
    a = e.embed_batch(["同一段文字内容"])
    b = e.embed_batch(["同一段文字内容"])
    assert np.allclose(a, b)
    assert abs(np.linalg.norm(a[0]) - 1.0) < 1e-5


def test_cli_synth_and_process(tmp_path):
    import subprocess, sys, json

    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "chinese_corpus_cleaning_ray", "synth",
         "--output", str(tmp_path / "c"), "--rows", "2000"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr[-500:]
    assert json.loads(out.stdout.strip().splitlines()[-1])["rows"] == 2000

    out = subprocess.run(
        [sys.executable, "-m", "chinese_corpus_cleaning_ray", "process",
         "--input", str(tmp_path / "c"), "--output", str(tmp_path / "o"),
         "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=600)
    assert out.returncode == 0, out.stderr[-800:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["total"] == 2000 and stats["files_done"] >= 1


def test_cli_crawl_and_compact(ray_session, tmp_path):
    """Round-2 CLI surface: crawl (runs in-process to reuse the session) and
    compact + mergewords subcommands."""
    from chinese_corpus_cleaning_ray.__main__ import main
    from chinese_corpus_cleaning_ray.sources.warc import build_warc_record

    zh = ("<html><body>" + "中文网页正文内容示例，讨论语料清洗。" * 4 + "</body></html>").encode()
    (tmp_path / "c.warc").write_bytes(build_warc_record("http://x.example/", zh, "<u:0>"))
    rc = main(["crawl", "--warc", str(tmp_path / "c.warc"),
               "--output", str(tmp_path / "pages")])
    assert rc == 0

    import glob as _glob
    assert _glob.glob(str(tmp_path / "pages" / "*.parquet"))

    lists = []
    for i in range(2):
        f = tmp_path / f"w{i}.txt"
        f.write_text("共词\n" + f"词{i}\n", encoding="utf-8")
        lists.append(str(f))
    rc = main(["mergewords", "--lists", *lists, "--out", str(tmp_path / "m.txt")])
    assert rc == 0
    assert (tmp_path / "m.txt").read_text(encoding="utf-8").split() == ["共词", "词0", "词1"]


def test_cli_redactpii_and_exportshards(tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    env = dict(os.environ, PYTHONPATH="/root/repo")
    src = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({
        "doc_id": list(range(50)),
        "text": [f"doc {i} mail user{i}@x.cc " + "tok " * 20
                 for i in range(50)],
    }), src)

    out = subprocess.run(
        [sys.executable, "-m", "chinese_corpus_cleaning_ray", "redactpii",
         "--input", src, "--output", str(tmp_path / "red"),
         "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr[-800:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["rows"] == 50 and stats["email_count"] == 50

    out = subprocess.run(
        [sys.executable, "-m", "chinese_corpus_cleaning_ray", "exportshards",
         "--input", src, "--output", str(tmp_path / "sh"),
         "--shard-tokens", "300", "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr[-800:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    assert m["rows"] == 50 and m["n_shards"] >= 3
    import glob
    files = glob.glob(str(tmp_path / "sh" / "shard=*/**/*.parquet"),
                      recursive=True)
    assert files
