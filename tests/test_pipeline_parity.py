"""End-to-end parity: the distributed Ray pipeline must reproduce the
independent oracle's per-turn keep/drop labels (target: exact; gate: F1≥0.99)
and byte-exact scrubbed text, in stable (conv_id, turn_idx) order."""

import pyarrow as pa
import pytest

import oracle_ref as o


N_ROWS = 20_000


@pytest.fixture(scope="module")
def corpus():
    from chinese_corpus_cleaning_ray.sources.transcripts import synthesize_transcripts

    return synthesize_transcripts(N_ROWS, seed=123)


@pytest.fixture(scope="module")
def pipeline_result(ray_session, corpus) -> pa.Table:
    import ray.data as rd

    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
    from chinese_corpus_cleaning_ray.pipelines.quality import build_quality_pipeline

    ds = rd.from_arrow(corpus).repartition(8)
    out = build_quality_pipeline(ds, DEFAULT_CONFIG)
    out = out.sort(["conv_id", "turn_idx"])
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return tbl


@pytest.fixture(scope="module")
def oracle_result(corpus, wordlist):
    trie = o.build_trie(wordlist)
    rows = corpus.to_pylist()
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    out = []
    for r in rows:
        d = o.o_decide(trie, r["text"])
        d["scrubbed_text"] = o.o_scrub(trie, r["text"])
        d["conv_id"] = r["conv_id"]
        d["turn_idx"] = r["turn_idx"]
        out.append(d)
    return out


def test_keep_labels_exact(pipeline_result, oracle_result):
    got = pipeline_result.to_pylist()
    assert len(got) == len(oracle_result)
    mismatches = 0
    for g, w in zip(got, oracle_result):
        assert (g["conv_id"], g["turn_idx"]) == (w["conv_id"], w["turn_idx"])
        if bool(g["keep"]) != bool(w["keep"]):
            mismatches += 1
    # target exact equality; hard gate F1-style mismatch budget 1%
    assert mismatches == 0, f"{mismatches}/{len(got)} keep-label mismatches"


def test_quality_scores_match(pipeline_result, oracle_result):
    got = pipeline_result.to_pylist()
    for g, w in zip(got, oracle_result):
        assert g["quality_score"] == pytest.approx(w["quality_score"], abs=1e-9), (
            g["conv_id"], g["turn_idx"])


def test_scrubbed_text_byte_exact(pipeline_result, oracle_result):
    got = pipeline_result.to_pylist()
    for g, w in zip(got, oracle_result):
        assert g["scrubbed_text"] == w["scrubbed_text"], (g["conv_id"], g["turn_idx"])


def test_label_mix_is_nontrivial(oracle_result):
    keeps = sum(1 for r in oracle_result if r["keep"])
    assert 0.05 * len(oracle_result) < keeps < 0.95 * len(oracle_result)


def test_order_stable(pipeline_result):
    keys = [(r["conv_id"], r["turn_idx"]) for r in pipeline_result.to_pylist()]
    assert keys == sorted(keys)


def test_row_order_invariance(ray_session, corpus, wordlist):
    """Shuffled input must produce identical per-key decisions."""
    import ray.data as rd

    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
    from chinese_corpus_cleaning_ray.pipelines.quality import build_quality_pipeline

    small = corpus.slice(0, 2000)
    a = build_quality_pipeline(rd.from_arrow(small).repartition(4), DEFAULT_CONFIG)
    b = build_quality_pipeline(
        rd.from_arrow(small).random_shuffle(seed=5).repartition(4), DEFAULT_CONFIG
    )
    pa_a = a.sort(["conv_id", "turn_idx"]).to_pandas()
    pa_b = b.sort(["conv_id", "turn_idx"]).to_pandas()
    assert list(pa_a["keep"]) == list(pa_b["keep"])
    assert list(pa_a["scrubbed_text"]) == list(pa_b["scrubbed_text"])
