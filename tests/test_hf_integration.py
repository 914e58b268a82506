"""Opt-in HF/fastText integration lane (VERDICT-r4 item 5): `pytest -m hf`.

On a machine with torch+transformers (and optionally fasttext + a local
lid bin), these run the REAL backends end-to-end through the same Ray
stages the fake-backed contract tests exercise, asserting schema and
invariants — never specific labels (model outputs are version-dependent).
Here (no torch) every test skips cleanly; the fake-backed contract tests in
test_fake_hf_contract.py remain the always-on gate.

Env knobs: CCC_HF_EMBED_MODEL / CCC_HF_PPL_MODEL override the default model
names (useful for offline caches); CCC_FASTTEXT_MODEL points at a local
lid.176.bin for the fastText test.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

pytestmark = pytest.mark.hf

N_ROWS = 100


def _texts() -> list[str]:
    from chinese_corpus_cleaning_ray.sources.transcripts import (
        synthesize_transcripts,
    )

    return synthesize_transcripts(N_ROWS, seed=13).column("text").to_pylist()


def test_hf_embedder_end_to_end(ray_session):
    torch = pytest.importorskip("torch")  # noqa: F841
    pytest.importorskip("transformers")
    import ray

    from chinese_corpus_cleaning_ray.stages.embed import HFEmbedder, embed_texts

    model = os.environ.get("CCC_HF_EMBED_MODEL", "shibing624/text2vec-base-chinese")
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(_texts())]
    ds = ray.data.from_items(rows).repartition(4)
    out = embed_texts(ds, embedder_factory=lambda: HFEmbedder(model_name=model),
                      concurrency=1).to_pandas().sort_values("doc_id")
    assert len(out) == N_ROWS
    mat = np.asarray(list(out["embedding"]), dtype=np.float32)
    assert mat.ndim == 2 and mat.shape[0] == N_ROWS and mat.shape[1] >= 64
    assert np.isfinite(mat).all()
    # CLS vectors of non-empty Chinese text are not degenerate
    assert (np.linalg.norm(mat, axis=1) > 0).all()
    # determinism within one process: same text → same vector
    again = embed_texts(ray.data.from_items(rows[:5]),
                        embedder_factory=lambda: HFEmbedder(model_name=model),
                        concurrency=1).to_pandas().sort_values("doc_id")
    a0 = np.asarray(list(again["embedding"]), dtype=np.float32)
    assert np.allclose(a0, mat[:5], atol=1e-4)


def test_hf_perplexity_end_to_end(ray_session):
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    import ray

    from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
    from chinese_corpus_cleaning_ray.functions.ngram_lm import HFPerplexityScorer
    from chinese_corpus_cleaning_ray.stages.quality_stages import PplStage

    model = os.environ.get("CCC_HF_PPL_MODEL", "uer/gpt2-chinese-cluecorpussmall")
    cfg = DEFAULT_CONFIG
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(_texts())]
    ds = ray.data.from_items(rows).repartition(4)
    out = ds.map_batches(
        PplStage,
        fn_constructor_kwargs=dict(
            cfg=cfg,
            scorer_factory=lambda: HFPerplexityScorer(
                cfg.perplexity, model_name=model)),
        batch_format="pyarrow", concurrency=1, num_cpus=1,
    ).to_pandas().sort_values("doc_id")
    assert len(out) == N_ROWS
    # invariants, not labels: scores in [0,1], ppl positive+finite, pass bool
    assert ((out["ppl_score"] >= 0.0) & (out["ppl_score"] <= 1.0)).all()
    assert (out["ppl"] > 0).all() and np.isfinite(out["ppl"]).all()
    assert out["ppl_pass"].dtype == bool


def test_fasttext_langid_end_to_end(ray_session):
    pytest.importorskip("fasttext")
    model_path = os.environ.get("CCC_FASTTEXT_MODEL", "")
    if not model_path or not os.path.exists(model_path):
        pytest.skip("set CCC_FASTTEXT_MODEL to a local lid.176.bin")
    import ray

    from chinese_corpus_cleaning_ray.functions.langid import (
        FastTextLangId,
        make_langid,
    )

    lid = make_langid(model_path=model_path)
    assert isinstance(lid, FastTextLangId)  # factory picked the real backend
    res = lid.predict_batch(_texts())
    assert set(res) == {"lang", "lang_conf", "is_zh"}
    assert len(res["lang"]) == N_ROWS
    assert all(0.0 <= c <= 1.0 for c in res["lang_conf"])
    assert all(isinstance(z, bool) for z in res["is_zh"])
    # contract: sub-10-char text is 'und' with conf 0 regardless of model
    assert lid.predict("短")[0] == "und"
