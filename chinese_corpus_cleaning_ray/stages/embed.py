"""Text-embedding stage (SURVEY §2.3 A8).

The reference loads ``shibing624/text2vec-base-chinese`` at module import and
emits CLS vectors in tokenizer batches (ref:embed.py:9-45). Transformers are
absent in this container, so the embedder is injectable:

- ``DeterministicFakeEmbedder`` (default) — stable unit vectors from character
  n-gram hashes; similar texts get similar vectors (bag-of-shingle projection),
  so downstream cosine ops (knn, embedding_dedup) behave sensibly in tests.
- ``HFEmbedder`` — the real path, gated behind an import-try; plumbing (batch
  shape, actor signature, list<float> column) identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from chinese_corpus_cleaning_ray.functions.dedup import char_shingles


class DeterministicFakeEmbedder:
    """Bag-of-shingles random projection: embed(text) = normalized sum of
    per-shingle pseudo-random vectors. Deterministic; cosine-similar for
    overlapping texts."""

    def __init__(self, dim: int = 64, shingle_k: int = 3):
        self.dim = dim
        self.shingle_k = shingle_k

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            sh = char_shingles(text, self.shingle_k)
            if sh.size == 0:
                continue
            # per-shingle deterministic gaussian via hash-seeded phases
            phases = (sh[:, None] * np.arange(1, self.dim + 1, dtype=np.uint64)[None, :])
            vecs = np.sin(phases.astype(np.float64) % 6283 / 1000.0)
            v = vecs.sum(axis=0)
            norm = np.linalg.norm(v)
            out[i] = (v / norm).astype(np.float32) if norm > 0 else 0.0
        return out


class HFEmbedder:  # pragma: no cover - env-gated (torch absent in this sandbox)
    """ref:embed.py:9-45 — CLS vectors from a HF encoder. Fully wired: when
    torch+transformers are installed this is the production path; the
    ImportError fallback is DeterministicFakeEmbedder (same .embed_batch
    contract, so every Ray stage is identical either way)."""

    def __init__(self, model_name: str = "shibing624/text2vec-base-chinese",
                 max_length: int = 128, device: str | None = None):
        try:
            import torch
            from transformers import AutoModel, AutoTokenizer
        except ImportError as e:
            raise NotImplementedError(
                "HF embedding requires torch+transformers (absent here); "
                "inject DeterministicFakeEmbedder or any object with "
                ".embed_batch(list[str]) -> np.ndarray"
            ) from e
        self._torch = torch
        self.device = device or ("cuda" if torch.cuda.is_available() else "cpu")
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name).to(self.device).eval()
        self.max_length = max_length

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.model.config.hidden_size), dtype=np.float32)
        enc = self.tokenizer(
            texts, padding=True, truncation=True,
            max_length=self.max_length, return_tensors="pt",
        ).to(self.device)
        with self._torch.no_grad():
            out = self.model(**enc)
        cls = out.last_hidden_state[:, 0, :]  # CLS pooling — ref:embed.py:38-41
        return cls.cpu().numpy().astype(np.float32)


class EmbedStage:
    """Actor-pool stage: text column → list<float32> ``embedding`` column.
    Embedder constructed once per actor (model load amortized)."""

    def __init__(self, text_col: str = "text", embedder_factory=DeterministicFakeEmbedder):
        self.text_col = text_col
        self.embedder = embedder_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        vecs = self.embedder.embed_batch(texts)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa.float32()), vecs.shape[1]
        ).cast(pa.list_(pa.float32()))
        return batch.append_column("embedding", arr)


def embed_texts(ds, text_col: str = "text", embedder_factory=DeterministicFakeEmbedder,
                batch_size: int = 512, concurrency=8):
    from chinese_corpus_cleaning_ray.stages.pools import resolve_pool

    return ds.map_batches(
        EmbedStage,
        fn_constructor_kwargs=dict(text_col=text_col, embedder_factory=embedder_factory),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_pool(concurrency, fraction=0.4),
        num_cpus=1,
    )
