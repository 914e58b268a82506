"""Precision/recall of the APPROXIMATE dedups against exact-Jaccard ground
truth — makes the no-oracle dedup paths auditable the way knn_ivf's recall
note is.

Ground truth: the oracled ``ngram_jaccard_dedup`` (k=5, threshold=0.35 —
the same parameters as the driver's ``doc_jaccard_dedup`` query) over the
documents table. Each approximate variant's dup-id set is scored as

    precision = |approx ∩ truth| / |approx|    (1.0 → no false kills)
    recall    = |approx ∩ truth| / |truth|     (1.0 → no missed dups)

Caveats printed with the numbers: simhash (Hamming over a 64-bit sketch)
and embedding-cosine (fake shingle-hash embedder here) measure DIFFERENT
similarity notions than character-shingle Jaccard — their score against this
ground truth quantifies how far those notions diverge on this corpus, not a
defect. MinHash estimates exactly the Jaccard notion, so its verified
variant is expected near (1.0, 1.0).

Usage:  python tools/dedup_quality.py [sf_dir]       (default sf0.01)
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dup_set(dups) -> set:
    """anti_filter returns a list on the broadcast path, a Dataset on join."""
    if isinstance(dups, list):
        return set(dups)
    df = dups.to_pandas()
    return set(df[df.columns[0]])


def score(approx: set, truth: set) -> dict:
    inter = len(approx & truth)
    return {
        "n_marked": len(approx),
        "precision": round(inter / len(approx), 4) if approx else 1.0,
        "recall": round(inter / len(truth), 4) if truth else 1.0,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # Ground truth runs with the df cap DISABLED by default (truth must be
    # the true Jaccard: the driver query's fixed max_df=128 under-counts
    # dups once template shingles exceed 128 docs — at 5000 docs it reports
    # zero while 244 true ≥0.35 pairs exist). Pass a cap as argv[2] if the
    # corpus is template-heavy enough to make uncapped posting lists blow up.
    truth_max_df = int(sys.argv[2]) if len(sys.argv) > 2 else None

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from chinese_corpus_cleaning_ray.stages.dedup_stage import (
        minhash_dedup,
        ngram_jaccard_dedup,
        simhash_dedup,
    )
    from chinese_corpus_cleaning_ray.stages.embed import embed_texts
    from chinese_corpus_cleaning_ray.stages.similarity import embedding_dedup

    def docs():
        return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    out: dict = {"sf_dir": sf_dir}
    t0 = time.time()
    _, truth_dups = ngram_jaccard_dedup(docs(), id_col="doc_id", k=5,
                                        threshold=0.35, max_df=truth_max_df)
    truth = _dup_set(truth_dups)
    out["truth"] = {"variant": f"ngram_jaccard(k=5,t=0.35,max_df={truth_max_df})",
                    "n_dups": len(truth),
                    "sec": round(time.time() - t0, 2)}

    variants = {}

    t0 = time.time()
    _, d = minhash_dedup(docs(), id_col="doc_id")
    variants["minhash_unverified"] = {**score(_dup_set(d), truth),
                                      "sec": round(time.time() - t0, 2)}

    t0 = time.time()
    _, d = minhash_dedup(docs(), id_col="doc_id", verify_threshold=0.35,
                         verify_k=5)
    variants["minhash_verified"] = {**score(_dup_set(d), truth),
                                    "sec": round(time.time() - t0, 2)}

    t0 = time.time()
    _, d = simhash_dedup(docs(), id_col="doc_id", k=3, max_hamming=3)
    variants["simhash"] = {**score(_dup_set(d), truth),
                           "sec": round(time.time() - t0, 2)}

    t0 = time.time()
    emb = embed_texts(docs(), text_col="text")
    _, d = embedding_dedup(emb, id_col="doc_id", threshold=0.85)
    variants["embedding_cosine"] = {**score(_dup_set(d), truth),
                                    "sec": round(time.time() - t0, 2)}

    out["variants"] = variants
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
