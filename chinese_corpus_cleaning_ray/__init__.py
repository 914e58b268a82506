"""chinese_corpus_cleaning_ray — a Ray-Data-native corpus quality engine.

A from-scratch rebuild of the data-processing capabilities of
lijiandao/Chinese-corpus-cleaning (reference at /root/reference, cited as
``ref:<file>:<line>`` throughout), re-expressed as streaming
``ray.data.Dataset`` plans over Parquet tables of multi-turn transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Layout
------
- ``functions/`` — pure kernels (no Ray): rule checks, DFA scrub, feature
  scoring, language-ID heuristic, n-gram perplexity, dedup sketches,
  tokenization. These define the per-row semantics and are unit-tested
  against an independent oracle restatement of the reference.
- ``sources/``  — readers + the deterministic synthetic transcript generator.
- ``stages/``   — ``map_batches`` wrappers: stateless task stages and
  stateful actor-pool stages (models/tries built once per actor).
- ``pipelines/``— composition of stages into end-to-end plans.
- ``state/``    — per-partition checkpoint manifests and resume logic.

IMPORTANT: nothing in this package calls ``ray.init``/``ray.shutdown`` —
session ownership belongs to the caller (driver, bench.py, test fixture).
"""

__version__ = "0.1.0"
