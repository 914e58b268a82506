"""CLI — the Ray-Data equivalents of the reference's entry points
(ref:text_quality_filter/main.py:448-494 ``filter/train/sensitive`` and
ref:process_documents.py:86-161 ``process/...``):

    python -m chinese_corpus_cleaning_ray process  --input DIR --output DIR
        full filter+scrub checkpointed job (EP1+EP2 fused; resumable)
    python -m chinese_corpus_cleaning_ray filter   --input DIR --output DIR
        decisions only (no scrub column)
    python -m chinese_corpus_cleaning_ray sensitive --input DIR --output DIR
        scrub only
    python -m chinese_corpus_cleaning_ray train    --corpus DIR --model PATH
        train the char n-gram LM (A7) from the ``text`` column of kept rows
    python -m chinese_corpus_cleaning_ray synth    --output DIR --rows N
        write the deterministic synthetic transcript corpus
    python -m chinese_corpus_cleaning_ray crawl    --warc GLOB --output DIR
        WARC → strip → clean → langid → keep-zh → parquet (EP3 chain, C9)
    python -m chinese_corpus_cleaning_ray compact  --output DIR
        merge checkpoint piece files per (partition, input shard); crash-safe
    python -m chinese_corpus_cleaning_ray mergewords --lists F1 F2 ... --out F
        union+dedupe+sort word lists (ref merge_all_sensitive_words)
    python -m chinese_corpus_cleaning_ray filtertxt --input TXTDIR --output DIR
        EP1 verbatim: directory of .txt docs → kept scrubbed .txt docs +
        decisions parquet + stats (ref:main.py:253-315 input/output mode)
    python -m chinese_corpus_cleaning_ray dbscan --input DIR --output DIR
        offline DBSCAN corpus builder over an embedding column
        (ref:utils/clustering.py:49-120; parquet of (id, cluster, is_core)
        replaces the reference's driver-memory pickle)
    python -m chinese_corpus_cleaning_ray packchunks --input DIR --output DIR
        concat-and-chunk sequence packing: (id, n_tokens, chunk_id) layout
        via a distributed prefix-scan
    python -m chinese_corpus_cleaning_ray mixture --input DIR --output DIR \
        --weights '{"web": 6, "wiki": 1}' --budget-tokens N
        source-mixture resampling toward target token shares (integer
        rate table printed for audit/replay)
    python -m chinese_corpus_cleaning_ray sftexport --input DIR --output DIR
        transcript SFT exporter: optional first-K-turn prefix dedup, then
        one (context, target) parquet row per assistant turn

Owns the Ray session (guarded init) — the only place in the package that may
call ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import replace


def _ray_init(num_cpus: int | None):
    """Returns (ray, owned): ``owned`` is True iff WE initialized the session
    — only then may we shut it down (never tear down a caller's session).

    Address comes from $RAY_ADDRESS (default "local"): under `ray job
    submit` on a real cluster the env points at the running cluster and the
    driver must join it, not start a private local one."""
    import os

    import ray

    owned = not ray.is_initialized()
    if owned:
        kwargs = dict(address=os.environ.get("RAY_ADDRESS", "local"),
                      include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if num_cpus and kwargs["address"] == "local":
            # num_cpus is only meaningful when WE create the (local) cluster
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray, owned


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="chinese_corpus_cleaning_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name in ("process", "filter", "sensitive"):
        sp = sub.add_parser(name)
        sp.add_argument("--input", required=True)
        sp.add_argument("--output", required=True)
        sp.add_argument("--num-cpus", type=int, default=None)
        sp.add_argument("--no-resume", action="store_true")
        sp.add_argument("--enable-ppl", action="store_true")
        sp.add_argument("--wordlist", default=None)
        sp.add_argument("--checkpoint-every", type=int, default=64,
                        help="input files per manifest commit chunk; a crash "
                             "loses at most one chunk of work")
        sp.add_argument("--shared-output", action="store_true",
                        help="multi-writer mode: this driver owns only its own "
                             "input slice of the output dir (exclusive=False); "
                             "launch one driver per input slice, all pointed at "
                             "the same --output")

    tp = sub.add_parser("train")
    tp.add_argument("--corpus", required=True, help="parquet dir with a text column")
    tp.add_argument("--model", required=True)
    tp.add_argument("--order", type=int, default=5)
    tp.add_argument("--num-cpus", type=int, default=None)

    sp = sub.add_parser("synth")
    sp.add_argument("--output", required=True)
    sp.add_argument("--rows", type=int, default=100_000)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--skew", action="store_true")

    cp = sub.add_parser("crawl")
    cp.add_argument("--warc", required=True, help="WARC file/dir/glob")
    cp.add_argument("--output", required=True)
    cp.add_argument("--num-cpus", type=int, default=None)

    kp = sub.add_parser("compact")
    kp.add_argument("--output", required=True, help="checkpoint output dir")

    mp = sub.add_parser("mergewords")
    mp.add_argument("--lists", nargs="+", required=True)
    mp.add_argument("--out", required=True)

    tx = sub.add_parser("filtertxt")
    tx.add_argument("--input", required=True, help="directory of .txt documents")
    tx.add_argument("--output", required=True)
    tx.add_argument("--num-cpus", type=int, default=None)
    tx.add_argument("--enable-ppl", action="store_true")
    tx.add_argument("--wordlist", default=None)
    tx.add_argument("--vectorize", action="store_true",
                    help="also embed kept docs and write an embeddings parquet "
                         "(ref:process_documents.py --vectorize; deterministic "
                         "fake embedder unless transformers is installed)")

    pdp = sub.add_parser("paradedup")
    pdp.add_argument("--input", required=True,
                     help="parquet with id+text columns")
    pdp.add_argument("--output", required=True)
    pdp.add_argument("--id-col", default="doc_id")
    pdp.add_argument("--text-col", default="text")
    pdp.add_argument("--sep", default="\n")
    pdp.add_argument("--min-len", type=int, default=1,
                     help="paragraphs shorter than this always survive")
    pdp.add_argument("--num-cpus", type=int, default=None)

    ex = sub.add_parser("exportshards")
    ex.add_argument("--input", required=True, help="parquet with id+text")
    ex.add_argument("--output", required=True)
    ex.add_argument("--id-col", default="doc_id")
    ex.add_argument("--text-col", default="text")
    ex.add_argument("--shard-tokens", type=int, default=1_000_000)
    ex.add_argument("--seed", type=int, default=0)
    ex.add_argument("--num-cpus", type=int, default=None)

    pii = sub.add_parser("redactpii")
    pii.add_argument("--input", required=True,
                     help="parquet with a text column")
    pii.add_argument("--output", required=True)
    pii.add_argument("--text-col", default="text")
    pii.add_argument("--num-cpus", type=int, default=None)

    pk = sub.add_parser("packchunks")
    pk.add_argument("--input", required=True, help="parquet with id+text")
    pk.add_argument("--output", required=True)
    pk.add_argument("--id-col", default="doc_id")
    pk.add_argument("--text-col", default="text")
    pk.add_argument("--ctx-len", type=int, default=4096)
    pk.add_argument("--num-cpus", type=int, default=None)

    mx = sub.add_parser("mixture")
    mx.add_argument("--input", required=True,
                    help="parquet with id+key+text columns")
    mx.add_argument("--output", required=True)
    mx.add_argument("--key-col", default="source")
    mx.add_argument("--id-col", default="doc_id")
    mx.add_argument("--text-col", default="text")
    mx.add_argument("--weights", required=True,
                    help='JSON integer parts per source, e.g. '
                         '\'{"web": 6, "books": 3, "wiki": 1}\'')
    mx.add_argument("--budget-tokens", type=int, required=True)
    mx.add_argument("--num-cpus", type=int, default=None)

    sd = sub.add_parser("subdedup")
    sd.add_argument("--input", required=True, help="parquet with id+text")
    sd.add_argument("--output", required=True)
    sd.add_argument("--id-col", default="doc_id")
    sd.add_argument("--text-col", default="text")
    sd.add_argument("--window", type=int, default=30,
                    help="duplicated-substring window length (chars)")
    sd.add_argument("--min-docs", type=int, default=2)
    sd.add_argument("--report-only", action="store_true",
                    help="write (id, dup_chars, n_spans) instead of cutting")
    sd.add_argument("--num-cpus", type=int, default=None)

    dw = sub.add_parser("dsir")
    dw.add_argument("--input", required=True, help="parquet with id+text")
    dw.add_argument("--output", required=True)
    dw.add_argument("--id-col", default="doc_id")
    dw.add_argument("--text-col", default="text")
    dw.add_argument("--target-col", required=True,
                    help="column selecting the target slice, e.g. lang")
    dw.add_argument("--target-val", required=True)
    dw.add_argument("--n-buckets", type=int, default=64)
    dw.add_argument("--num-cpus", type=int, default=None)

    se = sub.add_parser("search")
    se.add_argument("--input", required=True, help="parquet with id+text")
    se.add_argument("--query", required=True)
    se.add_argument("--top", type=int, default=10)
    se.add_argument("--id-col", default="doc_id")
    se.add_argument("--text-col", default="text")
    se.add_argument("--num-cpus", type=int, default=None)

    sm = sub.add_parser("semdedup")
    sm.add_argument("--input", required=True,
                    help="parquet with id+embedding columns")
    sm.add_argument("--output", required=True)
    sm.add_argument("--id-col", default="vec_id")
    sm.add_argument("--vec-col", default="embedding")
    sm.add_argument("--threshold", type=float, default=0.85)
    sm.add_argument("--n-clusters", type=int, default=None)
    sm.add_argument("--num-cpus", type=int, default=None)

    sf = sub.add_parser("sftexport")
    sf.add_argument("--input", required=True,
                    help="transcript parquet (conv_id, turn_idx, role, text)")
    sf.add_argument("--output", required=True)
    sf.add_argument("--context-turns", type=int, default=3)
    sf.add_argument("--dedup-prefix", type=int, default=0,
                    help="if > 0, first collapse conversations sharing an "
                         "identical first-K-turn (role, text) prefix")
    sf.add_argument("--num-cpus", type=int, default=None)

    cq = sub.add_parser("convqa")
    cq.add_argument("--input", required=True,
                    help="transcript parquet (conv_id, turn_idx, role, text)")
    cq.add_argument("--output", required=True,
                    help="conv-level gate table (one row per conversation)")
    cq.add_argument("--max-selfrep-num", type=int, default=1)
    cq.add_argument("--max-selfrep-den", type=int, default=5,
                    help="keep requires n_selfrep*den <= n_role_turns*num")
    cq.add_argument("--num-cpus", type=int, default=None)

    pf = sub.add_parser("profile")
    pf.add_argument("--input", required=True,
                    help="transcript parquet (conv_id, turn_idx, role, text)")
    pf.add_argument("--num-cpus", type=int, default=None)

    dp = sub.add_parser("dbscan")
    dp.add_argument("--input", required=True, help="parquet with id+embedding columns")
    dp.add_argument("--output", required=True)
    dp.add_argument("--id-col", default="vec_id")
    dp.add_argument("--vec-col", default="embedding")
    dp.add_argument("--threshold", type=float, default=0.85)
    dp.add_argument("--min-samples", type=int, default=3)
    dp.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from chinese_corpus_cleaning_ray.sources.transcripts import write_transcripts

        out = write_transcripts(args.output, args.rows, seed=args.seed, skew=args.skew)
        print(json.dumps({"written": out, "rows": args.rows}))
        return 0

    if args.cmd == "compact":
        from chinese_corpus_cleaning_ray.state.compact import compact

        print(json.dumps(compact(args.output)))
        return 0

    if args.cmd == "mergewords":
        from chinese_corpus_cleaning_ray.functions.wordlists import merge_wordlists

        n = merge_wordlists(args.lists, args.out)
        print(json.dumps({"out": args.out, "entries": n}))
        return 0

    if args.cmd == "filtertxt":
        # EP1 verbatim UX (ref:text_quality_filter/main.py:253-315): a
        # directory of .txt docs in, kept (scrubbed) .txt docs + a decisions
        # parquet + run stats out — over the streaming pipeline instead of a
        # sequential per-file loop.
        ray, owned = _ray_init(args.num_cpus)
        try:
            import os

            from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
            from chinese_corpus_cleaning_ray.functions.wordlists import load_words
            from chinese_corpus_cleaning_ray.pipelines.quality import (
                build_quality_pipeline,
                quality_counters,
            )
            from chinese_corpus_cleaning_ray.sources.textdir import (
                read_text_dir,
                write_text_dir,
            )

            cfg = DEFAULT_CONFIG
            if args.enable_ppl:
                cfg = replace(cfg, enable_perplexity=True)
            words = load_words(args.wordlist) if args.wordlist else None
            scored = build_quality_pipeline(read_text_dir(args.input), cfg,
                                            words=words).materialize()
            kept = scored.filter(expr="keep == True")
            out_text_col = "scrubbed_text" if cfg.enable_scrub else "text"
            write_text_dir(kept, os.path.join(args.output, "txt"),
                           text_col=out_text_col).sum("files_written")
            scored.drop_columns(["path"]).write_parquet(
                os.path.join(args.output, "decisions"))
            if args.vectorize:
                # EP2's --vectorize (ref:process_documents.py:86-161): embed
                # the KEPT docs' output text; real HF encoder when installed,
                # deterministic fake otherwise (same Ray plumbing either way)
                from chinese_corpus_cleaning_ray.stages.embed import (
                    DeterministicFakeEmbedder,
                    HFEmbedder,
                    embed_texts,
                )

                def factory():
                    try:
                        return HFEmbedder()
                    except NotImplementedError:
                        return DeterministicFakeEmbedder()

                embed_texts(
                    kept.select_columns(["doc_id", out_text_col])
                        .rename_columns({out_text_col: "text"}) if out_text_col != "text"
                    else kept.select_columns(["doc_id", "text"]),
                    embedder_factory=factory,
                ).write_parquet(os.path.join(args.output, "embeddings"))
            stats = quality_counters(scored)  # ungrouped aggregate → dict
            print(json.dumps({k: int(v) for k, v in stats.items()}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "exportshards":
        # token-balanced training-shard export: shard=<k>/ directories of
        # ~shard-tokens mass each, deterministic membership (id, seed)
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.stages.analysis import (
                export_training_shards,
            )

            m = export_training_shards(
                rd.read_parquet(args.input,
                                columns=[args.id_col, args.text_col]),
                args.output, id_col=args.id_col, text_col=args.text_col,
                shard_tokens=args.shard_tokens, seed=args.seed)
            print(json.dumps(m))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "redactpii":
        # structured-PII pass as a standalone preprocessing step: parquet in,
        # parquet out with redacted_text + per-category counts appended, and
        # run-level totals on stdout
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.functions.pii import (
                PII_PATTERNS,
                redact_pii,
            )

            out = redact_pii(rd.read_parquet(args.input),
                             text_col=args.text_col).materialize()
            out.write_parquet(args.output)
            totals = {f"{name}_count": int(out.sum(f"{name}_count") or 0)
                      for name, _, _ in PII_PATTERNS}
            totals["pii_total"] = int(out.sum("pii_total") or 0)
            print(json.dumps({"rows": out.count(), "output": args.output,
                              **totals}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "paradedup":
        # corpus-wide paragraph/line dedup (CCNet/C4-style boilerplate
        # removal) as a standalone preprocessing pass: parquet in, cleaned
        # (id, text) parquet out, with before/after row+char counters
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.stages.dedup_stage import paragraph_dedup

            ds = rd.read_parquet(args.input,
                                 columns=[args.id_col, args.text_col])
            n_in = ds.count()
            out = paragraph_dedup(ds, id_col=args.id_col,
                                  text_col=args.text_col, sep=args.sep,
                                  min_len=args.min_len,
                                  num_rows_hint=n_in).materialize()
            out.write_parquet(args.output)
            import pyarrow as pa
            import pyarrow.compute as pc

            chars_out = int(out.map_batches(
                lambda t: pa.table({"n": pa.array(
                    [pc.sum(pc.utf8_length(t.column(args.text_col))).as_py() or 0],
                    pa.int64())}),
                batch_format="pyarrow").sum("n") or 0)
            print(json.dumps({"docs_in": n_in, "docs_out": out.count(),
                              "chars_out": chars_out, "output": args.output}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "subdedup":
        # cross-document duplicated-substring scrub (Lee-et-al-style window
        # dedup, stages/substring_dedup.py): cuts every span covered by a
        # window occurring in >= min_docs distinct docs, or reports the mass
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.stages.substring_dedup import (
                duplicated_window_spans,
                scrub_duplicated_windows,
            )

            ds = rd.read_parquet(args.input,
                                 columns=[args.id_col, args.text_col])
            fn = (duplicated_window_spans if args.report_only
                  else scrub_duplicated_windows)
            out = fn(ds, id_col=args.id_col, text_col=args.text_col,
                     window=args.window, min_docs=args.min_docs).materialize()
            out.write_parquet(args.output)
            removed = int(out.sum("dup_chars") or 0)
            print(json.dumps({"rows": out.count(), "dup_chars": removed,
                              "window": args.window, "min_docs": args.min_docs,
                              "output": args.output}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "packchunks":
        # concat-and-chunk sequence packing: (id, n_tokens, chunk_id)
        # parquet out — the chunk layout a trainer consumes, computed as a
        # distributed prefix-scan (see stages/analysis.py:pack_chunks)
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.stages.analysis import pack_chunks

            ds = rd.read_parquet(args.input,
                                 columns=[args.id_col, args.text_col])
            out = pack_chunks(ds, id_col=args.id_col, text_col=args.text_col,
                              ctx_len=args.ctx_len).materialize()
            out.write_parquet(args.output)
            total = int(out.sum("n_tokens") or 0)
            n_chunks = int((out.max("chunk_id") + 1)
                           if out.count() else 0)
            print(json.dumps({"rows": out.count(), "total_tokens": total,
                              "ctx_len": args.ctx_len, "n_chunks": n_chunks,
                              "output": args.output}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "mixture":
        # source-mixture resampling toward target token shares (see
        # stages/analysis.py:mixture_plan/mixture_sample); prints the
        # integer rate table so the cut is auditable and replayable
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.stages.analysis import (
                mixture_plan,
                mixture_sample,
            )

            weights = {k: int(v) for k, v in json.loads(args.weights).items()}
            cols = [args.id_col, args.key_col, args.text_col]
            rates = mixture_plan(rd.read_parquet(args.input, columns=cols),
                                 args.key_col, weights, args.budget_tokens,
                                 text_col=args.text_col)
            out = mixture_sample(rd.read_parquet(args.input, columns=cols),
                                 args.key_col, args.id_col, weights,
                                 args.budget_tokens, text_col=args.text_col,
                                 rates=rates).materialize()
            out.write_parquet(args.output)
            print(json.dumps({"rows_kept": out.count(),
                              "rates_permyriad": rates,
                              "output": args.output}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "sftexport":
        # transcript SFT exporter: optional cross-conversation prefix dedup
        # (rerun collapse), then one (context, target) row per assistant turn
        ray, owned = _ray_init(args.num_cpus)
        try:
            import pyarrow as _pa
            import ray.data as rd

            from chinese_corpus_cleaning_ray.pipelines.conversations import (
                build_sft_pairs,
                conversation_prefix_dedup,
            )

            ds = rd.read_parquet(
                args.input, columns=["conv_id", "turn_idx", "role", "text"])
            if args.dedup_prefix > 0:
                from chinese_corpus_cleaning_ray.stages.dedup_stage import (
                    semi_filter,
                )

                def _keepers(batch: _pa.Table) -> _pa.Table:
                    return batch.filter(batch.column("keep")).select(["conv_id"])

                kept = conversation_prefix_dedup(
                    ds, k=args.dedup_prefix).map_batches(
                        _keepers, batch_format="pyarrow")
                ds, _ = semi_filter(ds, kept, "conv_id")
            out = build_sft_pairs(ds, context_turns=args.context_turns)
            out = out.materialize()
            out.write_parquet(args.output)
            print(json.dumps({"pairs": out.count(), "out": args.output}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "profile":
        # one-call corpus profile: tidy integer metric rows to stdout
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.pipelines.conversations import (
                corpus_profile,
            )

            ds = rd.read_parquet(
                args.input, columns=["conv_id", "turn_idx", "role", "text"])
            df = corpus_profile(ds)
            print(json.dumps(dict(zip(df["metric"],
                                      (int(v) for v in df["value"])))))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "convqa":
        # conversation-level structural QA gate: completeness AND loop-rate
        # AND starts-with-user, one row per conversation
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.pipelines.conversations import (
                conversation_qa_gate,
            )

            ds = rd.read_parquet(
                args.input, columns=["conv_id", "turn_idx", "role", "text"])
            import pyarrow as _pa
            import pyarrow.compute as _pc

            out = conversation_qa_gate(
                ds, max_selfrep_num=args.max_selfrep_num,
                max_selfrep_den=args.max_selfrep_den).materialize()

            def _kept(batch: _pa.Table) -> _pa.Table:
                n = _pc.sum(_pc.cast(batch.column("keep"), _pa.int64()))
                return _pa.table({"n": _pa.array([n.as_py() or 0], _pa.int64())})

            kept = int(out.map_batches(
                _kept, batch_format="pyarrow").sum("n") or 0)
            out.write_parquet(args.output)
            print(json.dumps({"convs": out.count(), "kept": kept,
                              "out": args.output}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "dsir":
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.stages.relevance import dsir_weights

            ds = rd.read_parquet(
                args.input,
                columns=[args.id_col, args.target_col, args.text_col])
            out = dsir_weights(ds, target_col=args.target_col,
                               target_val=args.target_val,
                               text_col=args.text_col, id_col=args.id_col,
                               n_buckets=args.n_buckets).materialize()
            out.write_parquet(args.output)
            print(json.dumps({"rows": out.count(), "out": args.output}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "search":
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.stages.relevance import tfidf_search

            ds = rd.read_parquet(args.input,
                                 columns=[args.id_col, args.text_col])
            hits = tfidf_search(ds, args.query, text_col=args.text_col,
                                id_col=args.id_col, top=args.top).to_pandas()
            print(json.dumps({"hits": hits.to_dict(orient="records")}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "semdedup":
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.stages.similarity import semdedup

            ds = rd.read_parquet(args.input,
                                 columns=[args.id_col, args.vec_col])
            deduped, dup_ids = semdedup(
                ds, id_col=args.id_col, vec_col=args.vec_col,
                threshold=args.threshold, n_clusters=args.n_clusters)
            deduped = deduped.materialize()
            deduped.write_parquet(args.output)
            print(json.dumps({"kept": deduped.count(), "out": args.output}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "dbscan":
        ray, owned = _ray_init(args.num_cpus)
        try:
            import ray.data as rd

            from chinese_corpus_cleaning_ray.stages.similarity import dbscan_clusters

            import pyarrow as pa

            ds = rd.read_parquet(args.input, columns=[args.id_col, args.vec_col])
            out = dbscan_clusters(ds, id_col=args.id_col, vec_col=args.vec_col,
                                  threshold=args.threshold,
                                  min_samples=args.min_samples).materialize()
            n = out.count()
            clustered = int(out.map_batches(
                lambda t: pa.table({"n": pa.array(
                    [t.num_rows - t.column("cluster").null_count], pa.int64())}),
                batch_format="pyarrow",
            ).sum("n") or 0)
            out.write_parquet(args.output)
            print(json.dumps({"rows": n, "clustered": clustered,
                              "noise": n - clustered, "out": args.output}))
            return 0
        finally:
            if owned:
                ray.shutdown()

    if args.cmd == "crawl":
        ray, owned = _ray_init(args.num_cpus)
        try:
            from chinese_corpus_cleaning_ray.pipelines.crawl import run_crawl_job

            print(json.dumps(run_crawl_job(args.warc, args.output)))
            return 0
        finally:
            if owned:
                ray.shutdown()

    ray, owned = _ray_init(args.num_cpus)
    try:
        if args.cmd == "train":
            import ray.data as rd

            from chinese_corpus_cleaning_ray.functions.ngram_lm import NgramModel

            ds = rd.read_parquet(
                [args.corpus] if args.corpus.endswith(".parquet") else args.corpus,
                columns=["text"],
            )
            # limit().to_pandas() — columnar pull; take() iterates rows at
            # ~0.5 ms/row (measured) and would cost ~25 s for this sample
            texts = ds.limit(50_000).to_pandas()["text"].tolist()
            model = NgramModel(n=args.order).train(texts)
            model.save(args.model)
            print(json.dumps({"model": args.model, "order": args.order,
                              "vocab": len(model.vocab), "texts": len(texts)}))
            return 0

        from chinese_corpus_cleaning_ray.config import DEFAULT_CONFIG
        from chinese_corpus_cleaning_ray.functions.wordlists import load_words
        from chinese_corpus_cleaning_ray.state.checkpoint import run_quality_job

        cfg = DEFAULT_CONFIG
        if args.cmd == "filter":
            cfg = replace(cfg, enable_scrub=False)
        elif args.cmd == "sensitive":
            cfg = replace(cfg, enable_langid=False, enable_perplexity=False)
        if args.enable_ppl:
            cfg = replace(cfg, enable_perplexity=True)
        words = load_words(args.wordlist) if args.wordlist else None
        stats = run_quality_job(args.input, args.output, cfg,
                                resume=not args.no_resume, words=words,
                                checkpoint_every=args.checkpoint_every,
                                exclusive=not args.shared_output)
        print(json.dumps(stats))
        return 0
    finally:
        if owned:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
