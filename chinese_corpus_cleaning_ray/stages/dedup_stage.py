"""Distributed deduplication stages.

Re-expression of the reference's corpus-level duplicate detection (embedding +
DBSCAN over an O(n²) cosine matrix, disabled by default —
ref:text_quality_filter/utils/clustering.py:68-90,127-185) as shuffle-friendly
Ray Data plans (SURVEY §2.6 D4):

- ``exact_dedup``    — content-hash groupby, keep the member with the minimum
  id (deterministic "first occurrence" independent of arrival order).
- ``minhash_dedup``  — char-shingle MinHash signatures per row (actor pool,
  numpy-vectorized) → flat_map to (band_id, band_hash) bucket rows → groupby
  over bands → mark every non-minimal member of a bucket as duplicate →
  remove marked rows.
- ``simhash_mark``   — 64-bit SimHash column for downstream Hamming bucketing.
- ``ngram_jaccard_pairs`` — verification kernel: exact Jaccard over shingle
  sets for candidate pairs (used to confirm MinHash candidates).

Partitioning assumptions (documented per the build brief):
- grouping always happens on a COARSE shard of the hash key (256 shards by
  default), never one group per bucket: per-group Python overhead at tens of
  thousands of groups dominates otherwise. Bucket-level logic is vectorized
  pandas inside each shard. Shard count is the knob to keep a shard within
  worker memory at scale.
- the duplicate-key set is assumed ≪ input size. ``strategy="broadcast"``
  collects it to the driver and broadcasts via ``ray.put``;
  ``strategy="join"`` keeps it distributed and uses a hash left-join +
  null-filter (anti-join) — choose it when dup keys may not fit the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from chinese_corpus_cleaning_ray.functions.dedup import (
    MinHasher,
    band_hashes,
    char_shingles,
    jaccard,
    simhash64,
    text_hash64_column,
)


def _pow2_shards(n_rows: int, target_rows: int, lo: int = 64,
                 hi: int = 65536) -> int:
    """Power-of-two shard count sized so ~``target_rows`` input rows land in
    each shard (clamped). Outputs of every dedup are shard-count-invariant
    (all copies of a key share a shard at any count), so this is purely a
    memory knob — at 100× data the shard count grows 100×, per-shard memory
    stays flat."""
    want = max(1, (max(n_rows, 1) + target_rows - 1) // target_rows)
    return int(min(hi, max(lo, 1 << int(np.ceil(np.log2(want))))))


def anti_filter(ds, dup_ids_ds, id_col: str, strategy: str = "auto",
                broadcast_limit: int = 2_000_000,
                _keep_matches: bool = False):
    """Shared ending for every dedup: remove rows of ``ds`` whose ``id_col``
    appears in ``dup_ids_ds`` (a one-column Dataset of duplicate ids, possibly
    with repeats and possibly containing the schema-less empty blocks a
    ``map_groups`` shuffle emits).

    ``strategy="auto"`` (default) materializes the dup-id set (tiny relative
    to the corpus) and lets its COUNT choose the side: ≤ ``broadcast_limit``
    distinct-ish ids → driver collect + ``ray.put`` broadcast; above it → a
    fully distributed hash anti-join so the driver never holds the set (the
    100-TB safety valve — a 30% dup rate on 10^12 rows is billions of keys).
    ``"broadcast"`` / ``"join"`` force a side.

    Returns ``(filtered_ds, dup_ids)`` where ``dup_ids`` is a sorted list on
    the broadcast path or the materialized dup-id Dataset on the join path.
    """
    from chinese_corpus_cleaning_ray.stages.pools import cluster_cpus

    if strategy in ("auto", "join"):
        # materialize the dup-id set (distributed blocks, NOT a driver
        # collect — it stays in the object store) so we can count it: auto
        # uses the count to choose a side, and the join path needs an
        # explicit empty-set guard — an all-empty map_groups output feeds the
        # Count aggregate a schema-less block that breaks the join's key
        # resolution.
        dup_ids_ds = dup_ids_ds.materialize()
        n_dups = dup_ids_ds.count()
        if strategy == "auto":
            strategy = "broadcast" if n_dups <= broadcast_limit else "join"
        if strategy == "join" and n_dups == 0:
            if _keep_matches:
                return (ds.map_batches(lambda b: b.slice(0, 0),
                                       batch_format="pyarrow"), dup_ids_ds)
            return ds, dup_ids_ds

    if strategy == "join":
        # fully-distributed hash anti-join WITHOUT Dataset.join: Ray 2.49's
        # hash-shuffle join builds a zero-column table for any partition
        # whose right side received no rows, and the pyarrow join then fails
        # key resolution ("No match ... for key field reference") — a sparse
        # dup-id set (the common case) trips it almost surely. Instead, both
        # sides are tagged with the SAME hash shard of the id, unioned (a
        # lazy block concat, no shuffle), and one coarse-shard groupby drops
        # corpus rows whose id appears among the co-sharded dup rows —
        # vectorized pandas per shard, per-shard memory = corpus/P + dups/P,
        # nothing ever on the driver.
        import ray
        from ray.data import from_arrow_refs

        # normalize the dup-id blocks first: the upstream map_groups shuffle
        # emits schema-less empty blocks for rowless partitions, and
        # map_batches would skip (not repair) them — rewrite every block to
        # a one-column arrow table in a Ray task (refs only, no driver pull).
        @ray.remote
        def _norm_block(tbl: pa.Table, col: str) -> pa.Table:
            if tbl.num_columns == 0:
                return None  # resolved to a skippable empty below
            return tbl.select([col])

        @ray.remote
        def _is_block(tbl) -> bool:
            # deref happens in the worker; only the bool reaches the driver
            return tbl is not None

        norm_refs = [_norm_block.remote(r, id_col)
                     for r in dup_ids_ds.to_arrow_refs()]
        flags = ray.get([_is_block.remote(r) for r in norm_refs])
        keep_refs = [r for r, ok in zip(norm_refs, flags) if ok]
        # the driver sees only booleans — dup-id BLOCKS never leave the
        # object store. At least one block is non-empty because n_dups > 0.
        dup_clean = from_arrow_refs(keep_refs)

        shards = max(8, cluster_cpus())

        def _shard_of(ids: pd.Series) -> np.ndarray:
            h = pd.util.hash_pandas_object(ids, index=False).to_numpy()
            return (h % np.uint64(shards)).astype(np.int32)

        def tag_left(batch: pa.Table) -> pa.Table:
            s = _shard_of(batch.column(id_col).to_pandas())
            return batch.append_column(
                "__shard", pa.array(s)
            ).append_column(
                "__is_dup", pa.array(np.zeros(batch.num_rows, dtype=np.int8))
            )

        tagged_left = ds.map_batches(tag_left, batch_format="pyarrow")
        sch = tagged_left.schema().base_schema

        def tag_right(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).cast(sch.field(id_col).type)
            n = len(ids)
            cols = []
            for f in sch:
                if f.name == id_col:
                    cols.append(ids)
                elif f.name == "__shard":
                    cols.append(pa.array(_shard_of(ids.to_pandas())))
                elif f.name == "__is_dup":
                    cols.append(pa.array(np.ones(n, dtype=np.int8)))
                else:
                    cols.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(cols, schema=sch)

        tagged_right = dup_clean.map_batches(tag_right, batch_format="pyarrow")

        def anti(group: pa.Table) -> pa.Table:
            # pure-Arrow group kernel: no pandas round-trip, so column types
            # (timestamps especially) pass through bit-identical
            is_dup = pc.equal(group.column("__is_dup"), 1)
            dup_vals = group.filter(is_dup).column(id_col).combine_chunks()
            hit = pc.is_in(group.column(id_col), value_set=dup_vals)
            mask = pc.and_(pc.invert(is_dup),
                           hit if _keep_matches else pc.invert(hit))
            return group.filter(mask).drop_columns(["__shard", "__is_dup"])

        out = (
            tagged_left.union(tagged_right)
            .groupby("__shard")
            .map_groups(anti, batch_format="pyarrow")
        )
        return out, dup_ids_ds

    # broadcast strategy: collect distinct dup ids (small by choice above),
    # ship ONCE via ray.put, vectorized is_in filter per batch. NB:
    # to_pandas, not take_all — row iteration over many small blocks costs
    # ~0.5 ms/row; the columnar pull is ~100× faster.
    dup_pdf = dup_ids_ds.to_pandas()
    dup_ids = sorted(set(dup_pdf[id_col])) if len(dup_pdf) else []
    if not dup_ids:
        if _keep_matches:
            return (ds.map_batches(lambda b: b.slice(0, 0),
                                   batch_format="pyarrow"), [])
        return ds, []
    try:
        import ray

        dup_ref = ray.put(pa.array(dup_ids))
    except Exception:
        dup_ref = pa.array(dup_ids)

    def drop_dups(batch: pa.Table) -> pa.Table:
        import ray as _ray

        dups = dup_ref
        if isinstance(dups, _ray.ObjectRef):
            dups = _ray.get(dups)
        col = batch.column(id_col)
        hit = pc.is_in(col, value_set=dups.cast(col.type))
        mask = hit if _keep_matches else pc.invert(hit)
        return batch.filter(mask)

    return ds.map_batches(drop_dups, batch_format="pyarrow"), dup_ids


def semi_filter(ds, keep_ids_ds, id_col: str, strategy: str = "auto",
                broadcast_limit: int = 2_000_000):
    """Keep ONLY rows of ``ds`` whose ``id_col`` appears in ``keep_ids_ds``
    — the positive (semi-join) twin of :func:`anti_filter`, sharing its
    auto broadcast/distributed-join valve. The common shape it replaces is
    ``hash_join(big_corpus, small_keep_set)``: when the keep set fits the
    broadcast limit, the corpus never shuffles at all (one ``ray.put`` +
    a vectorized ``is_in`` per batch); above the limit it degrades to the
    same co-sharded union+groupby membership plan as anti_filter, still
    one exchange and never a driver collect. Returns ``(filtered_ds,
    keep_ids)`` exactly like anti_filter."""
    return anti_filter(ds, keep_ids_ds, id_col, strategy=strategy,
                       broadcast_limit=broadcast_limit, _keep_matches=True)


def make_row_key(batch: pa.Table) -> pa.Table:
    """Composite sortable key ``conv_id#turn_idx(zero-padded)`` for transcript
    tables — lexicographic order == (conv_id, turn_idx) order. Vectorized
    (Arrow cast + lpad + join); the rare negative turn_idx falls back to the
    Python formatter so the historical ``{t:010d}`` bytes are preserved."""
    turn = batch.column("turn_idx")
    tmin = pc.min(turn).as_py() if batch.num_rows else 0
    if tmin is not None and tmin >= 0:
        padded = pc.utf8_lpad(pc.cast(turn, pa.string()), 10, padding="0")
        keys = pc.binary_join_element_wise(
            pc.cast(batch.column("conv_id"), pa.string()), padded, "#")
        return batch.append_column("row_key", keys)
    conv = batch.column("conv_id").to_pylist()
    keys = [f"{c}#{t:010d}" for c, t in zip(conv, turn.to_pylist())]
    return batch.append_column("row_key", pa.array(keys, pa.string()))


def add_text_hash(ds, text_col: str = "text"):
    """Append a vectorized 64-bit content hash column (`text_hash`). One
    hash family for every dedup stage — both sides of any hash comparison
    (incremental dedup, Bloom build/probe) come through here."""
    def fn(batch: pa.Table) -> pa.Table:
        hashes = text_hash64_column(batch.column(text_col))
        return batch.append_column("text_hash", pa.array(hashes, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def exact_dedup(ds, id_col: str, text_col: str = "text",
                shards: int | None = None,
                target_docs_per_shard: int = 65536,
                num_rows_hint: int | None = None):
    """Keep the min-``id_col`` row per distinct text.

    Shuffle key is a COARSE shard of the 64-bit content hash, not the hash
    itself: ``groupby.map_groups`` pays ~0.3 ms of per-group Python overhead,
    so one group per distinct text is pathological (measured 20s for 80k
    groups). One group per shard + a vectorized pandas dedup inside is ~100×
    cheaper. All copies of a text share its hash ⇒ share its shard.
    ``shards=None`` (default) sizes the power-of-two shard count from the
    input row count (~``target_docs_per_shard`` rows per shard) so a shard
    stays within worker memory at any corpus size; the output is
    shard-count-invariant. ``num_rows_hint`` sidesteps the sizing
    ``ds.count()`` when ``ds`` is a DERIVED pipeline — counting a derived
    Dataset executes its whole upstream plan once just for the count, then
    again for the real run (measured ~2× on the incremental-ingestion path).
    Any upper bound on the row count works (shard count only controls
    per-shard memory)."""
    if shards is None:
        n = num_rows_hint if num_rows_hint is not None else ds.count()
        shards = _pow2_shards(n, target_docs_per_shard, lo=256)
    ds = add_text_hash(ds, text_col)

    def add_shard(batch: pa.Table) -> pa.Table:
        # batch-local pre-collapse (hot-duplicate valve): only the local
        # min-id copy of a text repeated WITHIN this batch can be the global
        # keeper, so drop the others before the shuffle — a text duplicated
        # across the whole corpus ships once per batch instead of once per
        # row, and its content-hash shard stays per-batch bounded. Bit-exact:
        # global min-id = min over batch min-ids.
        n = batch.num_rows
        if n:
            hashes = batch.column("text_hash").to_numpy(zero_copy_only=False)
            # cheap probe first: any repeated hash in this batch at all?
            if n - pd.unique(hashes).size > 0:
                sub = pd.DataFrame({
                    "h": hashes,
                    # dedup on the TEXT itself (hash only pre-screens) so a
                    # hash collision can never drop a distinct text
                    "t": np.asarray(
                        batch.column(text_col).to_pylist(), dtype=object),
                    "pos": np.arange(n),
                    "i": batch.column(id_col).to_numpy(zero_copy_only=False),
                }).sort_values(["i"], kind="mergesort")
                keep = np.ones(n, dtype=bool)
                keep[sub.loc[sub.duplicated(subset=["h", "t"]),
                             "pos"].to_numpy()] = False
                if not keep.all():
                    batch = batch.filter(pa.array(keep))
        # shards must be a power of two: shard = hash & (shards-1)
        shard = pc.bit_wise_and(batch.column("text_hash"), shards - 1)
        return batch.append_column("shard", pc.cast(shard, pa.int32()))

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([id_col], kind="mergesort")
        g = g.drop_duplicates(subset=[text_col], keep="first")
        return g.drop(columns=["text_hash", "shard"])

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(keep_first, batch_format="pandas")
    )


_MINHASH_CACHE: dict = {}


class MinHashStage:
    """Per-row MinHash signature + LSH band bucket rows.

    Emits one row per (input row × band): (id, band_id, band_hash). Usable as
    an actor-pool class OR (preferred) via ``make_minhash_bands_fn`` as a
    plain task stage: the hasher state is just two small coefficient arrays
    (microseconds to build, cached per worker process), so an actor pool buys
    nothing here and its spin-up costs ~1.5 s per query — reserve pools for
    genuinely expensive state (43k-word tries, LMs)."""

    def __init__(self, id_col: str, text_col: str = "text", num_perm: int = 64,
                 num_bands: int = 16, shingle_k: int = 5, seed: int = 42):
        self.id_col = id_col
        self.text_col = text_col
        self.num_bands = num_bands
        self.shingle_k = shingle_k
        self.hasher = MinHasher(num_perm=num_perm, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from chinese_corpus_cleaning_ray.functions.dedup import band_hashes_batch

        texts = batch.column(self.text_col).to_pylist()
        shingle_arrays = [char_shingles(t, self.shingle_k) for t in texts]
        sigs = self.hasher.signatures_batch(shingle_arrays)  # (n, P)
        bands = band_hashes_batch(sigs, self.num_bands)  # (n, B) int64
        n = len(texts)
        ids = batch.column(self.id_col)
        # one output row per (row, band): repeat ids, tile band indices
        rep_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), self.num_bands))
        return pa.table(
            {
                self.id_col: ids.take(rep_idx),
                "band_id": pa.array(
                    np.tile(np.arange(self.num_bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(bands.ravel()),
            }
        )


def make_minhash_bands_fn(id_col: str, text_col: str = "text", num_perm: int = 64,
                          num_bands: int = 16, shingle_k: int = 5, seed: int = 42):
    """Task-stage variant of MinHashStage with a per-worker-process cache."""
    key = (id_col, text_col, num_perm, num_bands, shingle_k, seed)

    def bands_fn(batch: pa.Table) -> pa.Table:
        stage = _MINHASH_CACHE.get(key)
        if stage is None:
            stage = MinHashStage(id_col=id_col, text_col=text_col, num_perm=num_perm,
                                 num_bands=num_bands, shingle_k=shingle_k, seed=seed)
            _MINHASH_CACHE[key] = stage
        return stage(batch)

    return bands_fn


def minhash_dedup(
    ds,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    strategy: str = "auto",
    broadcast_limit: int = 2_000_000,
    concurrency=8,
    verify_threshold: float | None = None,
    verify_k: int | None = None,
    verify_broadcast_limit: int = 100_000,
):
    """Returns (deduped_ds, dup_ids_list_or_ds). A row is a duplicate when ANY
    LSH band bucket contains a row with a smaller id.

    ``verify_threshold`` (off by default) adds EXACT verification: a band
    collision only nominates a CANDIDATE pair (bucket-min keeper, member);
    the pair is then verified by exact ``verify_k``-gram Jaccard
    (default: ``shingle_k``) and the member is dropped only when the score
    reaches the threshold. This matches the reference's duplicate notion —
    *verified* similarity, not bucket equality
    (ref:text_quality_filter/utils/clustering.py:169-185 computes the real
    cosine ≥ 0.85 before declaring a duplicate) — and turns silent
    false-positive kills (band-collision ≠ similar) into survivals. Cost:
    candidate pairs are O(num_bands·n) at worst (each row pairs with at most
    one keeper per band, deduped), the pair set is materialized ONCE and fed
    through two distributed ``hash_join``s against the column-pruned
    (id, text) side to fetch both texts — never an O(n²) scan, never a
    driver-side text pull (when the candidate id set fits the broadcast
    limit the doc side is prefiltered to candidates before the joins, so the
    joins move candidate texts only).

    ``strategy="auto"`` (default) counts the distinct dup ids first (tiny
    metadata pass over the materialized dup-id set) and broadcasts them via
    ``ray.put`` when ≤ ``broadcast_limit``, else falls back to the distributed
    hash anti-join — nobody has to know about the knob for the 100-TB path to
    stay safe. ``"broadcast"`` / ``"join"`` force a side (see anti_filter)."""
    bands = ds.map_batches(
        make_minhash_bands_fn(id_col=id_col, text_col=text_col, num_perm=num_perm,
                              num_bands=num_bands, shingle_k=shingle_k, seed=seed),
        batch_format="pyarrow",
    )

    # Coarse-shard the bucket space (see exact_dedup): group per shard, then a
    # vectorized groupby-transform("min") marks every non-minimal member of
    # each (band_id, band_hash) bucket. band_hash determines the shard, so a
    # bucket never splits across shards.
    shards = 256

    def add_shard(batch: pa.Table) -> pa.Table:
        # shards must be a power of two: shard = hash & (shards-1)
        shard = pc.bit_wise_and(batch.column("band_hash"), shards - 1)
        return batch.append_column("shard", pc.cast(shard, pa.int32()))

    sharded = bands.map_batches(add_shard, batch_format="pyarrow")

    if verify_threshold is None:
        def mark_dups(group: pd.DataFrame) -> pd.DataFrame:
            mins = group.groupby(["band_id", "band_hash"])[id_col].transform("min")
            return group.loc[group[id_col] != mins, [id_col]]

        dup_ids_ds = (
            sharded.groupby("shard").map_groups(mark_dups, batch_format="pandas")
        )
        return anti_filter(ds, dup_ids_ds, id_col, strategy=strategy,
                           broadcast_limit=broadcast_limit)

    pairs_ds = _verified_minhash_pairs(
        ds, sharded, id_col=id_col, text_col=text_col,
        k=(verify_k if verify_k is not None else shingle_k),
        threshold=verify_threshold, broadcast_limit=broadcast_limit,
        verify_broadcast_limit=verify_broadcast_limit,
    )

    def ib_only(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return batch
        return pa.table({id_col: batch.column("ib")})

    dup_ids_ds = pairs_ds.map_batches(ib_only, batch_format="pyarrow")
    return anti_filter(ds, dup_ids_ds, id_col, strategy=strategy,
                       broadcast_limit=broadcast_limit)


def minhash_edges(ds, id_col: str, text_col: str = "text",
                  num_perm: int = 64, num_bands: int = 16,
                  shingle_k: int = 5, seed: int = 42,
                  verify_threshold: float = 0.5, verify_k: int | None = None,
                  verify_broadcast_limit: int = 100_000):
    """VERIFIED near-duplicate pair list of the MinHash-LSH notion: band
    collisions nominate (bucket-min, member) candidate pairs, exact
    ``verify_k``-gram Jaccard confirms each, and one row (ia, ib) per
    confirmed pair comes back. This is the scale-path edge list for
    ``stages.components.connected_components`` (``minhash_component_dedup``
    composes them) — the jaccard twin (``ngram_jaccard_edges``) is the
    oracle-able variant.

    Candidate generation is the star of each band bucket (member ↔ bucket
    minimum), which preserves bucket CONNECTIVITY; two non-min members of a
    bucket are never tested directly, so an edge between them exists only
    through their shared verified minimum — the same recall contract as the
    verified ``minhash_dedup``."""
    bands = ds.map_batches(
        make_minhash_bands_fn(id_col=id_col, text_col=text_col,
                              num_perm=num_perm, num_bands=num_bands,
                              shingle_k=shingle_k, seed=seed),
        batch_format="pyarrow",
    )
    shards = 256

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = pc.bit_wise_and(batch.column("band_hash"), shards - 1)
        return batch.append_column("shard", pc.cast(shard, pa.int32()))

    return _verified_minhash_pairs(
        ds, bands.map_batches(add_shard, batch_format="pyarrow"),
        id_col=id_col, text_col=text_col,
        k=(verify_k if verify_k is not None else shingle_k),
        threshold=verify_threshold,
        verify_broadcast_limit=verify_broadcast_limit,
    )


def _verified_minhash_pairs(ds, sharded_bands, id_col: str, text_col: str,
                            k: int, threshold: float,
                            broadcast_limit: int = 2_000_000,
                            verify_broadcast_limit: int = 100_000):
    """Candidate pairs from band buckets → exact-Jaccard verification →
    VERIFIED PAIR Dataset (ia, ib). Two execution shapes:

    - candidate set ≤ ``verify_broadcast_limit``: broadcast-filter the corpus
      to candidate (id, text) rows, pull THOSE to the driver and verify in
      one vectorized pass — no extra shuffles (candidates ≪ corpus is the
      normal case; at sf0.1's 5k docs this is ~5k pairs / 5 MB of text).
    - larger: distinct pairs via one groupby, then two distributed
      ``hash_join``s against the column-pruned doc side fetch both texts,
      and a stateless map filters on exact Jaccard — the 100-TB path: the
      driver never holds texts, candidate payload moves ≤ twice.

    Returns a two-column (ia, ib) Dataset of verified pairs; consumers
    take ``ib`` for pairwise dropping or feed the whole edge list to
    ``connected_components`` for cluster-correct dedup."""
    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    def mark_pairs(group: pd.DataFrame) -> pd.DataFrame:
        mins = group.groupby(["band_id", "band_hash"])[id_col].transform("min")
        sel = group[id_col] != mins
        return pd.DataFrame({"ia": mins[sel].to_numpy(),
                             "ib": group.loc[sel, id_col].to_numpy()}
                            ).drop_duplicates()

    # materialized ONCE: the pair set is consumed 2-3 times below — leaving
    # it lazy would re-execute the whole band plan per consumer (blocks stay
    # in the object store; the driver sees only the count)
    pairs_raw = (
        sharded_bands.groupby("shard").map_groups(mark_pairs, batch_format="pandas")
    ).materialize()
    n_raw = pairs_raw.count()
    docs = ds.select_columns([id_col, text_col])
    if n_raw == 0:
        # no candidates → empty pair set with the right schema (a literal
        # empty block, NOT a corpus scan)
        import ray.data as rd

        id_type = ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(pa.table({"ia": pa.array([], id_type),
                                       "ib": pa.array([], id_type)}))

    def _broadcast(val):
        try:
            import ray

            return ray.put(val)
        except Exception:
            return val

    def _deref(val):
        import ray as _ray

        return _ray.get(val) if isinstance(val, _ray.ObjectRef) else val

    if n_raw <= verify_broadcast_limit:
        # small-candidate fast path: dedupe pairs on the driver (ids only —
        # 16 bytes/pair), broadcast the candidate id set, pull candidate
        # texts, verify locally. Saves the distinct-groupby and both joins.
        import ray.data as rd

        pdf = pairs_raw.to_pandas().drop_duplicates(["ia", "ib"])
        cand = pa.array(sorted(set(pdf["ia"]) | set(pdf["ib"])))
        cand_ref = _broadcast(cand)

        def keep_cands(batch: pa.Table) -> pa.Table:
            c = _deref(cand_ref)
            col = batch.column(id_col)
            return batch.filter(pc.is_in(col, value_set=c.cast(col.type)))

        texts_pdf = docs.map_batches(keep_cands, batch_format="pyarrow").to_pandas()
        # shingle each candidate ONCE (a doc appears in many pairs; per-pair
        # re-shingling tripled the verify wall at 22k pairs / 5k candidates)
        shingles_of = {
            i: char_shingles(t if t is not None else "", k)
            for i, t in zip(texts_pdf[id_col], texts_pdf[text_col])
        }
        empty = np.empty(0, dtype=np.uint64)
        scores = [jaccard(shingles_of.get(a, empty), shingles_of.get(b, empty))
                  for a, b in zip(pdf["ia"], pdf["ib"])]
        ok = pdf[np.asarray(scores) >= threshold]
        # infer the arrow id type from the (non-empty here) candidate text
        # pull — ds.schema().base_schema is a PandasBlockSchema for
        # from_pandas inputs and has no .field()
        id_type = pa.Array.from_pandas(texts_pdf[id_col]).type
        return rd.from_arrow(pa.table({
            "ia": pa.Array.from_pandas(ok["ia"], type=id_type),
            "ib": pa.Array.from_pandas(ok["ib"], type=id_type)}))

    def add_pair_shard(df: pd.DataFrame) -> pd.DataFrame:
        h = (pd.util.hash_pandas_object(df["ia"], index=False).to_numpy()
             ^ (pd.util.hash_pandas_object(df["ib"], index=False).to_numpy()
                * np.uint64(31)))
        return df.assign(pshard=(h & np.uint64(255)).astype(np.int32))

    def distinct_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["ia", "ib"])[["ia", "ib"]]

    pairs = (
        pairs_raw.map_batches(add_pair_shard, batch_format="pandas")
        .groupby("pshard")
        .map_groups(distinct_pairs, batch_format="pandas")
    ).materialize()
    n_pairs = pairs.count()

    if 2 * n_pairs <= broadcast_limit:
        # prefilter the doc side to candidate ids (broadcast once via
        # ray.put) so the joins ship candidate texts only, not the corpus
        pdf = pairs.to_pandas()
        cand = pa.array(sorted(set(pdf["ia"]) | set(pdf["ib"])))
        cand_ref = _broadcast(cand)

        def keep_cands(batch: pa.Table) -> pa.Table:
            c = _deref(cand_ref)
            col = batch.column(id_col)
            return batch.filter(pc.is_in(col, value_set=c.cast(col.type)))

        docs = docs.map_batches(keep_cands, batch_format="pyarrow")

    def as_side(col_name: str):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({col_name: batch.column(id_col),
                             f"_t_{col_name}": batch.column(text_col)})

        return f

    with_a = hash_join(pairs, docs.map_batches(as_side("ia"), batch_format="pyarrow"),
                       on="ia", how="inner")
    with_b = hash_join(with_a, docs.map_batches(as_side("ib"), batch_format="pyarrow"),
                       on="ib", how="inner")

    def verify(batch: pa.Table) -> pa.Table:
        scores = ngram_jaccard_pairs(batch.column("_t_ia").to_pylist(),
                                     batch.column("_t_ib").to_pylist(), k=k)
        mask = pa.array([s >= threshold for s in scores])
        return batch.filter(mask).select(["ia", "ib"])

    return with_b.map_batches(verify, batch_format="pyarrow")


def build_bloom(hash_ds, n_keys_hint: int | None = None,
                bits_per_key: int = 16, k: int = 7,
                target_words_per_shard: int = 1 << 20):
    """Distributed blocked-Bloom build over a one-column ``text_hash``
    Dataset. Each key's k probe bits live in ONE 512-bit block
    (functions/bloom.py), so the build is the standard partial-agg shape:
    per-batch word-mask pre-OR → groupby word-RANGE shard → per-shard OR
    into a blob segment → the driver assembles exactly bitmap-size bytes
    (one blob row per shard, never per-key traffic). At 16 bits/key the
    bitmap is 2 bytes per seen doc — 2 GB for 10^9 docs, broadcastable —
    where the exact hash set would be 8 GB plus set overhead."""
    import numpy as np

    from chinese_corpus_cleaning_ray.functions.bloom import (
        BLOCK_WORDS,
        BlockedBloom,
        batch_word_updates,
        n_blocks_for,
    )

    n = n_keys_hint if n_keys_hint is not None else hash_ds.count()
    n_blocks = n_blocks_for(max(1, n), bits_per_key)
    n_words = n_blocks * BLOCK_WORDS
    n_shards = max(1, -(-n_words // target_words_per_shard))
    wps = -(-n_words // n_shards)  # words per shard

    def updates(batch: pa.Table) -> pa.Table:
        # ONE ROW PER (batch, touched shard), updates packed as binary blobs
        # — the shuffle's row count is batches × shards, not keys × k (a
        # 35M-row update stream through a sort-based groupby measured ~50×
        # slower than the same payload packed into ~640 blob rows)
        h = batch.column("text_hash").to_numpy(zero_copy_only=False)
        empty = pa.table({"shard": pa.array([], pa.int32()),
                          "w_blob": pa.array([], pa.binary()),
                          "m_blob": pa.array([], pa.binary())})
        if len(h) == 0:
            return empty
        w, m = batch_word_updates(h.astype(np.int64), n_blocks, k)
        sh = (w // wps).astype(np.int32)
        order = np.argsort(sh, kind="stable")
        w, m, sh = w[order], m[order], sh[order]
        bounds = np.flatnonzero(np.diff(sh)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sh)]))
        return pa.table({
            "shard": pa.array(sh[starts], pa.int32()),
            "w_blob": pa.array([w[a:b].tobytes() for a, b in zip(starts, ends)],
                               pa.binary()),
            "m_blob": pa.array([m[a:b].tobytes() for a, b in zip(starts, ends)],
                               pa.binary()),
        })

    def segment(group):
        import pandas as pd  # noqa: F401

        if len(group) == 0:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "blob": pa.array([], pa.binary())})
        sh = int(group["shard"].iloc[0])
        seg = np.zeros(wps, dtype=np.uint64)
        w = np.concatenate([np.frombuffer(b, np.int64)
                            for b in group["w_blob"]])
        m = np.concatenate([np.frombuffer(b, np.uint64)
                            for b in group["m_blob"]])
        np.bitwise_or.at(seg, w - sh * wps, m)
        return pa.table({"shard": pa.array([sh], pa.int32()),
                         "blob": pa.array([seg.tobytes()], pa.binary())})

    segs = (hash_ds.map_batches(updates, batch_format="pyarrow")
            .groupby("shard").map_groups(segment, batch_format="pandas")
            .to_pandas())
    words = np.zeros(n_shards * wps, dtype=np.uint64)
    for _, row in segs.iterrows():
        sh = int(row["shard"])
        words[sh * wps:(sh + 1) * wps] = np.frombuffer(row["blob"], np.uint64)
    return BlockedBloom(n_blocks, k, words[:n_words])


def dedup_against_corpus(ds, seen_ds, id_col: str, text_col: str = "text",
                         seen_text_col: str = "text", strategy: str = "auto",
                         broadcast_limit: int = 2_000_000,
                         bloom_bits_per_key: int = 16):
    """Incremental ingestion: drop rows of ``ds`` whose text already exists
    in ``seen_ds`` (the committed corpus), THEN exact-dedup the survivors
    among themselves (keep-first by id). The daily-batch shape: yesterday's
    corpus is the seen side; today's crawl is ``ds``.

    Both sides reduce to 64-bit content hashes (``add_text_hash``), so the
    seen side ships as hashes — 8 bytes/doc, not documents — through the
    shared ``anti_filter`` ending (auto broadcast-vs-distributed-join). The
    seen side should be a column-pruned read of just the text (or a stored
    hash column) — never the full corpus rows. Returns
    ``(new_unique_ds, dup_ids)``; run ``add_text_hash`` over the output to
    extend a stored hash index for the next batch.

    ``strategy="bloom"`` keeps the output BIT-IDENTICAL but prefilters with
    a blocked Bloom over the seen hashes (:func:`build_bloom`): "not in
    Bloom" rows are definitively new and skip the anti-join entirely; only
    the (FP-rate + true-dup)-sized candidate slice pays the exact
    verification. At 16 bits/key the broadcast is 2 bytes per seen doc vs
    8+ for the exact hash set — the daily-ingest scale path when the
    committed corpus has grown past the hash-set broadcast limit."""
    # shard-size the downstream exact_dedup from the INPUT row count (a
    # metadata-only count when ds is a parquet read, and always an upper
    # bound on the anti-filter's output) — letting exact_dedup count its
    # derived input would execute the whole seen-vs-new anti-filter plan
    # once for the count and again for the real run (~2× the job's cost)
    n_hint = ds.count()
    hashed = add_text_hash(ds, text_col)
    seen_hashes = add_text_hash(seen_ds, seen_text_col).select_columns(["text_hash"])
    if strategy == "bloom":
        import numpy as np
        import ray

        seen_hashes = seen_hashes.materialize()  # consumed twice below
        # the fresh side is also consumed twice (candidate + certain-new
        # filters) — materialize so the scan+hash runs once, not per filter;
        # bounded by the daily batch, and blocks spill rather than re-read
        hashed = hashed.materialize()
        bloom = build_bloom(seen_hashes, bits_per_key=bloom_bits_per_key)
        bloom_ref = ray.put(bloom)

        def split(flag: bool):
            def fn(batch: pa.Table) -> pa.Table:
                bf = ray.get(bloom_ref)
                h = batch.column("text_hash").to_numpy(zero_copy_only=False)
                hit = bf.contains(h.astype(np.int64))
                return batch.filter(pa.array(hit if flag else ~hit))

            return fn

        candidates = hashed.map_batches(split(True), batch_format="pyarrow")
        certain_new = hashed.map_batches(split(False), batch_format="pyarrow")
        fresh_cand, dups = anti_filter(candidates, seen_hashes, "text_hash",
                                       strategy="auto",
                                       broadcast_limit=broadcast_limit)
        fresh = certain_new.union(fresh_cand)
    else:
        fresh, dups = anti_filter(hashed, seen_hashes, "text_hash",
                                  strategy=strategy,
                                  broadcast_limit=broadcast_limit)

    def drop_hash(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["text_hash"])

    fresh = fresh.map_batches(drop_hash, batch_format="pyarrow")
    return exact_dedup(fresh, id_col=id_col, text_col=text_col,
                       num_rows_hint=n_hint), dups


def simhash_mark(ds, text_col: str = "text", k: int = 3):
    def fn(batch: pa.Table) -> pa.Table:
        sims = [simhash64(t, k) for t in batch.column(text_col).to_pylist()]
        return batch.append_column("simhash", pa.array(sims, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def ngram_jaccard_pairs(texts_a: list[str], texts_b: list[str], k: int = 5) -> list[float]:
    """Exact shingle-Jaccard for candidate verification (row-local kernel)."""
    return [jaccard(char_shingles(a, k), char_shingles(b, k)) for a, b in zip(texts_a, texts_b)]


def _jaccard_pair_partials(ds, id_col: str, text_col: str, k: int,
                           shards: int, max_df: int | None):
    """Shared pair-candidate plan for the exact-Jaccard family: shingle
    posting rows → shingle-shard self-merge → per-pair partial
    intersections, sharded by the (ia, ib) pair. Consumers finish with one
    ``groupby("pshard")`` reduce (dup ids for ``ngram_jaccard_dedup``,
    qualifying edges for ``ngram_jaccard_edges``)."""

    def shingle_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        out_id, out_sh, out_n = [], [], []
        for i, t in zip(ids, texts):
            grams = {t[j : j + k] for j in range(len(t) - k + 1)}
            out_id.extend([i] * len(grams))
            out_sh.extend(grams)
            out_n.extend([len(grams)] * len(grams))
        return pa.table(
            {
                "doc": pa.array(out_id, batch.schema.field(id_col).type),
                "g": pa.array(out_sh, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def add_g_shard(batch: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F401

        h = pc.cast(pa.array(
            pd.util.hash_array(np.asarray(batch.column("g").to_pylist(), dtype=object))
            .astype(np.int64) & (shards - 1)), pa.int32())
        return batch.append_column("shard", h)

    def pair_partials(group: pd.DataFrame) -> pd.DataFrame:
        # factorize gram strings to dense int codes FIRST: the df-cap
        # transform and the self-merge then run on int64 keys instead of
        # hashing utf-8 strings twice each — exact (factorize is injective
        # within the shard), just faster
        group = group.assign(g=pd.factorize(group["g"])[0])
        if max_df is not None:
            df_g = group.groupby("g")["doc"].transform("size")
            group = group[df_g <= max_df]
        m = group.merge(group, on="g", suffixes=("_a", "_b"))
        m = m[m["doc_a"] < m["doc_b"]]
        agg = (
            m.groupby(["doc_a", "doc_b", "n_a", "n_b"], sort=False)
            .size().reset_index(name="inter")
        )
        return agg.rename(columns={"doc_a": "ia", "doc_b": "ib",
                                   "n_a": "na", "n_b": "nb"})

    def add_pair_shard(df: pd.DataFrame) -> pd.DataFrame:
        # id-dtype agnostic (works for int doc_ids and string row keys)
        h = (pd.util.hash_pandas_object(df["ia"], index=False).to_numpy()
             ^ (pd.util.hash_pandas_object(df["ib"], index=False).to_numpy()
                * np.uint64(31)))
        return df.assign(pshard=(h & np.uint64(shards - 1)).astype(np.int32))

    return (
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .map_batches(add_g_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pair_partials, batch_format="pandas")
        .map_batches(add_pair_shard, batch_format="pandas")
    )


def ngram_jaccard_dedup(ds, id_col: str, text_col: str = "text", k: int = 5,
                        threshold: float = 0.8, shards: int | None = None,
                        max_df: int | None = 128, strategy: str = "auto",
                        broadcast_limit: int = 2_000_000,
                        target_docs_per_shard: int = 4096):
    """EXACT n-gram Jaccard dedup: a row is a duplicate iff ANY smaller-id row
    shares Jaccard ≥ threshold over distinct character k-grams. Unlike
    MinHash/SimHash this is oracle-checkable (the same semantics are plain
    SQL: shingle table → self-join → inter/union ratio).

    ``max_df`` (document-frequency cap) drops shingles shared by more than
    that many documents from the INTERSECTION (denominator counts stay full):
    ubiquitous shingles generate O(df²) candidate pairs — template-heavy
    corpora go quadratic without the cap — while true near-dup pairs share
    plenty of rare shingles, so the score only shrinks, never inflates
    (conservative). The cap is mirrored verbatim in the SQL oracle, so
    parity is by construction, not luck. ``max_df=None`` disables it.

    Plan (no O(n²) anywhere):
    1. map_batches: one row per DISTINCT (shingle, doc) with the doc's
       shingle count attached (so pair rows are self-contained — no
       corpus-wide doc→count broadcast at scale).
    2. groupby coarse shard of the shingle string; a shingle's full posting
       list lives in ONE shard, so the df cap is an exact local filter;
       a vectorized pandas self-merge emits partial pair-intersections.
    3. groupby coarse shard of the (ia, ib) pair; sum partial intersections,
       keep pairs with inter/(na+nb-inter) ≥ threshold, anti-filter the
       distinct larger ids via the shared ``anti_filter`` ending (auto
       broadcast-vs-join, so the driver never holds an unbounded dup set).

    ``shards=None`` (default) sizes the power-of-two shard count from the
    input row count (~``target_docs_per_shard`` docs per shard), so per-shard
    memory stays flat as the corpus grows."""
    if shards is None:
        shards = _pow2_shards(ds.count(), target_docs_per_shard)

    def dup_ids_of(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(["ia", "ib", "na", "nb"], sort=False)["inter"].sum().reset_index()
        jac = agg["inter"] / (agg["na"] + agg["nb"] - agg["inter"])
        hits = agg.loc[jac >= threshold, "ib"]
        return pd.DataFrame({id_col: pd.unique(hits.to_numpy())})

    dup_ids_ds = (
        _jaccard_pair_partials(ds, id_col, text_col, k, shards, max_df)
        .groupby("pshard")
        .map_groups(dup_ids_of, batch_format="pandas")
    )
    return anti_filter(ds, dup_ids_ds, id_col, strategy=strategy,
                       broadcast_limit=broadcast_limit)


def ngram_containment_dedup(ds, id_col: str, text_col: str = "text",
                            k: int = 5, threshold: float = 0.9,
                            shards: int | None = None,
                            max_df: int | None = 128,
                            strategy: str = "auto",
                            broadcast_limit: int = 2_000_000,
                            target_docs_per_shard: int = 4096):
    """EXACT n-gram CONTAINMENT dedup — the asymmetric complement of
    :func:`ngram_jaccard_dedup`: a pair qualifies when one doc's distinct
    k-gram set is ≥ ``threshold`` covered by the other's
    (``inter/|contained|``), and the CONTAINED doc drops. Catches
    "document B is document A plus a header/footer" — which symmetric
    Jaccard misses (a short doc embedded in a long one has tiny
    ``inter/union`` but containment ≈ 1) — the standard quote/aggregator
    case in web corpora.

    Keeper semantics: the contained side drops regardless of id order;
    mutual containment (near-identical sets) keeps the SMALLER id, the
    family convention. Pairwise like jaccard (not transitive — compose with
    ``connected_components`` for cluster-correct closure). Shares the whole
    ``_jaccard_pair_partials`` plan (shingle-shard self-merge, df cap with
    the same conservative only-shrinks property, pair-shard reduce) and the
    ``anti_filter`` ending; SQL-expressible, so the driver oracle is
    bit-exact."""
    if shards is None:
        shards = _pow2_shards(ds.count(), target_docs_per_shard)

    def dup_ids_of(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(["ia", "ib", "na", "nb"],
                            sort=False)["inter"].sum().reset_index()
        ca = agg["inter"] / agg["na"]   # how covered the SMALLER-id doc is
        cb = agg["inter"] / agg["nb"]
        drop_b = cb >= threshold                      # b contained (or mutual)
        drop_a = (ca >= threshold) & ~drop_b          # only a contained
        ids = pd.concat([agg.loc[drop_b, "ib"], agg.loc[drop_a, "ia"]])
        return pd.DataFrame({id_col: pd.unique(ids.to_numpy())})

    dup_ids_ds = (
        _jaccard_pair_partials(ds, id_col, text_col, k, shards, max_df)
        .groupby("pshard")
        .map_groups(dup_ids_of, batch_format="pandas")
    )
    return anti_filter(ds, dup_ids_ds, id_col, strategy=strategy,
                       broadcast_limit=broadcast_limit)


def ngram_jaccard_edges(ds, id_col: str, text_col: str = "text", k: int = 5,
                        threshold: float = 0.8, shards: int | None = None,
                        max_df: int | None = 128,
                        target_docs_per_shard: int = 4096):
    """The qualifying NEAR-DUPLICATE PAIR LIST of the exact-Jaccard notion:
    one row (ia, ib) with ia < ib per unordered pair whose shingle-Jaccard
    (under the same ``max_df`` intersection cap as ``ngram_jaccard_dedup``)
    is ≥ ``threshold``. This is the edge list of the duplicate graph — feed
    it to ``stages.components.connected_components`` for one-keeper-per-
    cluster dedup, or inspect it directly for dup-pair audits."""
    if shards is None:
        shards = _pow2_shards(ds.count(), target_docs_per_shard)

    def edges_of(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(["ia", "ib", "na", "nb"], sort=False)["inter"].sum().reset_index()
        jac = agg["inter"] / (agg["na"] + agg["nb"] - agg["inter"])
        return agg.loc[jac >= threshold, ["ia", "ib"]].reset_index(drop=True)

    return (
        _jaccard_pair_partials(ds, id_col, text_col, k, shards, max_df)
        .groupby("pshard")
        .map_groups(edges_of, batch_format="pandas")
    )


def simhash_dedup(ds, id_col: str, text_col: str = "text", k: int = 3,
                  max_hamming: int = 3, shards: int = 256,
                  strategy: str = "auto", broadcast_limit: int = 2_000_000):
    """Near-dup removal via 64-bit SimHash with 4×16-bit band blocking.

    Two texts within Hamming distance ≤ 3 of each other share at least one of
    the four 16-bit bands (pigeonhole), so banding finds all such candidate
    pairs; candidates are verified by exact Hamming distance and every
    non-minimal member of a verified pair is dropped (keep-first by id).
    Same coarse-shard grouping discipline as minhash_dedup.

    Low-entropy guard: boilerplate corpora collapse many texts onto few
    simhash values, making band buckets huge. Each bucket therefore first
    collapses IDENTICAL simhash values (vectorized first-occurrence; distance
    0 ≤ max_hamming, so every non-first row of a value is a duplicate by
    definition), then runs the O(d²) pairwise Hamming scan over the DISTINCT
    values only — 100k copies of one template cost one dedup pass, not 10^10
    popcounts. Equivalent to the row-level rule "dup iff ANY earlier row is
    within max_hamming" because rows are id-sorted, so a value's first
    occurrence is its min id.
    """
    from chinese_corpus_cleaning_ray.functions.dedup import simhash64

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sims = pa.array(np.asarray([simhash64(t, k) for t in texts],
                                   dtype=np.int64))
        return pa.table({id_col: batch.column(id_col), "h64": sims})

    dup_ids_ds = hamming_dup_ids(
        ds.map_batches(add_hash, batch_format="pyarrow"), id_col, "h64",
        max_hamming=max_hamming, shards=shards)
    return anti_filter(ds, dup_ids_ds, id_col, strategy=strategy,
                       broadcast_limit=broadcast_limit)


def hamming_dup_ids(ds, id_col: str, hash_col: str, max_hamming: int = 3,
                    shards: int = 256):
    """Generic 64-bit-hash Hamming dedup plan (the banding half of
    ``simhash_dedup``, factored so any 64-bit perceptual hash — text
    simhash, image aHash — reuses it): 4x16-bit band blocking finds every
    pair within Hamming <= 3 (pigeonhole), buckets verify by exact popcount
    over DISTINCT values (low-entropy guard), and the returned Dataset holds
    the duplicate ids (every non-minimal member of a verified pair)."""

    def add_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        h = batch.column(hash_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        u = h.view(np.uint64)
        n = len(h)
        rep = np.repeat(np.arange(n, dtype=np.int64), 4)
        bidx = np.tile(np.arange(4, dtype=np.int32), n)
        bands = ((u[rep] >> (16 * bidx).astype(np.uint64))
                 & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                id_col: ids.take(pa.array(rep)),
                "simhash": pa.array(h[rep]),
                "band_id": pa.array(bidx),
                "band_val": pa.array(bands),
                "shard": pa.array(
                    ((bands * 4 + bidx) % shards).astype(np.int32)
                ),
            }
        )

    def mark(group: pd.DataFrame) -> pd.DataFrame:
        """Within each (band_id, band_val) bucket (id-sorted), a row is a
        duplicate iff ANY earlier row is within max_hamming. Identical
        hash values are collapsed first (see docstring); the chunked
        numpy-broadcast XOR + SWAR-popcount scan then runs over distinct
        values only, its pairwise matrix capped at ~4M cells."""
        from chinese_corpus_cleaning_ray.functions.dedup import popcount64

        g = group.sort_values(["band_id", "band_val", id_col], kind="mergesort")
        sims_u = np.ascontiguousarray(g["simhash"].to_numpy(np.int64)).view(np.uint64)
        n = len(g)
        bid = g["band_id"].to_numpy()
        bval = g["band_val"].to_numpy()
        new_b = np.empty(n, dtype=bool)
        new_b[0] = True
        new_b[1:] = (bid[1:] != bid[:-1]) | (bval[1:] != bval[:-1])
        starts = np.flatnonzero(new_b)
        ends = np.append(starts[1:], n)
        dup_mask = np.zeros(n, dtype=bool)
        for s, e in zip(starts, ends):
            b = e - s
            if b <= 1:
                continue
            # collapse identical values: first occurrence (min id, rows are
            # id-sorted) survives, the rest are dups at distance 0
            vals, first_idx, inv = np.unique(
                sims_u[s:e], return_index=True, return_inverse=True
            )
            dup_mask[s:e] |= np.arange(b) != first_idx[inv]
            d_n = len(vals)
            if d_n <= 1:
                continue
            # pairwise Hamming over DISTINCT values in min-id order: distinct
            # value j is "covered" iff any earlier-min-id distinct value is
            # within max_hamming; then every row carrying a covered value
            # (including its first occurrence) is a duplicate
            order = np.argsort(first_idx, kind="stable")
            v = vals[order]
            covered_ord = np.zeros(d_n, dtype=bool)
            chunk = max(1, 4_000_000 // d_n)
            for c0 in range(1, d_n, chunk):
                c1 = min(c0 + chunk, d_n)
                d = popcount64(v[c0:c1, None] ^ v[None, :c1])  # (rows, c1)
                tri = np.arange(c1)[None, :] < np.arange(c0, c1)[:, None]
                covered_ord[c0:c1] |= ((d <= max_hamming) & tri).any(axis=1)
            covered = np.empty(d_n, dtype=bool)
            covered[order] = covered_ord
            dup_mask[s:e] |= covered[inv]
        if not dup_mask.any():
            return pd.DataFrame({id_col: pd.Series([], dtype=g[id_col].dtype)})
        return pd.DataFrame({id_col: pd.unique(g[id_col].to_numpy()[dup_mask])})

    return (
        ds.map_batches(add_bands, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(mark, batch_format="pandas")
    )


def paragraph_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                    sep: str = "\n", min_len: int = 1,
                    shards: int | None = None,
                    target_paras_per_shard: int = 1 << 16,
                    num_rows_hint: int | None = None):
    """Corpus-wide paragraph (line) dedup, CCNet/C4 style: split each
    document on ``sep``, keep only the FIRST occurrence of every distinct
    paragraph across the whole corpus, and reassemble documents from their
    surviving paragraphs. This is the boilerplate-removal pass large
    training-data pipelines run before document-level dedup (repeated
    headers/footers/navigation lines vanish everywhere but their first
    sighting).

    Exact semantics (bit-restatable in SQL — see ``doc_paragraph_dedup`` in
    ``__ray_entry__.py``):

    - paragraphs shorter than ``min_len`` characters ALWAYS survive
      (``min_len=1`` preserves empty lines, i.e. paragraph structure);
    - among the corpus-wide occurrences of a distinct paragraph string, the
      one with the smallest ``(id, para_idx)`` survives; the rest drop;
    - a document reassembles as its surviving paragraphs joined by ``sep``
      in original order; a document with ZERO surviving paragraphs drops
      out of the result entirely.

    Scale shape: two coarse-shard groupbys. The dedup shuffle keys on a
    power-of-two shard of the paragraph content hash (all copies of a
    paragraph share a shard at any shard count ⇒ output is
    shard-count-invariant); sub-``min_len`` paragraphs shard by DOCUMENT
    hash instead so the corpus's billions of identical blank lines never
    converge on one worker. The reassembly shuffle keys on a shard of the
    document id. Paragraph text moves through both shuffles — the payload
    is the corpus itself, same as ``exact_dedup``; there is no driver-side
    collection anywhere. ``num_rows_hint`` sidesteps the sizing
    ``ds.count()`` for derived inputs (same contract as ``exact_dedup``).

    Returns a Dataset with columns ``(id_col, text_col)``.
    """
    if shards is None:
        n = num_rows_hint if num_rows_hint is not None else ds.count()
        # paragraphs-per-doc is unknown here; aim the knob at the doc count
        # with a smaller per-shard target — purely a memory bound.
        shards = _pow2_shards(n, max(1, target_paras_per_shard // 8), lo=64)
    doc_shards = shards
    id_type = None

    def _shard_of(values: np.ndarray, mask: int) -> np.ndarray:
        # shard hashes only need DETERMINISM (all copies of a key on one
        # shard); pd.util.hash_array is a vectorized fixed-key siphash —
        # same trick as the jaccard gram sharding below.
        return (pd.util.hash_array(values).astype(np.int64) & mask).astype(np.int32)

    def explode(batch: pa.Table) -> pa.Table:
        # fully Arrow-vectorized explode: split -> flatten, with parent/
        # position indices derived from the list offsets (no Python loop
        # over paragraphs — this stage touches the entire corpus).
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            # flatten to ONE chunk first: list_parent_indices is chunk-local,
            # so multi-chunk input would reset parent ids mid-batch
            txt = txt.combine_chunks()
        txt = pc.fill_null(pc.cast(txt, pa.string()), "")
        parts = pc.split_pattern(txt, sep)
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
        para_idx = (np.arange(len(flat), dtype=np.int64) - starts).astype(np.int32)
        ids = batch.column(id_col).take(pa.array(parent))
        ded = pc.greater_equal(pc.utf8_length(flat), min_len).to_numpy(
            zero_copy_only=False)
        paras_np = np.asarray(flat.to_pylist(), dtype=object)
        id_np = ids.to_numpy(zero_copy_only=False)

        # batch-local pre-collapse (the boilerplate-skew valve): among the
        # dedupable instances of one distinct paragraph in THIS batch, only
        # the min-(id, para_idx) one can possibly be the global keeper — the
        # rest are provably dropped, so drop them BEFORE the shuffle. A
        # header/footer occurring in every document ships once per batch
        # instead of once per document, and the content-hash hot shard that
        # would otherwise collect every copy corpus-wide stays per-batch
        # bounded. Bit-exact: global min = min over batch minima.
        keep = np.ones(len(flat), dtype=bool)
        if ded.any():
            dpos = np.flatnonzero(ded)
            sub = pd.DataFrame({
                "c": pd.factorize(paras_np[dpos])[0],
                "i": id_np[dpos], "x": para_idx[dpos], "pos": dpos,
            }).sort_values(["i", "x"], kind="mergesort")
            keep[sub.loc[sub["c"].duplicated(), "pos"].to_numpy()] = False
            ded = ded[keep]
            paras_np = paras_np[keep]
            id_np = id_np[keep]
            para_idx = para_idx[keep]

        shard = np.empty(len(id_np), dtype=np.int32)
        # dedupable paragraphs shard by CONTENT hash; short ones bypass dedup
        # and shard by DOC hash so corpus-wide blank lines spread out
        shard[ded] = _shard_of(paras_np[ded], shards - 1)
        shard[~ded] = _shard_of(id_np[~ded], doc_shards - 1)
        mask = pa.array(keep)
        return pa.table({
            id_col: ids.filter(mask) if keep.size and not keep.all() else ids,
            "para_idx": pa.array(para_idx),
            "para": flat.filter(mask) if keep.size and not keep.all() else flat,
            "shard": pa.array(shard),
            "_ded": pa.array(ded),
        })

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        ded = g[g["_ded"]]
        if len(ded):
            ded = ded.sort_values([id_col, "para_idx"], kind="mergesort")
            ded = ded.drop_duplicates(subset=["para"], keep="first")
        out = pd.concat([ded, g[~g["_ded"]]]) if (~g["_ded"]).any() else ded
        out = out.drop(columns=["_ded"])
        # re-key the shuffle for reassembly: shard of the DOC id
        out["shard"] = _shard_of(out[id_col].to_numpy(), doc_shards - 1)
        return out

    def rejoin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "para_idx"], kind="mergesort")
        agg = g.groupby(id_col, sort=True)["para"].agg(sep.join)
        return pd.DataFrame({id_col: agg.index.to_numpy(),
                             text_col: agg.to_numpy()})

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(keep_first, batch_format="pandas")
        .groupby("shard")
        .map_groups(rejoin, batch_format="pandas")
    )


def paragraph_dedup_keeper(ds, id_col: str = "doc_id", text_col: str = "text",
                           sep: str = "\n", min_len: int = 1,
                           shards: int = 256,
                           keeper_limit: int = 2_000_000):
    """Zero-text-shuffle variant of ``paragraph_dedup`` for the common case
    where duplicated paragraphs are BOILERPLATE (few distinct strings, many
    occurrences). Semantics are identical to ``paragraph_dedup`` except the
    paragraph identity is a 128-bit content hash instead of the string
    itself (two independently-keyed fixed-key siphashes — a collision needs
    ~2^64 distinct paragraphs; content-addressable-dedup standard).

    Plan (two passes over ``ds``; pass the raw read twice or materialize a
    derived input, same contract as the mark+filter dedups):

    - Pass A (statistics, batch-pre-collapsed): per batch, per distinct
      dedupable paragraph, emit ONE row (h1, h2, min_id, min_idx, count) —
      a corpus-wide boilerplate line contributes one row per batch, never
      one per occurrence. A coarse hash-shard groupby reduces to the
      KEEPER TABLE: (h1, h2, keeper id, keeper idx) for paragraphs with
      total count > 1 only. Its size is the number of DISTINCT duplicated
      paragraph strings — for boilerplate removal that is tiny regardless
      of corpus size.
    - Pass B (rewrite, fully local): broadcast the keeper table via
      ``ray.put``; each batch splits its docs, drops a paragraph iff it is
      in the table and this instance is not the keeper occurrence, rejoins,
      and emits (id, text) — documents never leave their batch, so the
      text payload crosses the cluster ZERO times. An ``np.isin`` h1
      pre-filter keeps the per-instance dict lookups to table-member
      paragraphs only.

    Raises ``ValueError`` if the keeper table exceeds ``keeper_limit`` —
    at that point the duplicate population is not boilerplate-shaped and
    the shuffle-based ``paragraph_dedup`` (whose anti-skew valves bound
    that regime) is the right tool. The keeper occurrence is the
    lexicographically-min ``(id, para_idx)`` — the same notion as
    ``paragraph_dedup`` and its SQL restatement.
    """
    import ray

    _K1 = b"ccc-para-hash-01"
    _K2 = b"ccc-para-hash-02"

    def _explode_np(batch: pa.Table):
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(pc.cast(txt, pa.string()), "")
        parts = pc.split_pattern(txt, sep)
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
        para_idx = (np.arange(len(flat), dtype=np.int64) - starts)
        ids = batch.column(id_col).take(pa.array(parent))
        # zero-copy-adjacent object view of the utf8 values — measurably
        # faster than to_pylist on wide batches
        paras = flat.to_numpy(zero_copy_only=False)
        ded = pc.greater_equal(pc.utf8_length(flat), min_len).to_numpy(
            zero_copy_only=False)
        return ids, para_idx, paras, lengths, ded, txt

    def _hash128(paras: np.ndarray):
        h1 = pd.util.hash_array(paras, hash_key=_K1.decode()).astype(np.int64)
        h2 = pd.util.hash_array(paras, hash_key=_K2.decode()).astype(np.int64)
        return h1, h2

    def _empty_stats(id_type: pa.DataType) -> pa.Table:
        # id column type must track the corpus (int64 vs string) or an
        # all-short batch's empty block would conflict with the others
        return pa.table({"h1": pa.array([], pa.int64()),
                         "h2": pa.array([], pa.int64()),
                         "i": pa.array([], id_type),
                         "x": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64()),
                         "shard": pa.array([], pa.int32())})

    def stats(batch: pa.Table) -> pa.Table:
        ids, para_idx, paras, _, ded, _txt = _explode_np(batch)
        if not ded.any():
            return _empty_stats(batch.schema.field(id_col).type)
        h1, h2 = _hash128(paras[ded])
        df = pd.DataFrame({"h1": h1, "h2": h2,
                           "i": ids.to_numpy(zero_copy_only=False)[ded],
                           "x": para_idx[ded]})
        df = df.sort_values(["i", "x"], kind="mergesort")
        agg = (df.groupby(["h1", "h2"], sort=False)
               .agg(i=("i", "first"), x=("x", "first"), cnt=("x", "size"))
               .reset_index())
        agg["shard"] = (agg["h1"].to_numpy().astype(np.int64)
                        & (shards - 1)).astype(np.int32)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def reduce_keepers(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["h1", "h2"], sort=False)["cnt"].transform("sum")
        g = g[tot > 1]
        if not len(g):
            return pd.DataFrame({"h1": pd.Series([], dtype=np.int64),
                                 "h2": pd.Series([], dtype=np.int64),
                                 "i": pd.Series([], dtype=object),
                                 "x": pd.Series([], dtype=np.int64)})
        g = (g.sort_values(["i", "x"], kind="mergesort")
             .drop_duplicates(["h1", "h2"], keep="first"))
        return g[["h1", "h2", "i", "x"]]

    keepers = (
        ds.map_batches(stats, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(reduce_keepers, batch_format="pandas")
        .materialize()
    )
    n_keepers = keepers.count()
    if n_keepers > keeper_limit:
        raise ValueError(
            f"keeper table has {n_keepers} distinct duplicated paragraphs "
            f"(> {keeper_limit}); this corpus is not boilerplate-shaped — "
            "use paragraph_dedup (shuffle strategy) instead")
    kmap: dict = {}
    for b in keepers.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "h1" not in b.column_names:
            continue
        for a, c, ki, kx in zip(b.column("h1").to_pylist(),
                                b.column("h2").to_pylist(),
                                b.column("i").to_pylist(),
                                b.column("x").to_pylist()):
            kmap[(a, c)] = (ki, kx)
    keeper_h1 = np.unique(np.fromiter((k[0] for k in kmap), dtype=np.int64,
                                      count=len(kmap))) if kmap else None
    kref = ray.put((kmap, keeper_h1))

    def rewrite(batch: pa.Table) -> pa.Table:
        import ray as _ray

        payload = kref
        if isinstance(payload, _ray.ObjectRef):
            payload = _ray.get(payload)
        km, kh1 = payload
        ids, para_idx, paras, lengths, ded, txt = _explode_np(batch)
        keep = np.ones(len(paras), dtype=bool)
        if km and ded.any():
            dpos = np.flatnonzero(ded)
            h1, h2 = _hash128(paras[dpos])
            cand = np.isin(h1, kh1)
            if cand.any():
                id_np = ids.to_numpy(zero_copy_only=False)
                for j in np.flatnonzero(cand):
                    k = km.get((h1[j], h2[j]))
                    if k is not None:
                        p = dpos[j]
                        if (id_np[p], para_idx[p]) != k:
                            keep[p] = False
        if keep.all():  # batch holds no dropped instance — pass through
            return pa.table({id_col: batch.column(id_col), text_col: txt})
        # per-row drop/keep counts, vectorized; rows with zero drops reuse
        # their (normalized) original text string — no re-join cost
        starts = np.cumsum(lengths) - lengths
        nz = lengths > 0
        kept_cnt = np.zeros(len(lengths), dtype=np.int64)
        drop_cnt = np.zeros(len(lengths), dtype=np.int64)
        kept_cnt[nz] = np.add.reduceat(keep.astype(np.int64), starts[nz])
        drop_cnt[nz] = lengths[nz] - kept_cnt[nz]
        orig_texts = txt.to_numpy(zero_copy_only=False)
        orig_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_ids, out_texts = [], []
        for row in np.flatnonzero(kept_cnt > 0):
            out_ids.append(orig_ids[row])
            if drop_cnt[row] == 0:
                out_texts.append(orig_texts[row])
            else:
                pos, ln = starts[row], lengths[row]
                sl = keep[pos:pos + ln]
                out_texts.append(sep.join(
                    p for p, kk in zip(paras[pos:pos + ln], sl) if kk))
        return pa.table({
            id_col: pa.array(out_ids, batch.schema.field(id_col).type),
            text_col: pa.array(out_texts, pa.string()),
        })

    return ds.map_batches(rewrite, batch_format="pyarrow")
