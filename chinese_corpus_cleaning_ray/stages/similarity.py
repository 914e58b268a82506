"""Similarity search over an embedding column (list<float>).

The reference computes a full O(n²) cosine matrix on the driver
(ref:text_quality_filter/utils/embed.py:58-82) and linear scans per probe
(ref:utils/clustering.py:169-185). Here:

- ``knn_brute``  — exact top-k: the query matrix is broadcast once
  (``ray.put``), each batch computes a vectorized (batch × queries) cosine
  and emits only its local top-k per query; a tiny groupby reduces the
  per-batch candidates to the global top-k. No full materialization, no n².
- ``knn_ivf``    — scale path: LSH (random-hyperplane sign) bucket per row;
  only rows whose bucket matches a query's bucket (or its Hamming-1
  neighborhood) are scored. Approximate; recall grows with ``nbits`` ↓ or
  ``expand`` ↑.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    """Zero-copy-ish (B, d) float64 matrix from a fixed-length list column."""
    arr = batch.column(vec_col)
    if arr.num_chunks > 0:
        chunks = [c for c in arr.chunks]
    else:
        chunks = [arr.combine_chunks()]
    mats = []
    for c in chunks:
        flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mats.append(flat.reshape(len(c), -1))
    return np.vstack(mats)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteKnnStage:
    """Per-batch exact cosine top-k against a broadcast query matrix."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        try:
            import ray

            if isinstance(queries_ref, ray.ObjectRef):
                queries_ref = ray.get(queries_ref)
        except ImportError:
            pass
        self.q = _normalize(np.asarray(queries_ref, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(self.id_col).type
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    self.id_col: pa.array([], id_type),
                    "cos": pa.array([], pa.float64()),
                }
            )
        m = _normalize(_batch_matrix(batch, self.vec_col))
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        # pre-sort rows by id so the stable argsort below breaks exact-cos
        # ties toward the smaller id — matches the oracle's (cos DESC, id ASC)
        id_order = np.argsort(ids, kind="stable")
        ids = ids[id_order]
        sims = m[id_order] @ self.q.T  # (B, Q)
        k = min(self.k, sims.shape[0])
        top = np.argsort(-sims, axis=0, kind="stable")[:k]  # (k, Q)
        nq = sims.shape[1]
        out_q = np.repeat(np.arange(nq, dtype=np.int32), k)
        flat = top.T.ravel()  # query-major
        return pa.table(
            {
                "query_id": pa.array(out_q),
                self.id_col: pa.array(ids[flat], id_type),
                "cos": pa.array(sims[flat, np.repeat(np.arange(nq), k)], pa.float64()),
            }
        )


_KNN_STAGE_CACHE: dict = {}


def _cache_put(cache: dict, key, value, cap: int = 4):
    """Insert into a per-worker-process cache, evicting oldest entries beyond
    ``cap`` — long-lived Ray workers serve many queries; an unbounded cache
    would leak one normalized query matrix (or plane matrix) per call."""
    cache[key] = value
    while len(cache) > cap:
        cache.pop(next(iter(cache)))
    return value


def knn_brute(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
              vec_col: str = "embedding", concurrency=8):
    """Exact cosine top-k for each query row of ``queries`` (Q, d).
    Result: (query_id, id_col, cos) — k rows per query, best first.

    The query matrix is broadcast once via ``ray.put``; the per-batch scorer
    is a TASK stage with a per-worker cache keyed by the broadcast handle
    (state = one normalized matrix — building it per worker is microseconds,
    an actor pool's spin-up is seconds)."""
    try:
        import ray

        q_ref = ray.put(np.asarray(queries, dtype=np.float64))
        cache_key = (q_ref.hex(), k, id_col, vec_col)
    except Exception:
        q_ref = np.asarray(queries, dtype=np.float64)
        cache_key = (id(q_ref), k, id_col, vec_col)

    def score_batch(batch: pa.Table) -> pa.Table:
        stage = _KNN_STAGE_CACHE.get(cache_key)
        if stage is None:
            stage = _cache_put(
                _KNN_STAGE_CACHE, cache_key,
                BruteKnnStage(q_ref, k=k, id_col=id_col, vec_col=vec_col),
            )
        return stage(batch)

    candidates = ds.map_batches(score_batch, batch_format="pyarrow")

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cos", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    return candidates.groupby("query_id").map_groups(topk, batch_format="pandas")


_PLANES_CACHE: dict = {}


def lsh_planes(d: int, nbits: int = 6, seed: int = 42) -> np.ndarray:
    """Deterministic random-hyperplane matrix, cached per worker process —
    hot map_batches stages (embedding_dedup's add_bucket) call this per
    batch; regeneration is cheap at d=64 but it's still per-batch state
    setup in a hot loop, so memoize (cap keeps long-lived workers bounded)."""
    key = (d, nbits, seed)
    planes = _PLANES_CACHE.get(key)
    if planes is None:
        rng = np.random.RandomState(seed)
        planes = _cache_put(_PLANES_CACHE, key, rng.standard_normal((nbits, d)))
    return planes


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits * (1 << np.arange(planes.shape[0]))).sum(axis=1).astype(np.int32)


def knn_ivf(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
            vec_col: str = "embedding", nbits: int = 6, seed: int = 42,
            expand: int = 1, concurrency=8):
    """Approximate top-k: score only rows in each query's LSH bucket
    (± ``expand`` Hamming bits). Same output shape as knn_brute."""
    q = np.asarray(queries, dtype=np.float64)
    planes = lsh_planes(q.shape[1], nbits, seed)
    q_buckets = _bucket_of(_normalize(q), planes)
    wanted: set[int] = set()
    for b in q_buckets:
        wanted.add(int(b))
        if expand >= 1:
            for bit in range(nbits):
                wanted.add(int(b) ^ (1 << bit))
    wanted_arr = pa.array(sorted(wanted), pa.int32())

    def prefilter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = _normalize(_batch_matrix(batch, vec_col))
        buckets = _bucket_of(m, planes)
        mask = pc.is_in(pa.array(buckets, pa.int32()), value_set=wanted_arr)
        return batch.filter(mask)

    filtered = ds.map_batches(prefilter, batch_format="pyarrow")
    return knn_brute(filtered, q, k=k, id_col=id_col, vec_col=vec_col,
                     concurrency=concurrency)


def _bucket_keeper_dups(v: np.ndarray, threshold: float,
                        chunk: int = 2048) -> np.ndarray:
    """Keeper-based near-dup mask over one bucket's normalized vectors (rows
    id-sorted): row j is a duplicate iff some NON-duplicate i<j has cosine ≥
    threshold (the reference's sequential skip-dups scan). The cosine work is
    vectorized matmul; matrices are chunked so memory stays bounded for any
    bucket population."""
    b = len(v)
    dup = np.zeros(b, dtype=bool)
    if b <= 1:
        return dup
    if b <= chunk:
        sims = v @ v.T
        for j in range(1, b):
            col = sims[:j, j]
            if col[~dup[:j]].size and col[~dup[:j]].max() >= threshold:
                dup[j] = True
        return dup
    for c0 in range(0, b, chunk):
        c1 = min(c0 + chunk, b)
        cv = v[c0:c1]
        # vs earlier keepers, in bounded column slabs
        pre = np.zeros(c1 - c0, dtype=bool)
        keep_idx = np.flatnonzero(~dup[:c0])
        for k0 in range(0, len(keep_idx), chunk * 4):
            kk = keep_idx[k0 : k0 + chunk * 4]
            pre |= ((cv @ v[kk].T) >= threshold).any(axis=1)
        local = cv @ cv.T
        for r in range(c1 - c0):
            if pre[r]:
                dup[c0 + r] = True
                continue
            col = local[:r, r]
            live = ~dup[c0 : c0 + r]
            if col[live].size and col[live].max() >= threshold:
                dup[c0 + r] = True
    return dup


def train_kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10,
                 seed: int = 42) -> np.ndarray:
    """Plain Lloyd's k-means on a driver-side SAMPLE (normalized rows),
    numpy-vectorized. The sample is the only thing that leaves the cluster —
    centroid training on a bounded sample is the standard IVF recipe."""
    v = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.RandomState(seed)
    n_clusters = min(n_clusters, len(v))
    cent = v[rng.choice(len(v), n_clusters, replace=False)]
    for _ in range(iters):
        assign = (v @ cent.T).argmax(axis=1)
        for c in range(n_clusters):
            members = v[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def _hash_sample(ds, id_col: str, n_rows: int, sample_size: int):
    """Deterministic UNIFORM sample of ~``sample_size`` rows: keep a row iff
    hash(id) falls below sample_size/n_rows of the 64-bit space. Unlike
    ``ds.limit(n)`` (the first n rows in BLOCK order — one slice of a
    sorted/partitioned corpus), every block contributes proportionally, so a
    quantizer trained on the sample sees the whole distribution. Stateless
    vectorized filter, no shuffle; expected driver pull = sample_size rows
    regardless of corpus size."""
    if n_rows <= sample_size:
        return ds
    # hash_pandas_object is deterministic for a fixed hash key (default),
    # dtype-agnostic (int or string ids), and uniform over uint64
    thresh = np.uint64(int((sample_size / n_rows) * 2**64))

    def keep(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch.column(id_col).to_pandas(), index=False).to_numpy()
        return batch.filter(pa.array(h < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def knn_ivf_kmeans(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
                   vec_col: str = "embedding", n_clusters: int = 16,
                   nprobe: int = 2, sample_size: int = 10_000, seed: int = 42,
                   num_rows_hint: int | None = None):
    """Classic IVF: k-means coarse quantizer trained on a driver-side sample,
    centroids broadcast; each batch keeps only rows whose nearest centroid is
    among any query's ``nprobe`` closest centroids, then exact top-k over the
    survivors. Approximate; recall grows with nprobe. Same output shape as
    knn_brute. At cluster scale the sample bound and the centroid broadcast
    keep driver memory constant regardless of corpus size.

    The quantizer trains on a deterministic HASH sample (``_hash_sample``),
    not ``ds.limit`` — the first-N-rows slice of a sorted or partitioned
    corpus would show the quantizer one corner of the distribution and
    silently degrade nprobe recall. Pass ``num_rows_hint`` when ``ds`` is a
    derived pipeline (``ds.count()`` would execute it just for the count)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    n_rows = num_rows_hint if num_rows_hint is not None else ds.count()
    sample = _hash_sample(ds, id_col, n_rows, sample_size).to_pandas()
    sv = np.asarray(list(sample[vec_col]), dtype=np.float64)
    cent = train_kmeans(sv, n_clusters, seed=seed)
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    wanted = np.unique(probe)

    try:
        import ray

        cent_ref = ray.put(cent)
    except Exception:
        cent_ref = cent

    def prefilter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = cent_ref
        if "ObjectRef" in type(c).__name__:
            c = _ray.get(c)
        m = _normalize(_batch_matrix(batch, vec_col))
        assign = (m @ c.T).argmax(axis=1)
        mask = np.isin(assign, wanted)
        return batch.filter(pa.array(mask))

    filtered = ds.map_batches(prefilter, batch_format="pyarrow")
    return knn_brute(filtered, q, k=k, id_col=id_col, vec_col=vec_col)


def dbscan_clusters(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                    threshold: float = 0.85, min_samples: int = 3,
                    nbits: int | None = None, seed: int = 42,
                    shards: int = 256, target_bucket_rows: int = 128,
                    max_bucket_rows: int = 2048):
    """The reference's offline DBSCAN corpus builder
    (ref:text_quality_filter/utils/clustering.py:49-90: DBSCAN over a full
    precomputed cosine-DISTANCE matrix, eps = 1 - similarity_threshold,
    min_samples = min_cluster_size, noise label -1) re-expressed without the
    O(n²) matrix: rows are LSH-bucketed by random-hyperplane signs (same
    blocking as embedding_dedup — members of a tight cluster agree on all
    sign bits w.h.p.), and EXACT DBSCAN runs per bucket: neighbor = cosine ≥
    threshold (distance ≤ eps), core = ≥ min_samples neighbors including
    itself, clusters = connected core components plus attached border
    points. Approximation is the blocking only — clusters wider than one
    bucket split (documented recall trade, like every banded dedup here).

    Output: one row per input row, (id_col, cluster, is_core) where
    ``cluster`` is the MIN member id of the cluster (stable, join-able) and
    null for noise. Grouping is by a coarse shard of the bucket; in-bucket
    work is vectorized numpy over ~target_bucket_rows rows. Degenerate
    buckets (low-entropy corpora collapse many rows onto one bucket) are
    processed in id-sorted slices of ``max_bucket_rows`` so the adjacency
    matrix stays ≤ ~4M cells — clusters wider than a slice split (the same
    documented recall trade as the bucket blocking itself)."""
    if nbits is None:
        n_rows = ds.count()
        nbits = int(np.clip(np.ceil(np.log2(max(n_rows, 2) / target_bucket_rows)),
                            4, 24))

    def add_bucket(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col))
        planes = lsh_planes(m.shape[1], nbits, seed)
        buckets = _bucket_of(m, planes)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(buckets, pa.int32()),
                "shard": pa.array((buckets % shards).astype(np.int32)),
                vec_col: batch.column(vec_col),
            }
        )

    def mark(group: pa.Table) -> pa.Table:
        t = group.sort_by([("bucket", "ascending"), (id_col, "ascending")])
        n = t.num_rows
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(t, vec_col))
        id_type = t.schema.field(id_col).type
        new_b = np.empty(n, dtype=bool)
        new_b[0] = True
        new_b[1:] = buckets[1:] != buckets[:-1]
        starts = np.flatnonzero(new_b)
        ends = np.append(starts[1:], n)
        out_cluster = np.full(n, None, dtype=object)
        out_core = np.zeros(n, dtype=bool)
        ranges = [(s, min(s + max_bucket_rows, e0))
                  for s0, e0 in zip(starts, ends)
                  for s in range(s0, e0, max_bucket_rows)]
        for s, e in ranges:
            b = e - s
            if b < min_samples:
                continue  # too small for any core point → all noise
            v = m[s:e]
            adj = (v @ v.T) >= threshold  # includes self (cos=1)
            core = adj.sum(axis=1) >= min_samples
            if not core.any():
                continue
            # connected components of the core subgraph by vectorized
            # min-label propagation (converges in O(component diameter)
            # rounds — near-dup clusters are near-cliques, so 1-2 rounds)
            ci = np.flatnonzero(core)
            adjc = adj[np.ix_(ci, ci)]
            nc = len(ci)
            lab = np.arange(nc)
            while True:
                new = np.where(adjc, lab[None, :], nc).min(axis=1)
                new = np.minimum(new, lab)
                if np.array_equal(new, lab):
                    break
                lab = new
            roots = np.full(b, -1, dtype=np.int64)
            roots[ci] = ci[lab]
            # border points: non-core with ≥1 core neighbor join that core's
            # cluster (first core neighbor, matching sklearn's assignment)
            noncore = np.flatnonzero(~core)
            if noncore.size:
                adj_nc = adj[np.ix_(noncore, ci)]
                has = adj_nc.any(axis=1)
                first_core = ci[adj_nc.argmax(axis=1)]
                roots[noncore[has]] = roots[first_core[has]]
            member = roots >= 0
            if member.any():
                bucket_ids = ids[s:e]
                mem_idx = np.flatnonzero(member)
                min_id = pd.Series(bucket_ids[mem_idx]).groupby(
                    roots[mem_idx]).transform("min").to_numpy()
                view = out_cluster[s:e]
                view[mem_idx] = min_id
            out_core[s:e] = core
        return pa.table(
            {
                id_col: pa.array(ids, id_type),
                "cluster": pa.array(out_cluster.tolist(), id_type),
                "is_core": pa.array(out_core),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(mark, batch_format="pyarrow")
    )


def embedding_dedup(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                    threshold: float = 0.85, nbits: int | None = None,
                    seed: int = 42, shards: int = 256,
                    target_bucket_rows: int = 128, strategy: str = "auto",
                    broadcast_limit: int = 2_000_000):
    """Embedding-cosine near-dup removal — the distributed re-expression of the
    reference's check_duplicate (max cosine vs corpus ≥ 0.85 → duplicate,
    ref:utils/clustering.py:169-185) without the O(n²) matrix:

    rows are LSH-bucketed by random-hyperplane signs; within each bucket a
    keeper-based vectorized cosine scan drops every row that matches an
    earlier keeper (keep-first by id). Near-identical vectors agree on all
    sign bits with high probability.

    Scale levers: ``nbits=None`` sizes the bucket space from the corpus count
    (≈ n / target_bucket_rows buckets, clamped to [4, 24] bits) so expected
    bucket population stays constant as the corpus grows; grouping is by a
    COARSE shard of the bucket (never one Ray group per bucket); in-bucket
    matrices are chunk-bounded. Returns (deduped_ds, dup_ids)."""
    if nbits is None:
        n_rows = ds.count()  # parquet-metadata count on an un-mapped read
        nbits = int(np.clip(np.ceil(np.log2(max(n_rows, 2) / target_bucket_rows)),
                            4, 24))

    def add_bucket(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col))
        planes = lsh_planes(m.shape[1], nbits, seed)
        buckets = _bucket_of(m, planes)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(buckets, pa.int32()),
                "shard": pa.array((buckets % shards).astype(np.int32)),
                vec_col: batch.column(vec_col),
            }
        )

    def mark(group: pa.Table) -> pa.Table:
        t = group.sort_by([("bucket", "ascending"), (id_col, "ascending")])
        n = t.num_rows
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(t, vec_col))
        new_b = np.empty(n, dtype=bool)
        new_b[0] = True
        new_b[1:] = buckets[1:] != buckets[:-1]
        starts = np.flatnonzero(new_b)
        ends = np.append(starts[1:], n)
        dup_mask = np.zeros(n, dtype=bool)
        for s, e in zip(starts, ends):
            if e - s > 1:
                dup_mask[s:e] = _bucket_keeper_dups(m[s:e], threshold)
        return t.select([id_col]).filter(pa.array(dup_mask))

    from chinese_corpus_cleaning_ray.stages.dedup_stage import anti_filter

    dup_ids_ds = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(mark, batch_format="pyarrow")
    )
    return anti_filter(ds, dup_ids_ds, id_col, strategy=strategy,
                       broadcast_limit=broadcast_limit)

def semdedup(ds, id_col: str = "vec_id", vec_col: str = "embedding",
             threshold: float = 0.85, n_clusters: int | None = None,
             target_cluster_rows: int = 512, sample_size: int = 10_000,
             iters: int = 10, seed: int = 42, shards: int = 256,
             strategy: str = "auto", broadcast_limit: int = 2_000_000,
             num_rows_hint: int | None = None):
    """SemDeDup (Abbas et al. 2023): semantic dedup via k-means clustering of
    embeddings, then a within-cluster cosine prune. Differs from
    ``embedding_dedup``'s LSH buckets in two ways that follow the paper:

    * clusters come from a k-means coarse quantizer (trained on a
      deterministic hash sample, centroids broadcast once) — semantically
      coherent groups instead of random-hyperplane cells;
    * within a duplicate group the KEPT row is the one FARTHEST from its
      cluster centroid (the paper's "keep outliers" rule, preserving
      diversity): rows are scanned in (centroid-cosine ASC, id ASC) order, so
      the keeper-based scan keeps low-centroid-similarity rows first.

    Same scale levers as embedding_dedup: ``n_clusters=None`` sizes the
    codebook to ≈ n / target_cluster_rows (clamped to [4, 65536]); Ray groups
    by a COARSE shard of the cluster id, never one group per cluster;
    in-cluster cosine matrices are chunk-bounded by ``_bucket_keeper_dups``.
    Like every approximate dedup here it has no SQL oracle — its recall is
    quantified against the exact all-pairs truth in the tests. Returns
    ``(deduped_ds, dup_ids_ds)``.
    """
    n_rows = num_rows_hint if num_rows_hint is not None else ds.count()
    if n_clusters is None:
        n_clusters = int(np.clip(n_rows // target_cluster_rows, 4, 65_536))
    sample = _hash_sample(ds, id_col, n_rows, sample_size).to_pandas()
    cent = train_kmeans(np.asarray(list(sample[vec_col]), dtype=np.float64),
                        n_clusters, iters=iters, seed=seed)
    try:
        import ray

        cent_ref = ray.put(cent)
    except Exception:
        cent_ref = cent

    def add_cluster(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = cent_ref
        if "ObjectRef" in type(c).__name__:
            c = _ray.get(c)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ c.T
        assign = sims.argmax(axis=1)
        return pa.table({
            id_col: batch.column(id_col),
            "cluster": pa.array(assign.astype(np.int32)),
            "cent_sim": pa.array(sims[np.arange(len(assign)), assign]),
            "shard": pa.array((assign % shards).astype(np.int32)),
            vec_col: batch.column(vec_col),
        })

    def mark(group: pa.Table) -> pa.Table:
        # SemDeDup keep rule: scan farthest-from-centroid first, so the
        # keeper retained out of each duplicate group is the cluster outlier
        t = group.sort_by([("cluster", "ascending"),
                           ("cent_sim", "ascending"),
                           (id_col, "ascending")])
        n = t.num_rows
        clusters = t.column("cluster").to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(t, vec_col))
        new_c = np.empty(n, dtype=bool)
        new_c[0] = True
        new_c[1:] = clusters[1:] != clusters[:-1]
        starts = np.flatnonzero(new_c)
        ends = np.append(starts[1:], n)
        dup_mask = np.zeros(n, dtype=bool)
        for s, e in zip(starts, ends):
            if e - s > 1:
                dup_mask[s:e] = _bucket_keeper_dups(m[s:e], threshold)
        return t.select([id_col]).filter(pa.array(dup_mask))

    from chinese_corpus_cleaning_ray.stages.dedup_stage import anti_filter

    dup_ids_ds = (ds.map_batches(add_cluster, batch_format="pyarrow")
                  .groupby("shard")
                  .map_groups(mark, batch_format="pyarrow"))
    return anti_filter(ds, dup_ids_ds, id_col, strategy=strategy,
                       broadcast_limit=broadcast_limit)
