"""Distributed connected components over a duplicate-candidate edge list.

Why this exists: every pairwise dedup in this repo (exact / minhash /
simhash / jaccard) drops the LARGER id of each qualifying pair. That is
NOT transitive-closure clustering — on the edge set {(1,3), (3,4), (2,4)}
pairwise dropping keeps BOTH 1 and 2 even though all four documents are one
duplicate cluster. Production corpus dedup (the notion used by the
large-scale near-dedup literature) keeps exactly ONE document per
connected component of the duplicate graph. This module supplies that
semantics as a first-class Ray Data operator.

Algorithm: alternating Large-Star / Small-Star from Kiveris, Lattanzi,
Mirrokni, Rastogi & Vassilvitskii, "Connected Components in MapReduce and
Beyond" (ACM SoCC 2014) — the standard shared-nothing formulation.
Each round is two coarse-shard ``groupby().map_groups`` passes over the
EDGE LIST only (size O(duplicate pairs), tiny relative to the corpus),
converging in O(log² n) rounds to a forest of stars whose centers are the
per-component minimum node ids:

- Large-Star (per node u): m = min over u and its neighbors; re-point every
  STRICTLY LARGER neighbor v > u at m (emit (v, m)).
- Small-Star (per node u over edges directed larger→smaller): m = min of
  u's smaller-neighbors; re-point u and every smaller neighbor except m
  itself at m.

Both passes shard nodes by a 64-bit hash so a node's full neighborhood
meets in one shard; per-shard work is vectorized pandas. Convergence is
detected on an order-insensitive checksum (count + summed row hashes) of
the DEDUPLICATED directed edge set between rounds — the dedup pass doubles
as the checksum pass, so a round costs three shuffles of pair-sized rows.

The reference repo has no clustering of any kind (its dedupe is an external
binary, ref:Crawl_Page/tools/clear_redundancy.py:172-190); this operator is
part of the beyond-reference LLM-pipeline surface, composed with
``dedup_stage.ngram_jaccard_edges`` for the oracled duplicate-cluster query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _hash_shard(keys: pd.Series, shards: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
    return (h % np.uint64(shards)).astype(np.int32)


def _edge_checksum(edges) -> tuple[int, int]:
    """(row count, mod-2^64 sum of per-row hashes) of a deduplicated edge
    Dataset — order-insensitive, so equal checksums across rounds mean the
    directed edge SET is unchanged. Partials are computed per batch in
    workers; only two integers per batch reach the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"u": batch.column("u").to_pandas(),
                           "v": batch.column("v").to_pandas()})
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        # 63-bit mask keeps the partial inside Arrow int64; the masked sum
        # is still an order-insensitive set fingerprint
        s = int(h.sum(dtype=np.uint64) & np.uint64(0x7FFFFFFFFFFFFFFF))
        return pa.table({"n": pa.array([batch.num_rows], pa.int64()),
                         "s": pa.array([s], pa.int64())})

    parts = edges.map_batches(partial, batch_format="pyarrow")
    df = parts.to_pandas()  # one 2-int row per block — always tiny
    if not len(df):
        return 0, 0
    return int(df["n"].sum()), int(df["s"].to_numpy(dtype=np.uint64)
                                   .sum(dtype=np.uint64))


def connected_components(edges, a_col: str = "a", b_col: str = "b",
                         shards: int | None = None, max_rounds: int = 32):
    """Connected components of the undirected graph given by an edge-list
    Dataset. Returns a (``node``, ``component``) Dataset covering every
    NON-CENTER node: ``component`` is the minimum node id of its component
    and ``node > component`` strictly; component minima (and nodes that
    appear in no edge) are absent — treat a missing node as mapping to
    itself (``attach_components`` does exactly that).

    Node ids may be integers or strings (any totally ordered, hashable
    Arrow type); both endpoint columns must share one type. Self-loops and
    duplicate/reversed edges are ignored. Raises ``RuntimeError`` if the
    star forest has not stabilized after ``max_rounds`` alternating rounds
    (the published bound is O(log² n) — 32 covers any real graph;
    adversarial inputs should raise, not silently return wrong clusters).
    """
    from chinese_corpus_cleaning_ray.stages.pools import cluster_cpus

    if shards is None:
        shards = max(8, cluster_cpus())

    def canon(batch: pa.Table) -> pa.Table:
        """Initial normalization: direct every edge larger→smaller, drop
        self-loops, batch-local dedup, shard by the larger endpoint."""
        a = batch.column(a_col).to_pandas()
        b = batch.column(b_col).to_pandas()
        ne = a != b
        a, b = a[ne], b[ne]
        hi = a.where(a > b, b)
        lo = b.where(a > b, a)
        df = pd.DataFrame({"u": hi, "v": lo}).drop_duplicates()
        df["shard"] = _hash_shard(df["u"], shards)
        return pa.Table.from_pandas(df, preserve_index=False)

    def large_star_emit(batch: pa.Table) -> pa.Table:
        """Both directions of every edge, sharded by the first endpoint, so
        each node's FULL neighborhood converges on one shard."""
        u = batch.column("u").to_pandas()
        v = batch.column("v").to_pandas()
        df = pd.DataFrame({"u": pd.concat([u, v], ignore_index=True),
                           "v": pd.concat([v, u], ignore_index=True)})
        df["shard"] = _hash_shard(df["u"], shards)
        return pa.Table.from_pandas(df, preserve_index=False)

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "v"])
        mn = g.groupby("u", sort=False)["v"].transform("min")
        m = mn.where(mn < g["u"], g["u"])  # min over Γ(u) ∪ {u}
        big = g["v"] > g["u"]
        out = pd.DataFrame({"u": g.loc[big, "v"].to_numpy(),
                            "v": m[big].to_numpy()}).drop_duplicates()
        out["shard"] = _hash_shard(out["u"], shards)
        return out

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        # edges arrive directed larger→smaller (large_star emits (v, m) with
        # v > m; canon emits hi→lo), grouped by the larger endpoint u
        g = g.drop_duplicates(["u", "v"])
        mn = g.groupby("u", sort=False)["v"].transform("min")
        nb = g["v"] != mn
        heads = g.groupby("u", sort=False)["v"].min().reset_index()
        out = pd.concat([
            pd.DataFrame({"u": g.loc[nb, "v"].to_numpy(),
                          "v": mn[nb].to_numpy()}),
            pd.DataFrame({"u": heads["u"].to_numpy(),
                          "v": heads["v"].to_numpy()}),
        ], ignore_index=True).drop_duplicates()
        out = out[out["u"] != out["v"]]
        out["shard"] = _hash_shard(out["u"], shards)
        return out

    def dedup_shard(g: pd.DataFrame) -> pd.DataFrame:
        # all copies of a directed edge share u, hence a shard — local
        # drop_duplicates IS global dedup
        return g.drop_duplicates(["u", "v"])[["u", "v"]]

    edges = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(dedup_shard, batch_format="pandas")
        .materialize()
    )
    if edges.count() == 0:  # no edges at all (empty or all self-loops)
        return _as_mapping_ds(edges)

    check = _edge_checksum(edges)
    for _ in range(max_rounds):
        edges = (
            edges.map_batches(large_star_emit, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(large_star, batch_format="pandas")
            .groupby("shard")
            .map_groups(small_star, batch_format="pandas")
            .groupby("shard")
            .map_groups(dedup_shard, batch_format="pandas")
            .materialize()
        )
        new_check = _edge_checksum(edges)
        if new_check == check:
            return _as_mapping_ds(edges)
        check = new_check
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(published bound is O(log² n) — raise max_rounds or check the "
        "edge list for pathological size)")


def _as_mapping_ds(edges):
    """Final star edges (u → component center v) as a (node, component)
    Dataset. At convergence each non-center node has exactly one out-edge;
    the rename is a zero-copy projection."""

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "component": pa.array([], pa.int64())})
        return pa.table({"node": batch.column("u"),
                         "component": batch.column("v")})

    return edges.map_batches(rename, batch_format="pyarrow")


def attach_components(ds, comp_ds, id_col: str,
                      component_col: str = "component",
                      strategy: str = "auto",
                      broadcast_limit: int = 2_000_000):
    """Append a ``component_col`` to ``ds``: the component minimum from the
    ``connected_components`` mapping, or the row's own ``id_col`` value for
    nodes absent from the mapping (centers and singletons) — giving every
    row a total cluster assignment.

    ``strategy="auto"`` mirrors ``anti_filter``: the mapping (its size is
    the number of NON-KEEPER duplicate documents) is materialized and its
    count picks broadcast (≤ ``broadcast_limit``: one ``ray.put``, local
    vectorized lookup per batch) vs a fully distributed ``hash_join`` left
    join (the 100-TB valve when duplicates number in the billions)."""
    import ray

    from chinese_corpus_cleaning_ray.stages.joins import hash_join

    if strategy not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy in ("auto", "join"):
        comp_ds = comp_ds.materialize()
        n = comp_ds.count()
        if strategy == "auto":
            strategy = "broadcast" if n <= broadcast_limit else "join"

    if strategy == "join":
        def to_key(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0:
                return batch
            return pa.table({id_col: batch.column("node"),
                             component_col: batch.column("component")})

        joined = hash_join(ds, comp_ds.map_batches(to_key,
                                                   batch_format="pyarrow"),
                           on=id_col, how="left")

        def fill(batch: pa.Table) -> pa.Table:
            comp = pc.coalesce(
                batch.column(component_col),
                pc.cast(batch.column(id_col),
                        batch.schema.field(component_col).type))
            return batch.set_column(
                batch.schema.get_field_index(component_col),
                component_col, comp)

        return joined.map_batches(fill, batch_format="pyarrow")

    pdf = comp_ds.to_pandas()
    mapping = (dict(zip(pdf["node"], pdf["component"]))
               if len(pdf) and "node" in pdf.columns else {})
    ref = ray.put(mapping)

    def add_comp(batch: pa.Table) -> pa.Table:
        import ray as _ray

        m = ref
        if isinstance(m, _ray.ObjectRef):
            m = _ray.get(m)
        ids = batch.column(id_col)
        vals = ids.to_pandas()
        if m:
            mapped = vals.map(m)
            comp = mapped.where(mapped.notna(), vals)
        else:
            comp = vals
        return batch.append_column(
            component_col, pa.Array.from_pandas(comp, type=ids.type))

    return ds.map_batches(add_comp, batch_format="pyarrow")


def component_dedup(ds, edges, id_col: str, a_col: str = "a",
                    b_col: str = "b", strategy: str = "auto",
                    broadcast_limit: int = 2_000_000):
    """One-keeper-per-duplicate-cluster dedup: drop every row whose id is a
    NON-MINIMUM member of a connected component of ``edges``. Strictly
    stronger than pairwise dropping (see module docstring) and shares its
    keeper convention (component minimum ≡ ``exact_dedup``'s min-id
    keep-first). Ends in the shared ``anti_filter`` (auto broadcast/join),
    so the dup-id set never materializes on the driver. Returns
    ``(filtered_ds, dup_ids)`` like every other dedup here."""
    from chinese_corpus_cleaning_ray.stages.dedup_stage import anti_filter

    comp = connected_components(edges, a_col=a_col, b_col=b_col)

    def non_keepers(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return batch
        # mapping rows are exactly the non-center nodes (node > component)
        return pa.table({id_col: batch.column("node")})

    dup_ids_ds = comp.map_batches(non_keepers, batch_format="pyarrow")
    return anti_filter(ds, dup_ids_ds, id_col, strategy=strategy,
                       broadcast_limit=broadcast_limit)


def minhash_component_dedup(ds, id_col: str, text_col: str = "text",
                            num_perm: int = 64, num_bands: int = 16,
                            shingle_k: int = 5, seed: int = 42,
                            verify_threshold: float = 0.5,
                            verify_k: int | None = None,
                            strategy: str = "auto",
                            broadcast_limit: int = 2_000_000):
    """The SCALE-PATH cluster-correct dedup: MinHash-LSH band candidates →
    exact-Jaccard verified pairs (``minhash_edges``) → connected components
    → keep each component's minimum id. Candidate generation stays
    O(num_bands · n); the component loop touches verified pairs only. The
    exhaustive-pair twin is ``jaccard_component_dedup`` (oracle-checkable);
    at matched thresholds the two agree wherever the band recall catches
    the pair (see BENCH precision table for the band recall itself)."""
    from chinese_corpus_cleaning_ray.stages.dedup_stage import minhash_edges

    edges = minhash_edges(ds, id_col=id_col, text_col=text_col,
                          num_perm=num_perm, num_bands=num_bands,
                          shingle_k=shingle_k, seed=seed,
                          verify_threshold=verify_threshold,
                          verify_k=verify_k)
    return component_dedup(ds, edges, id_col, a_col="ia", b_col="ib",
                           strategy=strategy,
                           broadcast_limit=broadcast_limit)


def jaccard_component_dedup(ds, id_col: str, text_col: str = "text",
                            k: int = 5, threshold: float = 0.8,
                            shards: int | None = None,
                            max_df: int | None = 128,
                            strategy: str = "auto",
                            broadcast_limit: int = 2_000_000):
    """Cluster-correct exact-Jaccard dedup: ``ngram_jaccard_edges`` →
    ``connected_components`` → keep each component's minimum id. The
    composition the near-dedup literature means by "deduplicate": pairwise
    ``ngram_jaccard_dedup`` can keep several members of one transitive
    cluster; this keeps exactly one."""
    from chinese_corpus_cleaning_ray.stages.dedup_stage import (
        ngram_jaccard_edges,
    )

    edges = ngram_jaccard_edges(ds, id_col=id_col, text_col=text_col, k=k,
                                threshold=threshold, shards=shards,
                                max_df=max_df)
    return component_dedup(ds, edges, id_col, a_col="ia", b_col="ib",
                           strategy=strategy,
                           broadcast_limit=broadcast_limit)
