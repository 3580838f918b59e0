"""Fixed-point PageRank — deterministic link analysis over edge tables.

PageRank (Page, Brin, Motwani & Winograd, 1999) is the classic
graph-quality signal in web-corpus curation: Common-Crawl-derived
pipelines rank hosts/domains by centrality in the link graph and keep or
re-weight documents by their host's score. The reference SDK has no
graph layer; this completes the engine's pipeline family next to
connected components (``dedup.near_dup_clusters``).

Determinism is the design constraint here, as everywhere in this repo:
float PageRank is NOT reproducible across engines (per-node contribution
sums are grouped float additions, and addition order differs between
Spark partial aggregation and any oracle's sequential scan). So ranks
live in FIXED-POINT integer units (``scale`` = one unit of probability
mass, default 1e6): contributions are ``pr div out_degree`` (integer
division), the damping multiply is ``(damping_pct · Σcontrib) div 100``,
and every per-node sum is a BIGINT sum — associative, commutative,
order-independent, bit-identical in Spark and DuckDB. That is what lets
``q_pagerank`` unroll its iterations in SQL and hash-match EXACTLY, the
same device as ``q_ivf_trained``'s unrolled Lloyd rounds. (Rounding
drift vs float PageRank is ≤ n·iters ulps of 1/scale — irrelevant for
ranking; determinism is worth far more at 100 TB than the 7th decimal.)

Semantics notes, pinned by tests:
- dangling nodes (no out-edges) keep receiving mass but re-emit none
  (their mass leaks, the common simplification — Page et al. §2.1.2
  handle it by renormalization; rank ORDER is unaffected);
- duplicate edges are collapsed (link multiplicity does not multiply
  mass); self-loops participate like any edge;
- the node universe is src ∪ dst of the (deduped) edge table.

Scale shape per iteration: one broadcast-or-shuffle join of ranks onto
edges (ranks are one row per node — the small side at web scale where
edges ≫ nodes), one groupBy(dst) BIGINT sum with map-side partial
aggregation, one left join back onto the node universe. O(iters)
shuffles total; ``localCheckpoint`` every round truncates lineage so
round N's plan does not replay rounds 1..N−1 (the near_dup_clusters
bookkeeping, including eager release of superseded checkpoint blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "pagerank"]


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components of an undirected edge table →
    ``(node, component)`` with the component labeled by its minimum node.

    The general-graph entry point for the engine's large-star/small-star
    contraction (Kiveris et al., SOCC'14) — the same O(log n)-round
    machinery :func:`dedup.near_dup_clusters` runs over near-dup pairs,
    exposed under graph vocabulary so non-dedup callers (entity
    resolution, partition discovery, reachability pruning) don't reach
    into the dedup module. Edge direction is ignored; singleton nodes
    (absent from ``edges``) are absent from the output, as in
    ``near_dup_clusters``."""
    from astro_sdk_spark.functions.dedup import near_dup_clusters

    return near_dup_clusters(
        edges,
        id_a=src_col,
        id_b=dst_col,
        out_id="node",
        out_cluster="component",
        max_iter=max_iter,
        stats=stats,
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """Iterate fixed-point PageRank over ``edges``; returns
    ``(node, pr)`` with ``pr`` in integer ``1/scale`` units.

    Every node starts at ``scale``; each round sets
    ``pr' = ((100 − damping_pct)·scale) div 100
    + (damping_pct · Σ_incoming (pr div out_deg)) div 100``.
    All arithmetic is BIGINT — see module docstring for why.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not (0 < damping_pct < 100):
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    from astro_sdk_spark.functions._cache import persistent_rdd_ids, unpersist_rdd_ids

    spark = edges.sparkSession
    _before = persistent_rdd_ids(spark)
    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .dropDuplicates(["_s", "_d"])
        .localCheckpoint()
    )
    _edge_ckpt = persistent_rdd_ids(spark) - _before

    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    nodes = (
        e.select(F.col("_s").alias("_n"))
        .unionByName(e.select(F.col("_d").alias("_n")))
        .distinct()
    )
    base = ((100 - damping_pct) * scale) // 100

    pr = nodes.select("_n", F.lit(int(scale)).cast("bigint").alias("_pr"))
    prev_ckpt: set[int] = set()
    for _ in range(iters):
        contrib = (
            e.join(pr.withColumnRenamed("_n", "_s"), "_s")
            .join(deg, "_s")
            .select("_d", F.expr("_pr div _deg").alias("_c"))
            .groupBy("_d")
            .agg(F.sum("_c").alias("_sum"))
        )
        before = persistent_rdd_ids(spark)
        pr = (
            nodes.join(contrib.withColumnRenamed("_d", "_n"), "_n", "left")
            .select(
                "_n",
                (
                    F.lit(int(base)).cast("bigint")
                    + F.expr(
                        f"CAST({damping_pct} AS BIGINT)"
                        " * coalesce(_sum, CAST(0 AS BIGINT)) div 100"
                    )
                ).alias("_pr"),
            )
            .localCheckpoint()
        )
        new_ckpt = persistent_rdd_ids(spark) - before
        if prev_ckpt:
            unpersist_rdd_ids(spark, prev_ckpt)
        prev_ckpt = new_ckpt

    out = pr.select(F.col("_n").alias("node"), F.col("_pr").alias("pr"))
    # materialize before releasing the edge checkpoint would be the
    # caller's concern; keep edge blocks alive — they back the returned
    # plan only until the final checkpoint, which already embeds the
    # data, so the edge blocks can go now.
    unpersist_rdd_ids(spark, _edge_ckpt)
    return out
