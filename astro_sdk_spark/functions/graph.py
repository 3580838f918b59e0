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
    checkpoint_every: int = 4,
    assume_deduped: bool = False,
) -> DataFrame:
    """Iterate fixed-point PageRank over ``edges``; returns
    ``(node, pr)`` with ``pr`` in integer ``1/scale`` units.

    Every node starts at ``scale``; each round sets
    ``pr' = ((100 − damping_pct)·scale) div 100
    + (damping_pct · Σ_incoming (pr div out_deg)) div 100``.
    All arithmetic is BIGINT — see module docstring for why.

    ``checkpoint_every`` bounds lineage depth: an eager localCheckpoint
    every N rounds truncates the growing plan (and releases the
    superseded blocks), while the rounds in between stay LAZY — a short
    run (iters < N) is one pipelined job instead of one forced
    materialization per round, which measured ~2× on the bench graph.

    ``assume_deduped=True`` skips the internal edge dropDuplicates —
    for callers whose edge table is distinct by construction (a
    DISTINCT upstream, a keyed store). The invariant matters: duplicate
    edges would multiply transferred mass. Don't pay the same shuffle
    twice; don't skip it on a raw link log either.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not (0 < damping_pct < 100):
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    from astro_sdk_spark.functions._cache import checkpoint_rdd_ids, unpersist_rdd_ids

    spark = edges.sparkSession
    raw = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
    if not assume_deduped:
        raw = raw.dropDuplicates(["_s", "_d"])
    deg = raw.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    # fold the STATIC out-degree into the edge table once — the naive
    # loop re-joins deg every round, paying an extra shuffle × iters
    e = raw.join(deg, "_s").localCheckpoint()
    # id read from the checkpointed DF itself — a global set diff races
    # with concurrent queries' checkpoints (see _cache.checkpoint_rdd_ids)
    _edge_ckpt = checkpoint_rdd_ids(e)

    nodes = (
        e.select(F.col("_s").alias("_n"))
        .unionByName(e.select(F.col("_d").alias("_n")))
        .distinct()
    )
    base = ((100 - damping_pct) * scale) // 100

    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    # Sparse iteration state: ``pr`` holds ranks ONLY for nodes with
    # incoming edges — a node nobody links to has the known-constant
    # rank (``scale`` before round 1, ``base`` after), so it rides as a
    # coalesce default in the contributor join instead of a full-node
    # left-join every round. That cuts one shuffle per round; the
    # complete node set is applied ONCE at the end.
    pr = None  # None ⇒ every node still at the round's default
    prev_ckpt: set[int] = set()
    for i in range(iters):
        default = F.lit(int(scale) if i == 0 else int(base)).cast("bigint")
        if pr is None:
            src = e.select("_d", default.alias("_pr2"), "_deg")
        else:
            src = e.join(pr.withColumnRenamed("_n", "_s"), "_s", "left").select(
                "_d", F.coalesce(F.col("_pr"), default).alias("_pr2"), "_deg"
            )
        contrib = (
            src.select("_d", F.expr("_pr2 div _deg").alias("_c"))
            .groupBy("_d")
            .agg(F.sum("_c").alias("_sum"))
        )
        pr = contrib.select(
            F.col("_d").alias("_n"),
            (
                F.lit(int(base)).cast("bigint")
                + F.expr(f"CAST({damping_pct} AS BIGINT) * _sum div 100")
            ).alias("_pr"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            pr = pr.localCheckpoint()
            new_ckpt = checkpoint_rdd_ids(pr)
            if prev_ckpt:
                unpersist_rdd_ids(spark, prev_ckpt)
            prev_ckpt = new_ckpt

    # apply the full node universe once: nodes never linked-to hold the
    # final round's default rank
    pr = nodes.join(pr, "_n", "left").select(
        "_n",
        F.coalesce(F.col("_pr"), F.lit(int(base)).cast("bigint")).alias("_pr"),
    )

    # The returned plan is LAZY past the last checkpoint, so the edge
    # blocks (and the last mid-loop checkpoint, if any) MUST stay alive
    # until the caller materializes — lineage is truncated at a
    # localCheckpoint, so releasing early would make the job fail, not
    # recompute. The blocks are swept by the repo-wide
    # sweep_persistent_rdds (bench/stream loops) once the result is
    # consumed; _edge_ckpt/prev_ckpt are intentionally left persisted.
    del _edge_ckpt, prev_ckpt
    return pr.select(F.col("_n").alias("node"), F.col("_pr").alias("pr"))
