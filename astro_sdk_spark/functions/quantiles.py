"""Mergeable quantile sketch — deterministic equi-width histogram summary.

Completes the engine's sketch family: HLL → distinct counts, Bloom →
membership, CMS → frequencies, THIS → quantiles. The 100 TB use is the
same as the others': per-partition / per-day summaries of bounded size
(``≤ range/width`` buckets) that MERGE by bucket-wise addition, so a
year of daily sketches answers "p99 over any date range" without
rescanning data.

Why equi-width fixed-point instead of t-digest/KLL/DDSketch: those are
better sketches *statistically* (relative-error or rank-error bounds
with adaptive buckets), but their bucket boundaries come from floating
``log``/centroid arithmetic that is NOT bit-stable across engines — a
value at a boundary lands in different buckets under different libm
implementations, which forfeits this repo's cross-engine hash gate and,
worse, makes two *production clusters* disagree. Here the bucket index
is ``scaled_value div width`` over BIGINT fixed-point (``value_scale``
decimal digits — the repo-wide exact-money device), so building,
merging, and querying are pure integer arithmetic: associative,
commutative, reproducible everywhere. The accuracy contract is explicit
rather than probabilistic — any quantile estimate is within one bucket
width of an exact quantile (pytest-pinned), and ``width`` trades sketch
size against that error exactly like an HLL precision.

Quantile semantics: ``quantile q`` returns the LOWER BOUND of the first
bucket whose running count reaches ``ceil(q · N)`` — the bucket that
contains the exact lower-interpolation quantile. NULLs are excluded at
build (SQL aggregate semantics); negative values bucket correctly
(``div`` truncates toward zero, so the raw index is shifted by one for
negatives to keep buckets half-open ``[lo, lo+width)`` everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["quantile_sketch_build", "quantile_sketch_merge", "quantile_sketch_query"]


def _bucket(width: int) -> Column:
    """Floor-division bucket of the scaled value column ``_sv``: Spark
    ``div`` truncates toward zero, so negatives need the −1 shift to
    floor — keeps every bucket the half-open ``[b·width, (b+1)·width)``
    (DuckDB's ``//`` floors natively; the oracle uses it directly)."""
    q = F.expr(f"_sv div {width}")
    return F.when(
        (F.col("_sv") < 0) & (F.col("_sv") % width != 0), q - 1
    ).otherwise(q)


def quantile_sketch_build(
    df: DataFrame,
    value_col: str,
    width: int = 100,
    value_scale: int = 2,
    by: list[str] | None = None,
) -> DataFrame:
    """Sketch a numeric column → ``(*by, bucket, n)``; at most
    ``groups × range/width`` rows. ``value_scale`` is the fixed-point
    precision (2 → cents); ``width`` is the bucket size in SCALED units
    (100 → $1 buckets at scale 2). ``by`` sketches per group — the "p99
    latency per service" shape. One groupBy with map-side partial
    aggregation either way."""
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    keys = list(by or [])
    scale = 10 ** value_scale
    scaled = F.round(F.col(value_col) * scale).cast("bigint")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, scaled.alias("_sv"))
        .select(*keys, _bucket(width).alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantile_sketch_merge(*sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Bucket-wise sum — sketches of disjoint partitions/days combine
    into the sketch of their union (must share width/value_scale, which
    are part of a sketch's identity like an HLL's precision; pass the
    same ``by`` the sketches were built with)."""
    if not sketches:
        raise ValueError("at least one sketch required")
    keys = list(by or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys, "bucket").agg(F.sum("n").alias("n"))


def quantile_sketch_query(
    sketch: DataFrame,
    qs: list[float],
    width: int = 100,
    value_scale: int = 2,
    by: list[str] | None = None,
) -> DataFrame:
    """Evaluate quantiles → ``(*by, q, value)``: for each q (and group),
    the lower bound of the first bucket whose running count reaches
    ``ceil(q·N)``. The sketch is ≤ groups × range/width rows, so the
    cumsum windows run over sketch cells, never data; with ``by`` the
    window partitions by group (no single-partition bottleneck).

    SINGLE PASS over the sketch for ALL quantiles: the q values are
    exploded into the cumsum rows in-plan and each (group, q)'s answer
    is ``min(bucket)`` over the rows that reach the rank threshold — so
    an unmaterialized sketch expression (the common build→query chain)
    is computed once, not once per quantile. The previous one-branch-
    per-q union re-evaluated the entire upstream pipeline (scans
    included) ``len(qs)`` times. ``_qi`` (the position of q in ``qs``)
    rides along so duplicate q values still come back one row each."""
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    keys = list(by or [])
    scale = 10 ** value_scale
    w = (
        Window.partitionBy(*keys).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    value = (F.col("bucket") * width).cast("double") / F.lit(float(scale))
    # the q·N threshold multiplies as IEEE double in BOTH engines
    # (bit-stability contract) — keep q an explicit double literal
    qpairs = F.array(*[
        F.struct(F.lit(i).alias("_qi"), F.lit(float(q)).alias("q"))
        for i, q in enumerate(qs)
    ])
    # the group total is a whole-partition window sum over the SAME
    # partitioning the cumsum already pays one exchange for — same
    # ``sum(n)`` as the old separate totals aggregate, but the sketch
    # pipeline is never evaluated a second time (previously: a
    # crossJoin'd re-aggregate without ``by``, a null-safe-joined
    # groupBy with it — each re-running every upstream scan). Window
    # partitioning keeps NULL group values as their own group, so NULL
    # groups get their own totals exactly like the old null-safe join.
    cum = sketch.select(
        *keys,
        "bucket",
        F.sum("n").over(w).alias("_cum"),
        F.sum("n").over(Window.partitionBy(*keys)).alias("_total"),
    )
    return (
        cum.select(*keys, "bucket", "_cum", "_total", F.explode(qpairs).alias("_p"))
        .select(*keys, "bucket", "_cum", "_total", "_p._qi", "_p.q")
        .filter(F.col("_cum") >= F.ceil(F.col("q") * F.col("_total")))
        # groupBy keeps NULL group values as their own group, matching
        # the window partitioning of the per-q formulation
        .groupBy(*keys, "_qi", "q")
        .agg(F.min("bucket").alias("bucket"))
        .select(*keys, "q", value.alias("value"))
    )
