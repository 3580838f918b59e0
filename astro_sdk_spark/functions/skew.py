"""Skew mitigation utilities: salted joins and two-phase aggregation.

No reference counterpart (the warehouse owned physical execution there).
At 100 TB a handful of hot keys (the null key, a default id, a celebrity
user) can pin a whole shuffle on one task. AQE's skew-join split
(``spark.sql.adaptive.skewJoin.enabled``, on by default in session.py)
handles sort-merge joins automatically; these helpers cover the cases AQE
cannot: broadcast-ineligible dimension joins with hot probe keys, and
hot-key aggregations with non-splittable single-key partitions.

Both are pure plan rewrites — results are exactly equal to the unsalted
plan (tests assert it), only the shuffle key changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_salt(columns: list[str], salt: int, seed: int) -> Column:
    """Deterministic salt in [0, salt): xxhash64 over every row column.

    Unlike ``F.rand`` (partition-order-dependent), this survives task
    retries and repartitions unchanged, matching the repo-wide
    no-nondeterminism rule.
    """
    h = F.xxhash64(F.lit(seed), *[F.col(c) for c in columns])
    return F.pmod(h, F.lit(salt)).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``large`` has skewed join keys.

    The large side gets a uniform random salt in [0, salt); the small side
    is replicated ``salt`` times (explode of a sequence — small side only,
    so the blow-up is |small|·salt rows). The join key becomes (key, salt),
    splitting each hot key across ``salt`` reducers. Row-level results are
    identical to ``large.join(small, on, how)`` for inner/left joins
    (the salt column is internal and dropped).

    The salt is derived by hashing every column of ``large`` (not
    ``F.rand``, whose values depend on partition order): the plan is fully
    deterministic across retries and repartitions. Hot keys still spread
    because their non-key columns vary; only byte-identical duplicate rows
    share a salt bucket.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(right/full would need the salt on the other side)"
        )
    salted_large = large.withColumn(
        "_salt", _hash_salt(large.columns, salt, seed)
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = salted_large.join(salted_small, on=[*keys, "_salt"], how=how)
    return joined.drop("_salt")


_SPLITTABLE = {"sum", "count", "min", "max"}


def salted_agg(
    df: DataFrame,
    group_cols: list[str] | str,
    aggs: dict[str, str],
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial aggregate on
    (group, salt), then final combine on group.

    ``aggs`` maps output column name → "fn(col)" with fn in
    sum/count/min/max (the decomposable set; avg = sum/count composed by
    the caller). Spark's hash aggregate already does map-side partial
    aggregation — this helper matters when per-key *reduce* state is the
    bottleneck (e.g. count-distinct-style downstream ops) or when a single
    key exceeds one reducer's capacity.
    """
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    partial_aggs, final_aggs = [], []
    for out_name, spec in aggs.items():
        fn, _, col = spec.partition("(")
        fn = fn.strip().lower()
        col = col.rstrip(")").strip()
        if fn not in _SPLITTABLE:
            raise ValueError(f"Unsupported agg {fn!r}; use one of {sorted(_SPLITTABLE)}")
        partial_aggs.append(getattr(F, fn)(col).alias(f"_p_{out_name}"))
        combine = "sum" if fn in ("sum", "count") else fn
        final_aggs.append(getattr(F, combine)(f"_p_{out_name}").alias(out_name))
    salted = df.withColumn("_salt", _hash_salt(df.columns, salt, seed))
    partial = salted.groupBy(*gcols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*gcols).agg(*final_aggs)


def skew_report(
    df: DataFrame,
    keys: list[str],
    top_k: int = 10,
    target_rows_per_task: int = 5_000_000,
) -> DataFrame:
    """Key-distribution diagnostic: the ``top_k`` hottest join/group keys
    with their row counts, corpus fraction, and a per-key salt suggestion
    (``ceil(n / target_rows_per_task)`` — the fan-out salted_join/
    salted_agg would need to split that key's partition down to the
    target). Run this BEFORE committing a join strategy: a top-1
    fraction in the tens of percent means AQE's skew split will carry
    the stage, and anything hotter wants an explicit salt or a broadcast
    rethink.

    Returns ``rank, <keys...>, n, frac, salt_suggest``.

    Scale shape: one partial-aggregatable groupBy(keys).count() — the
    count collapses map-side, so the shuffle moves one row per distinct
    key — then a distributed TakeOrdered (orderBy+limit: per-partition
    top-k, driver merge of k-row heads — NOT a single-partition window
    over the full count table, which billions of distinct keys would
    serialize) with a count-desc, key-value-tiebreak sort; ranking runs
    over only the k survivors. One one-row broadcast carries the total.
    Safe on any cardinality: the report is bounded by top_k."""
    if not keys:
        raise ValueError("keys must be non-empty")
    if top_k <= 0 or target_rows_per_task <= 0:
        raise ValueError("top_k and target_rows_per_task must be positive")

    from pyspark.sql.window import Window

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    order = [F.col("n").desc(), *[F.col(k) for k in keys]]
    topk = counts.orderBy(*order).limit(top_k)
    ranked = (
        topk.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .crossJoin(F.broadcast(total))
    )
    # floor-pin the fraction (engine-agnostic rounding; see gapfill._pin)
    frac = F.floor(
        F.col("n") / F.col("_total").cast("double") * F.lit(1000000.0)
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    return ranked.select(
        "rank",
        *keys,
        "n",
        frac.alias("frac"),
        F.ceil(F.col("n") / F.lit(float(target_rows_per_task)))
        .cast("bigint")
        .alias("salt_suggest"),
    )
