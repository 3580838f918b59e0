"""Null imputation — fill strategies for load cleaning and feature prep.

Sensor dropouts, optional form fields, and outer-join fan-out all leave
NULL holes that poison downstream aggregates and model features. This is
the standard repair step (scikit-learn's SimpleImputer semantics,
re-expressed as Spark plans): fill with a constant, or with the
mean/median/mode computed over the whole frame or per group.

Scale shape: fill values come from ONE partial-aggregatable aggregate —
a one-row broadcast for global fills, a per-group aggregate joined back
on the group key for grouped fills (the same exchange the caller's next
group-by would use; AQE broadcasts the group table when small). The fill
itself is a codegen `coalesce` projection. No windows over raw rows, no
Python.

Determinism: ``mean`` supports the repo's ``value_scale`` fixed-point
device (exact integer sums — see gapfill/rolling_stats); ``median`` is
the exact linear-interpolation percentile (the q_percentiles
cross-engine equivalence); ``mode`` breaks count ties on the lowest
value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STRATEGIES = ("mean", "median", "mode", "constant")


def _fill_expr(col: str, strategy: str, value_scale: int | None):
    if strategy == "mean":
        if value_scale is not None:
            cv = F.round(F.col(col) * value_scale).cast("bigint")
            return F.sum(cv).cast("double") / (
                F.count(cv) * F.lit(value_scale)
            )
        return F.avg(col)
    return F.percentile(F.col(col), F.lit(0.5))  # median


def impute_nulls(
    df: DataFrame,
    cols: list[str],
    strategy: str = "mean",
    group_by: str | None = None,
    fill_value=None,
    value_scale: int | None = None,
) -> DataFrame:
    """Replace NULLs in ``cols``. ``strategy``: ``mean`` / ``median`` /
    ``mode`` / ``constant`` (with ``fill_value``). ``group_by`` computes
    the fill per group (rows whose whole group is NULL stay NULL — there
    is nothing to learn the fill from). An ``_imputed_<col>`` flag marks
    repaired rows so downstream quality checks can count them."""
    if strategy not in _STRATEGIES:
        raise ValueError(f"strategy must be one of {_STRATEGIES}, got {strategy!r}")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    if strategy == "constant":
        if fill_value is None:
            raise ValueError("strategy='constant' requires fill_value")
        out = df
        for c in cols:
            out = out.withColumn(f"_imputed_{c}", F.col(c).isNull()).withColumn(
                c, F.coalesce(F.col(c), F.lit(fill_value))
            )
        return out

    if strategy == "mode":
        # mode needs per-value counts: one aggregate per column over
        # (group, value) — still partial-aggregatable
        out = df
        for c in cols:
            keys = [group_by] if group_by else []
            counts = (
                df.filter(F.col(c).isNotNull())
                .groupBy(*keys, F.col(c).alias("_v"))
                .agg(F.count(F.lit(1)).alias("_n"))
            )
            # highest count wins, count-ties -> lowest value; two partial
            # aggregates + a join keeps it type-agnostic (a negate-based
            # max_by tiebreak would break on string columns)
            maxn = counts.groupBy(*keys).agg(F.max("_n").alias("_m"))
            best = (
                counts.join(maxn, on=keys)
                if keys
                else counts.crossJoin(F.broadcast(maxn))
            )
            best = (
                best.filter(F.col("_n") == F.col("_m"))
                .groupBy(*keys)
                .agg(F.min("_v").alias(f"_fill_{c}"))
            )
            # LEFT join: rows with NULL group keys and groups whose best
            # table has no row (all-NULL columns) must SURVIVE with the
            # value unfilled — an inner join would delete data. The
            # per-group table is unhinted so AQE picks broadcast vs
            # shuffle by its real size (group cardinality is unbounded).
            joined = (
                out.join(best, on=keys, how="left") if keys
                else out.crossJoin(F.broadcast(best))
            )
            out = joined.withColumn(
                f"_imputed_{c}", F.col(c).isNull() & F.col(f"_fill_{c}").isNotNull()
            ).withColumn(
                c, F.coalesce(F.col(c), F.col(f"_fill_{c}"))
            ).drop(f"_fill_{c}")
        return out

    aggs = [
        _fill_expr(c, strategy, value_scale).alias(f"_fill_{c}") for c in cols
    ]
    if group_by:
        # LEFT join (NULL-keyed rows survive unfilled); unhinted — AQE
        # broadcasts the per-group fill table only when it is small
        fills = df.groupBy(group_by).agg(*aggs)
        out = df.join(fills, on=group_by, how="left")
    else:
        fills = df.agg(*aggs)
        out = df.crossJoin(F.broadcast(fills))
    for c in cols:
        out = out.withColumn(
            f"_imputed_{c}", F.col(c).isNull() & F.col(f"_fill_{c}").isNotNull()
        ).withColumn(c, F.coalesce(F.col(c), F.col(f"_fill_{c}"))).drop(
            f"_fill_{c}"
        )
    return out
