"""table_diff — keyed snapshot comparison (CDC between two table versions).

The reference ships data validation (check_column/check_table,
``python-sdk/src/astro/sql/operators`` — SURVEY §2.1 #12-13) but no way to
answer "what CHANGED between yesterday's load and today's?" — the question
every incremental pipeline audit starts with. ``table_diff`` classifies
every key as added / removed / changed / unchanged and names the columns
that moved, the same contract as change-data-capture snapshot diffing
(Delta's CDF, DBT snapshots) expressed as one join.

Scale shape: ONE shuffle — a single null-safe FULL OUTER JOIN on the key
columns; classification and the changed-column list are pure codegen
projections over the join output (no second pass, no window, no UDF).
``include_unchanged=False`` (default) filters the bulk of the output
before it is ever materialized — at 100 TB the diff of two daily
snapshots is tiny relative to the tables, and the filter sits directly on
the join so nothing unchanged survives the stage. ``diff_summary`` adds a
partial-aggregatable count per change type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns ``keys + diff + changed_cols`` where ``diff`` is one of
    ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (present in both, at least one compared column differs,
    null-safe), ``unchanged``; ``changed_cols`` is the comma-joined list
    of differing columns in ``compare_cols`` order ('' otherwise).

    ``compare_cols`` defaults to the non-key columns present in BOTH
    frames (column pruning keeps the scan to exactly keys+compared)."""
    if not keys:
        raise ValueError("keys must be non-empty")
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in keys and c in set(new.columns)
        ]
    for k in keys + compare_cols:
        if k not in old.columns or k not in new.columns:
            raise ValueError(f"column {k!r} must exist in both snapshots")

    # presence markers survive NULL key values (null-safe join below)
    o = old.select(*keys, *compare_cols, F.lit(1).alias("_om")).alias("o")
    n = new.select(*keys, *compare_cols, F.lit(1).alias("_nm")).alias("n")
    cond = None
    for k in keys:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")

    o_present = F.col("o._om").isNotNull()
    n_present = F.col("n._nm").isNotNull()
    col_differs = {
        c: ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols
    }
    any_diff = F.lit(False)
    for d in col_differs.values():
        any_diff = any_diff | d
    diff = (
        F.when(~o_present, F.lit("added"))
        .when(~n_present, F.lit("removed"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    changed_cols = F.when(
        o_present & n_present,
        F.concat_ws(
            ",",
            *[
                F.when(d, F.lit(c)) for c, d in col_differs.items()
            ],
        ),
    ).otherwise(F.lit(""))

    out = j.select(
        *[
            F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k)
            for k in keys
        ],
        diff.alias("diff"),
        changed_cols.alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("diff") != "unchanged")
    return out


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Counts per change type (added/removed/changed/unchanged) — one
    join + one partial-aggregatable groupBy on a 4-value key."""
    d = table_diff(old, new, keys, compare_cols, include_unchanged=True)
    return d.groupBy("diff").agg(F.count("*").alias("n"))
