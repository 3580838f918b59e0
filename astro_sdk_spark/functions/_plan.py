"""Plan-shape helpers shared by the similarity/dedup operators.

``nd_guard`` exists for one measured reason: Catalyst pushes any
deterministic filter that references both sides of a join INTO the join
as a join condition, where the expression tree evaluates in interpreted
mode per matched row — for the array/HOF/levenshtein verify expressions
these operators filter on, that is a 10–100× cliff at volume
(jaccard_join's verify measured 1.9 s as a whole-stage-codegen project
vs minutes as a sort-merge-join condition on the same 3.74 M pairs).
Routing the expensive expression through a projection with a
nondeterministic no-op keeps every downstream filter ABOVE that
projection (Catalyst only pushes filters past projects whose fields are
all deterministic), so the expression runs once, codegen'd.

The guard must be ``monotonically_increasing_id() >= 0`` specifically:

- rand()-based always-true comparisons (``rand() >= -1``) get
  range-FOLDED away by the optimizer (measured on Spark 4);
- an unused nondeterministic column gets column-PRUNED, which
  re-enables the pushdown silently (also measured).

``monotonically_increasing_id()`` is non-negative by construction, so
the WHEN never takes its null branch and results are byte-identical.
If a future Spark learns to fold this too, correctness is unaffected —
only the plan shape regresses (re-check with ``explain("formatted")``:
no expensive expression should appear on a ``Join condition:`` line).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["nd_guard", "spread_small_scan"]

# spread_small_scan fires only when the WHOLE projected input is at most
# this many bytes per available core (Catalyst estimate): small enough
# that the spreading shuffle is trivial, while the per-row work it
# unlocks parallelism for (md5/regex/Arrow batches) dominates.
_SPREAD_BYTES_PER_CORE = 4 << 20

# Width of the spread: one partition per this many estimated input bytes
# (floored at _SPREAD_MIN_PARTS, capped at defaultParallelism). The r13
# form used defaultParallelism unconditionally, which over-shuffles tiny
# inputs on wide sessions: the 8-core scaling run had the doc-corpus
# spread consumers FASTER at 8 cores than 32 (q_doc_line_dedup 0.34,
# q_line_dedup/q_substring_dedup 0.61), and a width-curve measurement on
# this box (min-of-3, steal-checked) put the doc tokenize/regex class at
# 0.18 s at width 8 vs 0.78 s at width 32 — a sub-MB doc input split 32
# ways pays 32 task commits and a 32-wide exchange the per-row work
# never repays. The EXCEPTION is the per_row_heavy class (cms md5×depth
# over narrow rows): the same curve ran 0.63 s at width 32 vs 1.34 s at
# width 4, monotonically better with width — row count, not byte size,
# is what its cost tracks, so it keeps the full-width spread.
_SPREAD_TARGET_BYTES = 1 << 20
_SPREAD_MIN_PARTS = 4


def spread_small_scan(
    df: DataFrame,
    cols: list[str] | None = None,
    per_row_heavy: bool = False,
) -> DataFrame:
    """Round-robin a SMALL input across the cluster before per-row-heavy
    expressions (sketch hashing, regex cleaning, Arrow-batched scoring).

    Parquet scan parallelism is bounded by ROW GROUPS, not byte splits: a
    table written as one row group yields exactly one non-empty scan
    task, so every expression fused into the scan stage runs on one core
    no matter the cluster size. For heavy per-row operators that carry no
    downstream key to piggyback on (unlike dedup's ``_spread_by_id``,
    whose repartition doubles as the groupBy(id) exchange), the honest
    fix is an explicit spread — but ONLY when the input is provably small
    (``optimizedPlan().stats().sizeInBytes()``, driver-side analysis): at
    real scale the estimate exceeds the threshold and the plan is
    byte-identical to the unspread one, so no full-input shuffle is ever
    added where the data itself provides parallelism. The same
    estimate-gated adaptivity as fuzzy's ``_volume_partitions`` — and the
    spread width is ``defaultParallelism``, so a session on fewer cores
    spreads proportionally less.

    ``cols``: project first (guide §2.3 — shuffle only the columns the
    heavy expression needs). ``per_row_heavy``: the caller's per-row cost
    is high relative to row WIDTH (md5/hash chains over narrow rows) —
    spread to the full core count; the default sizes the width from the
    byte estimate (see the width-curve note above). Row-level results are
    unchanged: round-robin placement only changes which task computes a
    row, and every caller aggregates or re-sorts downstream.
    """
    if cols is not None:
        df = df.select(*cols)
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 - non-classic DF; leave untouched
        return df
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism or 1
    if 0 < est <= cores * _SPREAD_BYTES_PER_CORE:
        if per_row_heavy:
            return df.repartition(cores)
        width = min(cores, max(_SPREAD_MIN_PARTS, est // _SPREAD_TARGET_BYTES))
        return df.repartition(int(width))
    return df


def nd_guard(col: Column) -> Column:
    """Wrap an expensive verify expression so filters on it cannot be
    pushed into a join condition (see module docstring)."""
    return F.when(F.monotonically_increasing_id() >= F.lit(0), col)
