"""Registry-wide non-vacuity gate: every queries() entry must return at
least one row, or its oracle comparison proves nothing (an empty Spark
result hash-matches an empty DuckDB result trivially — q_tpch_q10 sat
green-but-vacuous for three rounds on a date window outside the synthetic
orders range). Intentional empties go on the explicit allowlists in
astro_sdk_spark.queries (VACUOUS_OK; VACUOUS_OK_SMALL_SF for selective
queries that only populate from sf0.01 up)."""

from __future__ import annotations

import pytest

from astro_sdk_spark.functions._cache import (
    release_intermediates,
    sweep_persistent_rdds,
)
from astro_sdk_spark.queries import (
    VACUOUS_OK,
    VACUOUS_OK_SMALL_SF,
    spark_queries,
)

SF = "/root/testdata/sf0.001"
ALLOWED_EMPTY = VACUOUS_OK | VACUOUS_OK_SMALL_SF

# nodes that sit above a top-level Sort without reordering rows
_ORDER_PRESERVING = {"Project", "GlobalLimit", "LocalLimit"}


def _toplevel_sort(df):
    """The outermost global Sort node of the analyzed plan, or None when
    the query has no top-level ORDER BY (the driver's row-sorted hash
    makes order irrelevant for those)."""
    node = df._jdf.queryExecution().analyzed()
    while True:
        cls = node.getClass().getSimpleName()
        if cls == "Sort":
            return node if getattr(node, "global")() else None
        if cls in _ORDER_PRESERVING and node.children().size() == 1:
            node = node.children().apply(0)
            continue
        return None


def _check_sort_keys_unique(spark, name, df) -> None:
    """q18-class hash audit, mechanical (round-12 VERDICT #1): a query
    that emits a top-level ORDER BY must make that order TOTAL — the full
    sort-key tuple unique — or any order-sensitive downstream consumer
    (a driver that hashes in result order, a LIMIT boundary picking
    among tied rows) becomes nondeterministic between engines. Every
    such query here terminates its ORDER BY in a unique-key column; this
    proves it with data instead of code review. Uniqueness is evaluated
    on the Sort node's OWN input (pre-LIMIT, pre-projection, via
    Dataset.ofRows), so top-k boundary ties are caught too."""
    import pyspark.sql.functions as F
    from pyspark.sql import DataFrame as SparkDF

    sort = _toplevel_sort(df)
    if sort is None:
        return
    order = sort.order()
    keys = [order.apply(i).child().sql() for i in range(order.size())]
    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, sort
    )
    sorted_input = SparkDF(jdf, spark)
    try:
        proj = sorted_input.select(
            [F.expr(k).alias(f"_k{i}") for i, k in enumerate(keys)]
        )
        n = proj.count()
        d = proj.distinct().count()
    except Exception as e:  # noqa: BLE001
        pytest.fail(
            f"{name}: top-level sort keys {keys} could not be audited "
            f"for uniqueness ({e}) — keep ORDER BY keys plain columns"
        )
    assert d == n, (
        f"{name}: ORDER BY {keys} leaves {n - d} tied rows at sf0.001 — "
        f"terminate the sort in a unique-key column (q18-class hash "
        f"hazard: tied rows emit in nondeterministic order)"
    )


@pytest.mark.parametrize("name", sorted(spark_queries()))
def test_query_is_not_vacuous(spark, name):
    fn = spark_queries()[name]
    try:
        df = fn(spark, SF)
        got = df.take(1)
        _check_sort_keys_unique(spark, name, df)
    finally:
        spark.catalog.clearCache()
        release_intermediates()
        sweep_persistent_rdds(spark)
    if name in ALLOWED_EMPTY:
        pytest.skip(f"{name} is allowlisted as intentionally empty at sf0.001")
    assert got, (
        f"{name} returned 0 rows at sf0.001 — a vacuous oracle pass; either "
        f"fix the query's predicates or allowlist it in queries.VACUOUS_OK*"
    )


def test_allowlist_entries_are_registered():
    """A stale allowlist silently re-opens the vacuity hole for typos."""
    unknown = ALLOWED_EMPTY - set(spark_queries())
    assert not unknown, f"allowlisted names not in the registry: {unknown}"
