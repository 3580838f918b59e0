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


@pytest.mark.parametrize("name", sorted(spark_queries()))
def test_query_is_not_vacuous(spark, name):
    fn = spark_queries()[name]
    try:
        got = fn(spark, SF).take(1)
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
