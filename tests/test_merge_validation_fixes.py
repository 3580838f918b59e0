"""Round-2 semantics fixes: merge source-duplicate handling, conflict-key
map validation, rename-swap update path; check_table single-row contract;
comparison robustness on dates/None; nan/inf literals.
"""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.operators.data_validation import (
    ChecksFailedError,
    _compare,
    build_check_table_sql,
    check_column,
    check_table,
)
from astro_sdk_spark.operators.merge import MergeConflictException, merge
from astro_sdk_spark.table import Table
from astro_sdk_spark.templating import render_literal


@pytest.fixture()
def eng(spark):
    return SparkEngine(spark)


def _mk(spark, eng, name, rows, schema):
    t = Table(name=name)
    eng.drop_table(t)
    spark.createDataFrame(rows, schema).write.saveAsTable(name)
    return t


def test_merge_exception_raises_on_intra_source_dups(spark, eng):
    tgt = _mk(spark, eng, "t_tgt1", [(1, "a")], "id long, v string")
    src = _mk(spark, eng, "t_src1", [(9, "x"), (9, "y")], "id long, v string")
    with pytest.raises(MergeConflictException, match="duplicate conflict keys"):
        merge(src, tgt, columns={"id": "id", "v": "v"},
              target_conflict_columns=["id"], if_conflicts="exception", engine=eng)
    for t in (tgt, src):
        eng.drop_table(t)


def test_merge_ignore_keeps_one_row_per_duplicate_source_key(spark, eng):
    tgt = _mk(spark, eng, "t_tgt2", [(1, "a")], "id long, v string")
    src = _mk(spark, eng, "t_src2", [(9, "y"), (9, "x"), (2, "b")], "id long, v string")
    merge(src, tgt, columns={"id": "id", "v": "v"},
          target_conflict_columns=["id"], if_conflicts="ignore", engine=eng)
    rows = {(r.id, r.v) for r in spark.table("t_tgt2").collect()}
    # deterministic survivor: min by remaining columns -> (9, "x")
    assert rows == {(1, "a"), (2, "b"), (9, "x")}
    for t in (tgt, src):
        eng.drop_table(t)


def test_merge_update_dedups_source_and_swaps_once(spark, eng):
    tgt = _mk(spark, eng, "t_tgt3", [(1, "a", 10.0), (2, "b", 20.0)],
              "id long, v string, w double")
    src = _mk(spark, eng, "t_src3", [(2, "zz"), (2, "aa"), (3, "c")], "id long, v string")
    merge(src, tgt, columns={"id": "id", "v": "v"},
          target_conflict_columns=["id"], if_conflicts="update", engine=eng)
    rows = {(r.id, r.v, r.w) for r in spark.table("t_tgt3").collect()}
    # id=2 updated from the deterministic survivor ("aa"); unmapped w kept
    assert rows == {(1, "a", 10.0), (2, "aa", 20.0), (3, "c", None)}
    for t in (tgt, src):
        eng.drop_table(t)


def test_merge_requires_conflict_cols_in_map(spark, eng):
    tgt = _mk(spark, eng, "t_tgt4", [(1, "a")], "id long, v string")
    src = _mk(spark, eng, "t_src4", [(2, "b")], "id long, v string")
    with pytest.raises(ValueError, match="missing from the column map"):
        merge(src, tgt, columns={"v": "v"},
              target_conflict_columns=["id"], if_conflicts="ignore", engine=eng)
    for t in (tgt, src):
        eng.drop_table(t)


def test_check_table_row_level_returns_single_row(spark, eng):
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") * 2).alias("dbl")
    )
    df.createOrReplaceTempView("ct_rows")
    sql = build_check_table_sql(
        spark, "ct_rows", {"dbl_ok": {"check_statement": "dbl = id * 2"}}
    )
    assert "bool_and" in sql
    out = spark.sql(sql)
    assert out.count() == 1  # one row regardless of table size
    results = check_table(df, {"dbl_ok": {"check_statement": "dbl = id * 2"}}, engine=eng)
    assert results[0].passed


def test_check_table_mixes_aggregate_and_row_level(spark, eng):
    df = spark.range(100)
    results = check_table(
        df,
        {
            "count_ok": {"check_statement": "COUNT(*) = 100"},
            "ids_nonneg": {"check_statement": "id >= 0"},
        },
        engine=eng,
    )
    assert all(r.passed for r in results)
    with pytest.raises(ChecksFailedError):
        check_table(df, {"count_bad": {"check_statement": "COUNT(*) = 5"}}, engine=eng)


def test_check_table_rejects_invalid_check_name(spark, eng):
    with pytest.raises(ValueError, match="valid identifier"):
        check_table(
            spark.range(5),
            {"bad name; drop": {"check_statement": "COUNT(*) > 0"}},
            engine=eng,
        )


def test_check_column_min_max_on_dates_and_strings(spark, eng):
    df = spark.createDataFrame(
        [(datetime.date(2020, 1, 1), "aa"), (datetime.date(2021, 6, 1), "zz")],
        "d date, s string",
    )
    results = check_column(
        df,
        {
            "d": {"min": {"geq_to": datetime.date(2019, 1, 1)}},
            "s": {"max": {"leq_to": "zz"}},
        },
        engine=eng,
    )
    assert all(r.passed for r in results)


def test_check_column_none_observed_fails_not_crashes(spark, eng):
    empty = spark.createDataFrame([], "x int")
    with pytest.raises(ChecksFailedError, match="None"):
        check_column(empty, {"x": {"min": {"geq_to": 0}}}, engine=eng)


def test_compare_tolerance_still_numeric():
    ok, _ = _compare(105.0, {"equal_to": 100, "tolerance": 0.1})
    assert ok
    ok, _ = _compare(120.0, {"equal_to": 100, "tolerance": 0.1})
    assert not ok


def test_render_literal_nonfinite_floats():
    assert render_literal(float("nan")) == "CAST('NaN' AS DOUBLE)"
    assert render_literal(float("inf")) == "CAST('Infinity' AS DOUBLE)"
    assert render_literal(float("-inf")) == "CAST('-Infinity' AS DOUBLE)"
    assert render_literal(1.5) == "1.5"
    assert not math.isnan(float(render_literal(2.0)))


# ---------------------------------------------------------------------------
# Static aggregate detection (round 9): build_check_table_sql must classify
# ordinary aggregate and row-level statements WITHOUT an analyzer probe —
# the probe's NESTED_AGGREGATE_FUNCTION failure makes Spark's
# SQLQueryContextLogger dump an ERROR-level stack trace into clean runs.


def test_classify_check_statement_static_cases():
    from astro_sdk_spark.operators.data_validation import classify_check_statement

    # aggregates — use as-is
    assert classify_check_statement("COUNT(*) = 1000") is True
    assert classify_check_statement("sum(x) / count(*) > 0.5") is True
    assert classify_check_statement("min(ts) >= date '2020-01-01'") is True
    # row-level — wrap in bool_and (incl. scalar function calls)
    assert classify_check_statement("a + b < c") is False
    assert classify_check_statement("length(trim(name)) BETWEEN 1 AND 80") is False
    assert classify_check_statement("coalesce(v, 0) >= 0") is False
    # undecidable — subquery, window, unknown function -> probe
    assert classify_check_statement("(SELECT count(*) FROM t) = 5") is None
    assert classify_check_statement("rank() OVER (ORDER BY x) = 1") is None
    assert classify_check_statement("my_udaf(x) > 0") is None
    # literals/comments must not confuse the token scan
    assert classify_check_statement("note <> 'count(*) select over'") is False
    assert classify_check_statement("x > 0 -- select count(*)") is False


def test_build_check_table_sql_no_probe_for_static_statements():
    class ProbeForbidden:
        def sql(self, *_a, **_k):
            raise AssertionError("analyzer probe ran for a static statement")

    sql = build_check_table_sql(
        ProbeForbidden(),
        "t",
        {
            "row_count": {"check_statement": "COUNT(*) = 10"},
            "vals_ok": {"check_statement": "v >= id"},
            "name_len": {"check_statement": "length(name) < 80"},
        },
    )
    assert "((COUNT(*) = 10)) AS row_count" in sql
    assert "coalesce(bool_and((v >= id)), true) AS vals_ok" in sql
    assert "coalesce(bool_and((length(name) < 80)), true) AS name_len" in sql


def test_build_check_table_sql_probe_fallback_still_works(spark):
    spark.range(5).selectExpr("id", "id * 2 AS v").createOrReplaceTempView(
        "ct_probe_t"
    )
    # scalar subquery: not statically classifiable; the probe must decide
    # (the wrapped form analyzes fine -> treated as row-level)
    sql = build_check_table_sql(
        spark,
        "ct_probe_t",
        {"sub_ok": {"check_statement": "(SELECT 5) = 5"}},
    )
    assert "bool_and" in sql
    assert spark.sql(sql).collect()[0]["sub_ok"] is True


def test_classify_check_statement_review_edge_cases():
    """Round-9 review regressions: literals/comments in every SQL form
    must not flip classification, and keyword-parens must not force the
    probe."""
    from astro_sdk_spark.operators.data_validation import classify_check_statement

    assert classify_check_statement("x > 0 /* use avg() to summarize */") is False
    assert classify_check_statement('note <> "count(x)"') is False
    assert classify_check_statement("a > 0 AND (b < 5)") is False
    assert classify_check_statement("x IN (1, 2, 3)") is False
    assert classify_check_statement("CASE WHEN (x > 0) THEN true ELSE false END") is False
