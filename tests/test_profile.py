"""profile_table — one-pass column profiling (operators/data_validation)."""

from __future__ import annotations

import pytest

from astro_sdk_spark.operators.data_validation import profile_table


def _by_col(df):
    return {r["column"]: r for r in df.collect()}


def test_profile_basic_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (4, "b", 0.5)],
        "id long, s string, x double",
    )
    got = _by_col(profile_table(df, spark=spark))
    assert got["id"].n_rows == 4 and got["id"].n_nulls == 0
    assert got["id"].n_distinct == 4
    assert (got["id"].min_value, got["id"].max_value) == ("1", "4")
    assert got["s"].n_nulls == 1 and got["s"].n_distinct == 2
    assert (got["s"].min_value, got["s"].max_value) == ("a", "b")
    assert got["x"].n_nulls == 1 and got["x"].min_value == "0.5"


def test_profile_map_column_has_no_ordering(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"b": 2})], "id long, m map<string,int>"
    )
    got = _by_col(profile_table(df, spark=spark))
    assert got["m"].n_rows == 2 and got["m"].n_nulls == 0
    assert got["m"].n_distinct is None
    assert got["m"].min_value is None and got["m"].max_value is None


def test_profile_approx_distinct_close(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = _by_col(profile_table(docs, columns=["lang"], spark=spark))
    approx = _by_col(
        profile_table(docs, columns=["lang"], exact_distinct=False, spark=spark)
    )
    assert exact["lang"].n_distinct == 5
    assert abs(approx["lang"].n_distinct - 5) <= 1


def test_profile_column_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    got = _by_col(profile_table(df, columns=["s"], spark=spark))
    assert set(got) == {"s"}
    with pytest.raises(ValueError, match="no such columns"):
        profile_table(df, columns=["nope"], spark=spark)


def test_profile_table_input(spark, engine, sf_dir):
    from astro_sdk_spark.operators.load_file import load_file
    from astro_sdk_spark.files import File
    from astro_sdk_spark.table import Table

    tbl = Table(name="profile_src_t")
    load_file(File(f"{sf_dir}/region.parquet"), tbl, engine=engine, if_exists="replace")
    got = _by_col(profile_table(tbl, engine=engine))
    assert got["r_regionkey"].n_rows == 5 and got["r_regionkey"].n_distinct == 5
    spark.sql("DROP TABLE IF EXISTS profile_src_t")
