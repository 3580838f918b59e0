"""edit_distance_join — exactness vs the brute-force cross join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.fuzzy import edit_distance_join


def _brute_self(df, d):
    a = df.select(F.col("id").alias("ia"), F.col("name").alias("na"))
    b = df.select(F.col("id").alias("ib"), F.col("name").alias("nb"))
    return {
        (r.ia, r.ib)
        for r in a.crossJoin(b)
        .filter((F.col("ia") < F.col("ib")) & (F.levenshtein("na", "nb") <= d))
        .collect()
    }


@pytest.fixture(scope="module")
def cust(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") <= 120)
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
        .cache()
    )


@pytest.mark.parametrize("d", [1, 2])
def test_self_join_matches_brute_force(cust, d):
    got = {(r.id_a, r.id_b) for r in edit_distance_join(cust, max_dist=d).collect()}
    assert got == _brute_self(cust, d) and got


def test_adversarial_shapes(spark):
    """Repeated grams, strings at/below the gram floor, empties."""
    rows = [
        (1, "aaaa"), (2, "aaab"), (3, "aaa"), (4, "a"), (5, ""),
        (6, "b"), (7, "ab"), (8, "xyz"), (9, "xzy"), (10, "aaaa"),
        (11, "zzzzzz"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.id_a, r.id_b) for r in edit_distance_join(df, max_dist=1).collect()}
    assert got == _brute_self(df, 1)


def test_two_sided_join(spark):
    a = spark.createDataFrame(
        [(1, "spark"), (2, "shark"), (3, "plonk")], "id long, name string"
    )
    b = spark.createDataFrame(
        [(10, "spork"), (11, "stark"), (12, "plank")], "id long, name string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(a, b, max_dist=1).collect()
    }
    assert got == {(1, 10, 1), (1, 11, 1), (2, 11, 1), (3, 12, 1)}


def test_null_text_never_matches(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "abd")], "id long, name string"
    )
    got = {(r.id_a, r.id_b) for r in edit_distance_join(df, max_dist=1).collect()}
    assert got == {(1, 3)}


def test_dist_column_and_validation(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id long, name string")
    rows = edit_distance_join(df, max_dist=1).collect()
    assert rows[0].dist == 1
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join(df, max_dist=0)
    with pytest.raises(ValueError, match="q must"):
        edit_distance_join(df, q=1)


def test_no_cross_product_above_the_floor(spark, cust):
    """The physical plan's only cartesian node is the empty short-string
    sliver — the main path must be the prefix equi-join."""
    plan = edit_distance_join(cust, max_dist=1)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("CartesianProduct") <= 1