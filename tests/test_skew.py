"""Skew utilities: salted plans produce exactly the unsalted results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0 (the hot key), the rest spread over 100 keys
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    return df.cache()


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("name"), F.col("id")).alias("name")
    ).cache()


def test_salted_join_equals_plain_inner(skewed, dim):
    plain = skewed.join(dim, "k").select("k", "v", "name")
    salted = salted_join(skewed, dim, on="k", salt=8).select("k", "v", "name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_equals_plain_left(skewed, spark):
    partial_dim = spark.range(50).select(
        F.col("id").alias("k"), F.lit("d").alias("name")
    )
    plain = skewed.join(partial_dim, "k", "left").select("k", "v", "name")
    salted = salted_join(skewed, partial_dim, on="k", how="left", salt=8).select(
        "k", "v", "name"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_rejects_right(skewed, dim):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, on="k", how="right")


def test_salted_agg_equals_plain(skewed):
    plain = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in salted_agg(
            skewed,
            "k",
            {"s": "sum(v)", "n": "count(v)", "mn": "min(v)", "mx": "max(v)"},
            salt=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_nonsplittable(skewed):
    with pytest.raises(ValueError, match="Unsupported agg"):
        salted_agg(skewed, "k", {"a": "avg(v)"})


def test_salt_is_deterministic_and_spreads_hot_key(skewed):
    # Hash-derived salt: identical across repartitions (F.rand is not),
    # and the hot key's rows must land in every salt bucket.
    from astro_sdk_spark.functions.skew import _hash_salt

    a = skewed.withColumn("s", _hash_salt(["k", "v"], 8, 42))
    b = skewed.repartition(3).withColumn("s", _hash_salt(["k", "v"], 8, 42))
    pa = {(r.k, r.v): r.s for r in a.collect()}
    pb = {(r.k, r.v): r.s for r in b.collect()}
    assert pa == pb
    hot_buckets = {s for (k, _), s in pa.items() if k == 0}
    assert hot_buckets == set(range(8))


def test_skew_report_ranks_and_salt(spark):
    from astro_sdk_spark.functions.skew import skew_report

    rows = [(1, i) for i in range(50)] + [(2, i) for i in range(10)] + [(3, 0)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = skew_report(df, ["k"], top_k=2, target_rows_per_task=20).collect()
    assert [r.rank for r in out] == [1, 2]
    top = out[0]
    assert top.k == 1 and top.n == 50
    assert abs(top.frac - round(50 / 61, 6)) < 1e-9
    assert top.salt_suggest == 3  # ceil(50/20)
    assert out[1].k == 2 and out[1].salt_suggest == 1


def test_skew_report_tiebreak_deterministic(spark):
    from astro_sdk_spark.functions.skew import skew_report

    rows = [(5, 0), (4, 0), (3, 0)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = skew_report(df.repartition(4), ["k"], top_k=3).collect()
    # equal counts → key-value order
    assert [r.k for r in out] == [3, 4, 5]


def test_skew_report_validates(spark):
    import pytest as _pytest

    from astro_sdk_spark.functions.skew import skew_report

    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with _pytest.raises(ValueError, match="non-empty"):
        skew_report(df, [])
    with _pytest.raises(ValueError, match="positive"):
        skew_report(df, ["k"], top_k=0)
