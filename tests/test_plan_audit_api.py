"""Public plan-audit API: audit_plan metrics and assert_scale_shape guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.plan_audit import assert_scale_shape, audit_plan


def test_audit_counts_shuffle_and_join(spark):
    a = spark.range(1000).withColumn("k", F.col("id") % 10)
    b = spark.range(10).withColumnRenamed("id", "k")
    joined = a.join(b, "k").groupBy("k").count()
    m = audit_plan(joined)
    assert m["exch"] >= 1          # the groupBy shuffle
    assert m["bhj"] + m["smj"] >= 1
    assert m["py"] == 0 and m["cartesian"] == 0


def test_audit_detects_python_boundary(spark):
    import pandas as pd

    df = spark.range(100)
    out = df.mapInPandas(lambda it: it, "id long")
    m = audit_plan(out)
    assert m["py"] == 1


def test_assert_scale_shape_passes_and_fails(spark):
    df = spark.range(1000).withColumn("k", F.col("id") % 10)
    agg = df.groupBy("k").count()
    m = assert_scale_shape(agg, max_exchanges=1)
    assert m["exch"] == 1
    crossed = spark.range(50).crossJoin(spark.range(50))
    with pytest.raises(AssertionError, match="cartesian"):
        assert_scale_shape(crossed)


def test_assert_pushdown(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(1000).withColumn("v", F.col("id") * 2).write.parquet(p)
    filtered = spark.read.parquet(p).filter(F.col("id") > 500)
    m = assert_scale_shape(filtered, require_pushdown=True)
    assert m["pushed"] and m["scans"] == 1
