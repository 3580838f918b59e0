"""Continuous aggregate: incremental refresh equals full recompute."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.streaming.rollup import ContinuousAggregate, time_bucket


def _events(spark, start_min, end_min):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=m, seconds=13 * (i % 4)),
            "click" if i % 3 else "view",
            float(i % 7),
        )
        for i, m in enumerate(range(start_min, end_min))
        for _ in (0,)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def _as_set(df):
    return {
        (r.window_start, r.event_type, r.n, r.total_value) for r in df.collect()
    }


@pytest.fixture()
def clean(spark):
    yield
    spark.sql("DROP TABLE IF EXISTS ca_rollup")
    spark.sql("DROP TABLE IF EXISTS ca_rollup__refresh_staging")


def test_initial_refresh_builds_full_rollup(spark, clean):
    src = _events(spark, 0, 60)
    ca = ContinuousAggregate(spark, src, "ca_rollup", bucket="10 minutes")
    ca.refresh()
    expect = _as_set(
        src.groupBy(
            time_bucket("ts", "10 minutes").alias("window_start"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    assert _as_set(ca.read()) == expect


def test_incremental_refresh_equals_full_recompute(spark, clean):
    first = _events(spark, 0, 35)  # last bucket [30,40) is partial
    ca = ContinuousAggregate(spark, first, "ca_rollup", bucket="10 minutes")
    ca.refresh()

    # more data arrives: the partial bucket fills and new buckets appear
    full = _events(spark, 0, 60)
    ca2 = ContinuousAggregate(spark, full, "ca_rollup", bucket="10 minutes")
    ca2.refresh()

    expect = _as_set(
        full.groupBy(
            time_bucket("ts", "10 minutes").alias("window_start"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    assert _as_set(ca2.read()) == expect


def test_refresh_scans_only_horizon(spark, clean):
    first = _events(spark, 0, 35)
    ca = ContinuousAggregate(spark, first, "ca_rollup", bucket="10 minutes")
    ca.refresh()
    # the refresh filter keeps only rows at/after the last bucket start
    full = _events(spark, 0, 60)
    high = ca.read().agg(F.max("window_start")).collect()[0][0]
    assert high == datetime.datetime(2024, 1, 1, 0, 30)
    assert full.filter(F.col("ts") >= F.lit(high)).count() == 30 * 1  # minutes 30..59
