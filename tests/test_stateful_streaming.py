"""applyInPandasWithState custom stateful operator, run for real.

``stateful_user_stats`` emits one final row per user once the user has
been idle past ``idle_gap`` in event time. The test streams the events
directory with availableNow, appends a far-future sentinel file so a later
micro-batch advances the watermark past every real user's timeout, and
asserts the emitted rows equal the batch groupBy. The sentinel user's own
state never times out, so it stays in the state store and is absent from
the append output — no output-side filtering needed beyond the check.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.queries import T
from astro_sdk_spark.streaming.ops import (
    read_events_stream,
    stateful_user_stats,
    stream_to_table,
)

SENTINEL_USER = -1
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events_df(spark):
    ev = (
        T(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value", "props")
    )
    return ev.cache()


@pytest.fixture(scope="module")
def staged_events_dir(spark, events_df, tmp_path_factory):
    """Events in one file, sentinel in a second (later-mtime) file so the
    file source processes it in a later micro-batch and the watermark jump
    fires every real user's event-time timeout."""
    d = str(tmp_path_factory.mktemp("stateful_events"))
    events_df.coalesce(1).write.mode("overwrite").parquet(d)
    max_ts = events_df.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(10**9, max_ts + datetime.timedelta(days=10), SENTINEL_USER,
          "sentinel", 0.0, "{}")],
        SCHEMA,
    )
    sentinel.coalesce(1).write.mode("append").parquet(d)
    return d


def test_stateful_user_stats_stream_equals_batch(
    spark, events_df, staged_events_dir, tmp_path
):
    stream = read_events_stream(
        spark, staged_events_dir, schema=SCHEMA, max_files_per_trigger=1
    )
    assert stream.isStreaming
    stats = stateful_user_stats(
        stream, idle_gap="10 minutes", watermark="30 minutes"
    )
    spark.sql("DROP TABLE IF EXISTS stateful_user_out")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/stateful_user_out", ignore_errors=True)
    q = stream_to_table(
        stats, "stateful_user_out", str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(180)
    got = spark.table("stateful_user_out")

    batch = stateful_user_stats(events_df)  # static path: plain groupBy
    expect = {
        (r.user_id, r.n_events, round(r.total_value, 4), r.first_ts, r.last_ts)
        for r in batch.collect()
    }
    actual = {
        (r.user_id, r.n_events, round(r.total_value, 4), r.first_ts, r.last_ts)
        for r in got.collect()
    }
    assert SENTINEL_USER not in {u for (u, *_) in actual}
    assert actual == expect
    spark.sql("DROP TABLE IF EXISTS stateful_user_out")


def test_stateful_user_stats_batch_mode(events_df):
    out = stateful_user_stats(events_df)
    row = out.filter(F.col("user_id") == 0).collect()
    direct = (
        events_df.filter(F.col("user_id") == 0)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()[0]
    )
    assert row[0].n_events == direct.n
    assert abs(row[0].total_value - direct.tv) < 1e-6


def test_stateful_anomalies_stream_equals_batch(
    spark, events_df, staged_events_dir, tmp_path
):
    """Streaming Welford state judges each event against its key's PRIOR
    stats; the static expanding-window path must agree event-for-event."""
    from astro_sdk_spark.streaming.ops import stateful_anomalies

    stream = read_events_stream(
        spark, staged_events_dir, schema=SCHEMA, max_files_per_trigger=1
    )
    out = stateful_anomalies(stream, k=2.0, min_count=3)
    spark.sql("DROP TABLE IF EXISTS stateful_anom_out")
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/stateful_anom_out", ignore_errors=True)
    q = stream_to_table(
        out, "stateful_anom_out", str(tmp_path / "ckpt_anom"), trigger_once=True
    )
    q.awaitTermination(180)
    got = spark.table("stateful_anom_out").filter(
        F.col("user_id") != SENTINEL_USER
    )

    batch = stateful_anomalies(events_df, k=2.0, min_count=3)
    key = lambda r: (r.user_id, r.ts, round(r.value, 4))  # noqa: E731
    expect = {key(r): (r.n_prior, r.is_anomaly) for r in batch.collect()}
    actual = {key(r): (r.n_prior, r.is_anomaly) for r in got.collect()}
    assert actual == expect
    assert len(actual) == events_df.count()
    spark.sql("DROP TABLE IF EXISTS stateful_anom_out")


def test_stateful_anomalies_batch_semantics(spark):
    """Constant baseline then spike: prior-stats judgment flags the spike
    (zero-variance branch) but not the early rows (min_count guard)."""
    import datetime as dt

    from astro_sdk_spark.streaming.ops import stateful_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(minutes=i), 10.0) for i in range(5)]
    rows.append((1, base + dt.timedelta(minutes=9), 99.0))  # spike
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.ts: r for r in stateful_anomalies(df, k=2.0, min_count=3).collect()}
    spike = out[base + dt.timedelta(minutes=9)]
    assert spike.is_anomaly and spike.zscore is None  # zero-variance branch
    assert spike.n_prior == 5
    early = out[base + dt.timedelta(minutes=1)]
    assert not early.is_anomaly  # only 1 prior point


def test_stateful_anomalies_null_values_do_not_poison(spark):
    """A NULL value must not fold into the baseline (batch path; the
    streaming Welford fold skips NaN the same way)."""
    import datetime as dt

    from astro_sdk_spark.streaming.ops import stateful_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(minutes=i), 10.0) for i in range(4)]
    rows.append((1, base + dt.timedelta(minutes=4), None))
    rows.append((1, base + dt.timedelta(minutes=5), 99.0))  # spike
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.ts: r for r in stateful_anomalies(df, k=2.0, min_count=3).collect()}
    null_row = out[base + dt.timedelta(minutes=4)]
    assert not null_row.is_anomaly and null_row.zscore is None
    spike = out[base + dt.timedelta(minutes=5)]
    assert spike.is_anomaly  # baseline still the clean constant 10.0
    assert spike.n_prior == 4  # nulls not counted


def test_stateful_anomalies_string_keys_stream(spark, tmp_path):
    """Schemas derive from input dtypes: string keys must work in the
    STREAMING branch (a hardcoded long key would crash at Arrow
    conversion), and the output must match the batch path."""
    import datetime as dt

    from astro_sdk_spark.streaming.ops import stateful_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("alpha", base + dt.timedelta(minutes=i), 10.0 + (i % 2) * 0.2)
        for i in range(6)
    ]
    rows.append(("alpha", base + dt.timedelta(minutes=7), 500.0))  # spike
    rows.append(("beta", base + dt.timedelta(minutes=1), 1.0))
    # far-future sentinel advances the watermark so nothing lingers
    rows.append(("zz-sentinel", base + dt.timedelta(days=10), 0.0))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    d = str(tmp_path / "skey_events")
    df.coalesce(1).write.parquet(d)

    stream = spark.readStream.schema("k string, ts timestamp, value double").parquet(d)
    out = stateful_anomalies(
        stream, ts_col="ts", key_col="k", k=2.0, min_count=3
    )
    q = (
        out.writeStream.format("memory")
        .queryName("skey_anoms")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.k, r.ts): r for r in spark.sql("SELECT * FROM skey_anoms").collect()}
    batch = stateful_anomalies(
        df, ts_col="ts", key_col="k", k=2.0, min_count=3
    )
    expect = {(r.k, r.ts): r for r in batch.collect()}
    assert set(got) == set(expect)
    for key in expect:
        assert got[key].is_anomaly == expect[key].is_anomaly, key
        assert got[key].n_prior == expect[key].n_prior, key
    assert got[("alpha", base + dt.timedelta(minutes=7))].is_anomaly
