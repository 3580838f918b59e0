"""Streaming operators: watermarked windowed aggregation, sessionization,
stateful dedup.

Design for scale: all aggregations are expressed with Spark's native
``window``/``session_window`` + watermark state management — state store
size is bounded by the watermark horizon, partitioned by group key. No
``foreachBatch`` collect loops; sinks are parquet/table appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
    fmt: str = "parquet",
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source stream over an events directory. At production scale the
    same code takes a Kafka source — the transformations don't change."""
    reader = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    return reader.load(path)


def tumbling_window_agg(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window count/sum with late-data watermark. Works on both
    static and streaming frames (watermark is a no-op on static)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(ts_col, window_duration).alias("win")] + [
        F.col(c) for c in (group_cols or ["event_type"])
    ]
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(group_cols or ["event_type"]),
            "n",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_duration: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
) -> DataFrame:
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(ts_col, window_duration, slide).alias("win")] + [
        F.col(c) for c in (group_cols or ["event_type"])
    ]
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(group_cols or ["event_type"]),
            "n",
            "avg_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Native session windows (gap-based). State per (user, open session),
    closed and emitted once the watermark passes the gap."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("sess"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (``dropDuplicates`` keeps bounded state only with a watermark)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(keys or ["event_id"])
    return df.dropDuplicates(keys or ["event_id"])


def stream_to_table(
    stream: DataFrame,
    table_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    trigger_once: bool = True,
):
    """Sink a stream into a managed table. ``trigger_once`` processes all
    available input then stops — the batch-like test mode; continuous
    deployments drop the flag."""
    writer = (
        stream.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.toTable(table_name)
