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


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "30 minutes",
    within: str = "15 minutes",
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a time-interval bound:
    rows pair when keys match AND ``|left.ts − right.ts| ≤ within``
    (click↔impression attribution, request↔response correlation).

    Both sides carry watermarks and the time bound lives IN the join
    condition — that pair is what lets Spark evict buffered rows once
    ``watermark + within`` has passed, keeping state bounded by the
    horizon instead of the stream length (outer joins REQUIRE it; inner
    joins without it buffer forever). Right-side columns are suffixed
    (except the key) so the output schema is collision-free. Works
    identically on static frames (watermark no-op) — the property the
    equality test exploits.
    """
    # suffix EVERY right column (key included): the two sides often share
    # lineage (two filters of one source), where dataframe-qualified refs
    # (lf[on] == r[on]) trip Spark's ambiguous-self-join check — plain
    # disjoint column names never do
    clashes = sorted(set(left.columns) & {c + right_suffix for c in right.columns})
    if clashes:
        raise ValueError(
            f"left frame already has column(s) {clashes}, which the "
            f"suffixed right side would duplicate — rename them or pass a "
            f"different right_suffix"
        )
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, c + right_suffix)
    rkey, rts = on + right_suffix, right_ts + right_suffix
    lf = left
    if lf.isStreaming:
        lf = lf.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(rts, watermark)
    cond = (
        (F.col(on) == F.col(rkey))
        & (F.col(left_ts) >= F.col(rts) - F.expr(f"INTERVAL {within}"))
        & (F.col(left_ts) <= F.col(rts) + F.expr(f"INTERVAL {within}"))
    )
    joined = lf.join(r, cond, how)
    # one key column in the output (for outer joins coalesce fills the
    # null side; the two are equal whenever both exist)
    key = F.coalesce(F.col(on), F.col(rkey)).alias(on)
    others = [F.col(c) for c in left.columns if c != on] + [
        F.col(c + right_suffix) for c in right.columns if c != on
    ]
    return joined.select(key, *others)


def stateful_user_stats(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    idle_gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    lifetime counters (event count, value total, first/last timestamp) held
    in the state store and emitted as ONE final row when the user has been
    idle past ``idle_gap`` in event time.

    This is the pattern for stateful logic Spark's built-in windows can't
    express (reference has no streaming at all; this is the scale-path
    extension SURVEY §2.5 row 10 calls for). Scale design:

    - **Append-mode output**: rows are emitted only on event-time timeout,
      so the file sink (append-only) works and every row is final.
    - **Bounded state**: one small tuple per *active* user; the timeout
      removes idle users, so state size tracks the active-user set, not
      the full history. At 1000 executors the state store is partitioned
      by ``user_col`` hash — no single-node bottleneck.
    - **Event-time timeouts** ride the watermark, so reprocessing a backlog
      (availableNow) gives the same answer as live streaming.

    On a static frame this degrades to the equivalent one-pass groupBy
    (same columns), so batch backfills reuse the operator unchanged.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    out_schema = (
        f"{user_col} long, n_events long, total_value double, "
        "first_ts timestamp, last_ts timestamp"
    )
    if not events.isStreaming:
        return (
            events.groupBy(user_col)
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(value_col).alias("total_value"),
                F.min(ts_col).alias("first_ts"),
                F.max(ts_col).alias("last_ts"),
            )
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = _duration_to_ms(idle_gap)
    # state tuple: (n, total, first_us, last_us) — epoch micros, not
    # timestamps, to keep the state row primitive-typed and lossless
    state_schema = "n long, total double, first_us long, last_us long"

    def update_fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            n, total, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    user_col: [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "first_ts": [pd.to_datetime(first_us, unit="us")],
                    "last_ts": [pd.to_datetime(last_us, unit="us")],
                }
            )
            return
        n, total, first_us, last_us = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdf_iter:
            ts_us = (pdf[ts_col].astype("int64") // 1_000)
            n += len(pdf)
            total += float(pdf[value_col].sum())
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, total, first_us, last_us))
        # fire once the watermark passes last activity + gap; clamp above
        # the current watermark (Spark rejects timeouts in the past)
        state.setTimeoutTimestamp(
            max(last_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — makes update_fn a generator on all paths

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_DURATION_UNITS = {
    "millisecond": 1, "milli": 1, "ms": 1,
    "second": 1000, "sec": 1000, "s": 1000,
    "minute": 60_000, "min": 60_000, "m": 60_000,
    "hour": 3_600_000, "hr": 3_600_000, "h": 3_600_000,
    "day": 86_400_000, "d": 86_400_000,
}


def _duration_to_ms(duration: str) -> int:
    """'10 minutes' / '30 secs' / '5 mins' / '100 ms' → milliseconds.

    Accepts the same unit spellings Spark's CalendarInterval parser does
    (full names plus ms/sec/min/hr abbreviations, singular or plural).
    """
    qty, unit = duration.split()
    unit = unit.lower()
    # Exact match first: "ms" must not be de-pluralized into "m" (minutes).
    per = _DURATION_UNITS.get(unit)
    if per is None:
        per = _DURATION_UNITS.get(unit.rstrip("s") or "s")  # "s".rstrip("s") == ""
    if per is None:
        raise ValueError(
            f"Unrecognized duration unit in {duration!r}; "
            f"use one of {sorted(set(_DURATION_UNITS))}"
        )
    return int(float(qty) * per)


def stream_ann_index_ingest(
    stream: DataFrame,
    index_name: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_once: bool = True,
    compact_every_n_batches: int | None = None,
):
    """Maintain a persisted ANN index (functions/ann_index.py) over an
    unbounded vector stream: each micro-batch is assigned (and, for a PQ
    index, encoded) against the STORED quantizer and appended to the
    inverted lists — the similarity service keeps answering from tables
    that grow per batch, and the corpus is never rescanned.

    The index must already exist (``build_ann_index``): the quantizer /
    codebook choice is a BUILD-time decision, not something a micro-batch
    should improvise. Replay safety needs no run/batch watermark here —
    ``ann_index_add``'s id-dedupe anti-join makes a replayed batch a
    no-op (same contract the test pins), which is the right idempotence
    key for an index: identity is the vector id, not the batch.

    ``compact_every_n_batches`` closes the maintenance lifecycle from
    inside the loop: every N batches the fragmented lists are rewritten
    (ann_index_compact — one bounded stats scan + per-partition atomic
    INSERT OVERWRITE), so an unbounded run keeps files-per-list bounded
    without an operator ever calling compact by hand. The same tick
    RE-READS meta: if the index was retrained mid-stream (generation
    bump), the stream adopts the new quantizer from the next batch on.
    Batches appended between a retrain and the next tick carry the old
    generation — queries never see them (ann_index_topk's generation
    binding) and their ids stay re-addable under the live generation;
    restart the stream (or re-add those ids) for exact coverage.
    Without the knob, meta is read ONCE at wiring time and a retrain
    mid-stream leaves later batches invisible the same way — restart
    the stream after retraining."""
    from astro_sdk_spark.functions.ann_index import (
        _append_assigned,
        _read_meta,
        ann_index_compact,
    )

    spark = stream.sparkSession
    # read meta ONCE at wiring time (fail here, not mid-stream) and close
    # over it: per micro-batch the only Spark work is the dedupe
    # anti-join + assign + append — no meta re-read, no separate
    # dim-check action (the geometry guard rides inside the assignment
    # job, see _append_assigned). The maintenance tick below is the
    # scheduled exception.
    state = {"meta": _read_meta(spark, index_name)}

    def add_batch(batch_df: DataFrame, batch_id: int) -> None:
        every = compact_every_n_batches
        if every and batch_id > 0 and batch_id % every == 0:
            # maintenance tick: bounded (one stats scan + only the
            # fragmented lists rewritten), and the cheapest moment to
            # notice a retrain — adopt the live meta before assigning
            state["meta"] = _read_meta(batch_df.sparkSession, index_name)
            ann_index_compact(batch_df.sparkSession, index_name)
        _append_assigned(
            batch_df.sparkSession, batch_df, index_name,
            id_col, vec_col, meta=state["meta"],
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(add_batch)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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


def stateful_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    k: float = 3.0,
    min_count: int = 5,
    idle_gap: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming z-score anomaly detection with per-key Welford state
    (n, mean, M2 — the numerically-stable running-variance recurrence):
    each event is judged against the key's statistics BEFORE it (a spike
    must not dilute its own baseline), then folded in. The streaming
    counterpart of timeseries.rolling_anomalies, holding O(1) state per
    key instead of a window of rows.

    Emits one row per event: ``key, ts, value, n_prior, zscore,
    is_anomaly``. ``zscore`` is NULL while the baseline has no variance;
    a deviation from a zero-variance baseline with enough history still
    flags (the constant-then-spike case). Append-mode safe: every output
    row is final when emitted.

    Scale design: state is one (n, mean, M2) triple per key, partitioned
    by key hash across the state store — size tracks the live-key set
    (event-time timeout GCs keys idle past ``idle_gap``), never the
    event history. On a static frame this degrades to an expanding
    window (stats over PRECEDING rows only) with the same semantics, so
    backfills reuse the operator."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    # derive key/ts/value types from the input (a hardcoded `long` key
    # would crash streaming for string ids while batch worked — the
    # ivfpq_topk schema lesson)
    dtypes = dict(events.dtypes)
    out_schema = (
        f"{key_col} {dtypes[key_col]}, {ts_col} {dtypes[ts_col]}, "
        f"{value_col} double, n_prior long, zscore double, "
        "is_anomaly boolean"
    )

    if not events.isStreaming:
        from pyspark.sql.window import Window

        w = (
            Window.partitionBy(key_col)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        n = F.count(value_col).over(w)
        mean = F.avg(value_col).over(w)
        var = F.var_pop(value_col).over(w)
        std = F.sqrt(var)
        dev = F.abs(F.col(value_col) - mean)
        flag = (n >= min_count) & (
            F.when(std > 0, dev > F.lit(k) * std).otherwise(
                F.col(value_col) != mean
            )
        )
        return events.select(
            key_col,
            ts_col,
            F.col(value_col).cast("double").alias(value_col),
            n.alias("n_prior"),
            F.when(std > 0, dev / std).alias("zscore"),
            F.coalesce(flag, F.lit(False)).alias("is_anomaly"),
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = _duration_to_ms(idle_gap)
    state_schema = "n long, mean double, m2 double, last_us long"

    def update_fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, mean, m2, last_us = (
            state.get if state.exists else (0, 0.0, 0.0, 0)
        )
        rows = {
            key_col: [], ts_col: [], value_col: [],
            "n_prior": [], "zscore": [], "is_anomaly": [],
        }
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col)
            for ts, x in zip(pdf[ts_col], pdf[value_col]):
                last_us = max(last_us, int(pd.Timestamp(ts).value // 1_000))
                # NULL values: emit an unflagged row and do NOT fold —
                # one NaN would permanently poison the key's mean/M2,
                # while the batch path's avg/var_pop skip nulls
                if pd.isna(x):
                    rows[key_col].append(key[0])
                    rows[ts_col].append(ts)
                    rows[value_col].append(None)
                    rows["n_prior"].append(n)
                    rows["zscore"].append(None)
                    rows["is_anomaly"].append(False)
                    continue
                x = float(x)
                std = (m2 / n) ** 0.5 if n > 0 else 0.0
                dev = abs(x - mean)
                z = dev / std if std > 0 else None
                flag = bool(
                    n >= min_count
                    and (dev > k * std if std > 0 else x != mean)
                )
                rows[key_col].append(key[0])
                rows[ts_col].append(ts)
                rows[value_col].append(x)
                rows["n_prior"].append(n)
                rows["zscore"].append(z)
                rows["is_anomaly"].append(flag)
                # Welford fold
                n += 1
                d = x - mean
                mean += d / n
                m2 += d * (x - mean)
        state.update((n, mean, m2, last_us))
        state.setTimeoutTimestamp(
            max(last_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(rows)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sketch_ingest(
    stream: DataFrame,
    key_col: str,
    sketch_table: str,
    checkpoint_dir: str,
    width: int = 1024,
    depth: int = 4,
    trigger_once: bool = True,
    by: list[str] | None = None,
):
    """Maintain a count-min sketch over an unbounded stream: every
    micro-batch is sketched (functions/cms.py:cms_build) and cell-wise
    MERGED into ``sketch_table`` — approximate per-key frequencies over
    the whole stream history in ``depth × width`` rows of state, however
    many events flow through. Query any time with
    ``cms_query(spark.table(t).select('d', 'cell', 'n'), keys, ...)``.

    ``by`` maintains one sketch PER GROUP (the "heavy hitters per
    service" shape): the store holds ``(*by, d, cell, n)`` rows —
    groups × depth × width — and queries pass the same ``by`` to
    ``cms_query``. The store merge is fully distributed (localCheckpoint
    + staged table write, no driver materialization), so a
    high-cardinality ``by`` scales with executor storage.

    This is the streaming face of the sketch family's mergeability (the
    same property that lets per-partition/per-day sketches combine):
    frequency analytics whose memory does NOT grow with key cardinality
    or stream length, where exact streaming counts would hold one state
    row per key forever.

    Durability contract: the shared store helper
    (:func:`astro_sdk_spark.streaming.store.merge_sketch_batch`) provides
    replay idempotence via the stored ``(_run_id, _batch_id)`` watermark,
    atomic go-live through the staged swap, parameter identity
    (``width``/``depth`` stored and asserted — merging sketches of
    different geometries would sum incompatible hash spaces), and the
    explicit empty-batch policy (empty micro-batches and 0-row store
    tables are no-ops, never poison).
    """
    import hashlib

    from astro_sdk_spark.functions.cms import cms_build, cms_merge
    from astro_sdk_spark.streaming.store import merge_sketch_batch

    spark = stream.sparkSession
    run_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:16]
    keys = list(by or [])
    clash = set(keys) & {"d", "cell", "n"}
    if clash:
        raise ValueError(
            f"by columns {sorted(clash)} collide with the CMS sketch "
            f"schema (d, cell, n) — rename them before ingesting"
        )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_sketch_batch(
            spark, sketch_table, run_id, batch_id, batch_df,
            params={"width": width, "depth": depth},
            data_cols=[*keys, "d", "cell", "n"],
            build=lambda b: cms_build(b, key_col, width=width, depth=depth, by=keys),
            merge=lambda stored, fresh: cms_merge(stored, fresh, by=keys),
            incompatible_what="incompatible hash spaces",
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(merge_batch)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_quantile_ingest(
    stream: DataFrame,
    value_col: str,
    sketch_table: str,
    checkpoint_dir: str,
    width: int = 100,
    value_scale: int = 2,
    trigger_once: bool = True,
    by: list[str] | None = None,
):
    """Maintain a mergeable quantile sketch over an unbounded stream:
    each micro-batch is bucketed (functions/quantiles.py) and bucket-wise
    MERGED into ``sketch_table`` — whole-history quantiles in
    ``range/width`` rows of state, however many events flow through.
    Query any time with
    ``quantile_sketch_query(spark.table(t).select('bucket', 'n'), ...)``.

    ``by`` maintains one sketch PER GROUP (the "p99 latency per service"
    shape): the store holds ``(*by, bucket, n)`` rows — at most
    groups x range/width — and queries pass the same ``by`` to
    ``quantile_sketch_query``.

    Same durability contract as :func:`stream_sketch_ingest`, provided by
    the shared store helper (:func:`astro_sdk_spark.streaming.store.
    merge_sketch_batch`): replay idempotence via the stored
    ``(_run_id, _batch_id)`` watermark, atomic go-live through the staged
    swap, parameter identity (``width``/``value_scale`` stored and
    asserted — merging sketches of different bucket geometries would sum
    incompatible grids), and the explicit empty-batch policy.
    """
    import hashlib

    from astro_sdk_spark.functions.quantiles import (
        quantile_sketch_build,
        quantile_sketch_merge,
    )
    from astro_sdk_spark.streaming.store import merge_sketch_batch

    spark = stream.sparkSession
    run_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:16]
    keys = list(by or [])
    clash = set(keys) & {"bucket", "n"}
    if clash:
        raise ValueError(
            f"by columns {sorted(clash)} collide with the quantile sketch "
            f"schema (bucket, n) — rename them before ingesting"
        )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_sketch_batch(
            spark, sketch_table, run_id, batch_id, batch_df,
            params={"width": width, "scale": value_scale},
            data_cols=[*keys, "bucket", "n"],
            build=lambda b: quantile_sketch_build(
                b, value_col, width=width, value_scale=value_scale, by=keys
            ),
            merge=lambda stored, fresh: quantile_sketch_merge(
                stored, fresh, by=keys
            ),
            incompatible_what="incompatible bucket grids",
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(merge_batch)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
