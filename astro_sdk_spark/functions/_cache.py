"""Registry for persisted intermediates (LSH candidate sets, top-k sets).

Several dedup/similarity plans persist a tiny intermediate DataFrame that
their output references more than once (Spark re-evaluates the whole
upstream subtree per reference otherwise). The output is lazy, so the
function cannot unpersist before returning — but a long-running caller
(a streaming ``foreachBatch`` admitting batches forever, a benchmark loop)
must be able to release them, or cached blocks accumulate without bound.

Pattern: producers call ``track(df)`` instead of ``df.persist()``;
consumers call ``release_intermediates()`` after the action that
materializes the result. Safe to call at any time — unpersist only drops
cached blocks; a later re-reference recomputes.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_lock = threading.Lock()
_live: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later release."""
    df.persist()
    with _lock:
        _live.append(df)
    return df


def persistent_rdd_ids(spark) -> set[int]:
    """Ids of every RDD currently persisted in the session (includes
    localCheckpoint storage, which ``catalog.clearCache()`` does NOT
    touch — that API only drains the SQL cache manager)."""
    return set(spark.sparkContext._jsc.getPersistentRDDs().keys())


def checkpoint_rdd_ids(df: DataFrame) -> set[int]:
    """Persistent-RDD ids owned by a ``localCheckpoint``-ed DataFrame,
    read off the DataFrame ITSELF: a local checkpoint's analyzed plan is
    a ``LogicalRDD`` wrapping exactly the RDD that ``localCheckpoint``
    persisted, so its id is the one to unpersist later.

    This replaces the old before/after ``persistent_rdd_ids`` set-diff,
    which was a RACE under concurrency: any RDD persisted by ANOTHER
    query in the same SparkSession during the diff window (e.g. a second
    streaming ingest's own checkpoint) landed in the diff and got
    unpersisted mid-use — and since a local checkpoint truncates lineage,
    the victim's blocks are unrecoverable and its stream dies with
    block-not-found. Returns an empty set when the plan shape is not the
    expected LogicalRDD (leaking one checkpoint beats killing a
    concurrent query)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            return {plan.rdd().id()}
    except Exception:  # noqa: BLE001 - non-classic DF / plan shape drift
        pass
    return set()


def unpersist_rdd_ids(spark, ids) -> int:
    """Unpersist specific RDD ids. CAUTION with checkpointed RDDs: a
    localCheckpoint TRUNCATES lineage, so dropping its blocks makes any
    DataFrame still referencing it unrecoverable (not recomputable) —
    only call this on ids that are provably dead (e.g. a superseded
    iteration's checkpoint) or after every consumer has materialized."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for rid in ids:
        rdd = jmap.get(rid) if hasattr(jmap, "get") else None
        if rdd is None:
            try:
                rdd = jmap[rid]
            except Exception:  # noqa: BLE001 - already cleaned
                continue
        try:
            rdd.unpersist(False)
            n += 1
        except Exception:  # noqa: BLE001
            pass
    return n


def sweep_persistent_rdds(spark) -> int:
    """Unpersist EVERY persistent RDD — the between-queries reset for a
    benchmark/batch loop, where no checkpoint-backed DataFrame from a
    prior query is re-referenced. Long-running pipelines should prefer
    the targeted ``unpersist_rdd_ids`` (see near_dup_clusters' per-round
    cleanup) so live results stay valid."""
    return unpersist_rdd_ids(spark, persistent_rdd_ids(spark))


def release_intermediates() -> int:
    """Unpersist every tracked intermediate; returns how many were released."""
    with _lock:
        drained = _live[:]
        _live.clear()
    n = 0
    for df in drained:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
