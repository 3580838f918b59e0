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
