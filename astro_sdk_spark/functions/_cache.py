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
