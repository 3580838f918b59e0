"""SparkSession bootstrap.

The reference keys every operator off an Airflow ``conn_id`` resolved to a
warehouse connection (``python-sdk/src/astro/databases/__init__.py:15-52``).
Here the single execution substrate is one SparkSession; ``conn_id``
collapses to "the session" (SURVEY §1.3).

Defaults are chosen for scale-out behavior that also works on local[N]:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic broadcast selection) — at 100 TB the static shuffle-partition
  number is always wrong in one direction; AQE fixes it at runtime.
- Arrow on for every pandas interchange (Pandas UDFs, toPandas).
- ``spark.sql.shuffle.partitions`` defaults to max(32, defaultParallelism)
  — AQE coalesces down, so err high for big shuffles.
- parquet writer: snappy, v2 pages; reader: vectorized (default).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_ENV_CPUS = "SPARK_GRAFT_CPUS"


def get_session(
    app_name: str = "astro_sdk_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) the SparkSession with scale-oriented defaults."""
    cpus = os.environ.get(_ENV_CPUS)
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(32, int(cpus) if cpus else 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # cost-based optimization: consumes ANALYZE TABLE statistics
        # (engine.analyze_table) for join reordering + cardinality estimates
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # janino codegen class cache is a 100-entry LRU by default; a
        # session running many distinct wide-aggregate queries (this
        # library registers 60+) evicts and recompiles constantly —
        # compile is ~70% of a cold LSH-query run. Static conf: must be
        # set before the first session is created.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def default_session() -> SparkSession:
    """The active session, creating one with defaults if none exists."""
    active = SparkSession.getActiveSession()
    return active if active is not None else get_session()
