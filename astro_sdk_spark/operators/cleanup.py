"""cleanup — drop all temp tables created during a run.

Reference: ``python-sdk/src/astro/sql/operators/cleanup.py:55-301``. The
reference polls Airflow task states to wait for DAG completion
(``cleanup.py:177-203``) — there is no scheduler here, so cleanup is
immediate over the engine's temp-table registry (SURVEY §4 item 4).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import SparkSession

from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.session import default_session
from astro_sdk_spark.table import BaseTable


def cleanup(
    tables_to_cleanup: Sequence[BaseTable] | None = None,
    skip_on_failure: bool = False,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
) -> list[str]:
    """Drop the given temp tables (or every temp table the engine created).
    Returns qualified names dropped."""
    eng = engine or SparkEngine(spark or default_session())
    try:
        return eng.cleanup_temp_tables(tables_to_cleanup)
    except Exception:
        if skip_on_failure:
            return []
        raise
