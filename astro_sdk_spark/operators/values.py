"""get_value_list — run SQL, return rows (bounded).

Reference: ``python-sdk/src/astro/sql/__init__.py:53-79`` (bounded by
``max_map_length`` for dynamic task mapping).
"""

from __future__ import annotations

from pyspark.sql import Row, SparkSession

from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.session import default_session


def get_value_list(
    sql: str,
    parameters: dict | None = None,
    max_map_length: int = 1024,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
) -> list[Row]:
    eng = engine or SparkEngine(spark or default_session())
    return eng.run_sql(sql, parameters=parameters).limit(max_map_length).collect()
