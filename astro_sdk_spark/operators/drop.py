"""drop_table — DROP TABLE IF EXISTS.

Reference: ``python-sdk/src/astro/sql/operators/drop.py:14-51``,
statement ``databases/base.py:57,383-390``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.session import default_session
from astro_sdk_spark.table import BaseTable


def drop_table(
    table: BaseTable,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
) -> None:
    eng = engine or SparkEngine(spark or default_session())
    eng.drop_table(table)
