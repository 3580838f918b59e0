"""run_raw_sql — arbitrary SQL (DDL/DML/SELECT) with result handling.

Reference: ``python-sdk/src/astro/sql/operators/raw_sql.py:25-235``:
optional ``handler``, ``results_format ∈ {list, pandas_dataframe}``
(``constants.py:95``), ``fail_on_empty``, ``response_size`` truncation.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from astro_sdk_spark.engine import QueryModifier, SparkEngine
from astro_sdk_spark.session import default_session


def run_raw_sql(
    sql: str,
    parameters: dict[str, Any] | None = None,
    handler: Callable[[DataFrame], Any] | None = None,
    results_format: str | None = None,
    fail_on_empty: bool = False,
    response_size: int = -1,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
    query_modifier: QueryModifier | None = None,
) -> Any:
    """Execute SQL; shape the result per reference semantics.

    - no handler & no results_format → None (DDL/DML style, parity with
      ``raw_sql.py:122-133``)
    - ``results_format='list'`` → list of Rows (truncated to response_size)
    - ``results_format='pandas_dataframe'`` → pandas DataFrame
    - ``handler`` → handler(DataFrame) (the Spark DataFrame stands in for
      the DB-API cursor)
    """
    eng = engine or SparkEngine(spark or default_session())
    df = eng.run_sql(sql, parameters=parameters, query_modifier=query_modifier)

    if fail_on_empty and df.isEmpty():
        raise ValueError("Query returned no rows and fail_on_empty=True")

    if handler is not None:
        result = handler(df)
    elif results_format == "list":
        result = df.limit(response_size).collect() if response_size >= 0 else df.collect()
        return result
    elif results_format == "pandas_dataframe":
        limited = df.limit(response_size) if response_size >= 0 else df
        return limited.toPandas()
    else:
        # fire DML/DDL side effects; SELECTs without a handler return None
        if not df.columns:
            return None
        return None
    if response_size >= 0 and isinstance(result, list):
        result = result[:response_size]
    return result
