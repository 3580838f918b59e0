"""dataframe — the SQL ↔ Python bridge.

Reference: ``python-sdk/src/astro/sql/operators/dataframe.py:99-343``:
function args annotated ``pd.DataFrame`` that receive a ``Table`` are
exported to pandas, the function runs arbitrary Python, and the returned
DataFrame is optionally written back to ``output_table``.

Spark-first: the scalable path is ``mapInPandas``/``applyInPandas`` —
the user function runs *inside executors* on Arrow batches instead of
collecting the table to the driver (SURVEY §3.3). ``dataframe()`` keeps the
reference's driver-side semantics (explicit small-data escape hatch);
``map_in_pandas()`` / ``apply_in_pandas()`` are the 100 TB versions.
"""

from __future__ import annotations

import functools
import inspect
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.operators.load_file import apply_columns_names_capitalization
from astro_sdk_spark.session import default_session
from astro_sdk_spark.table import BaseTable


def dataframe(
    python_callable: Callable | None = None,
    *,
    conn_id: str = "",  # parity; unused
    columns_names_capitalization: str | None = "original",
    if_exists: str = "replace",
    engine: SparkEngine | None = None,
):
    """Decorator: Table-typed args arrive as pandas DataFrames; a returned
    pandas/Spark DataFrame is written to ``output_table`` if given."""

    def decorator(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, output_table: BaseTable | None = None, **kwargs):
            eng = engine or SparkEngine(default_session())
            sig = inspect.signature(fn)
            bound = sig.bind(*args, **kwargs)
            bound.apply_defaults()
            # Table args annotated pd.DataFrame → export (reference
            # dataframe.py:43-96 conversion rules)
            for name, value in list(bound.arguments.items()):
                if isinstance(value, BaseTable):
                    sdf = eng.spark.table(value.qualified_name)
                    sdf = apply_columns_names_capitalization(
                        sdf, columns_names_capitalization
                    )
                    bound.arguments[name] = sdf.toPandas()
            result = fn(*bound.args, **bound.kwargs)
            if result is None:
                return None
            if isinstance(result, pd.DataFrame):
                sdf = eng.spark.createDataFrame(result)
            elif isinstance(result, DataFrame):
                sdf = result
            else:
                return result
            if output_table is not None:
                eng.load_dataframe_to_table(sdf, output_table, if_exists=if_exists)
                return output_table
            return sdf

        return wrapper

    if python_callable is not None:
        return decorator(python_callable)
    return decorator


def map_in_pandas(
    source: DataFrame | BaseTable,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Distributed pandas transform: fn runs per Arrow batch on executors —
    the scale-out replacement for the reference's driver-side dataframe op."""
    s = spark or default_session()
    df = s.table(source.qualified_name) if isinstance(source, BaseTable) else source

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_gen, schema=schema)


def apply_in_pandas(
    source: DataFrame | BaseTable,
    group_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Grouped pandas transform (one pandas frame per group, executors)."""
    s = spark or default_session()
    df = s.table(source.qualified_name) if isinstance(source, BaseTable) else source
    return df.groupBy(*group_cols).applyInPandas(fn, schema=schema)
