"""transform / transform_file — templated SQL SELECT → new table (CTAS).

Reference: ``python-sdk/src/astro/sql/operators/transform.py:20-191`` and the
front-end in ``base_decorator.py:106-272`` (SURVEY §3.1). The user supplies a
function returning a SQL string (optionally ``(sql, params)``); ``{{ t }}``
placeholders are rendered as validated identifiers and ``:p`` binds as
escaped literals; the SELECT is materialized via
``CREATE TABLE ... AS SELECT`` (``databases/base.py:363-381``) and the
``Table`` handle is returned.

Usable both as a decorator (parity with ``@aql.transform``) and as a direct
call with a SQL string.
"""

from __future__ import annotations

import functools
import pathlib
from typing import Any, Callable

from pyspark.sql import SparkSession

from astro_sdk_spark.engine import QueryModifier, SparkEngine
from astro_sdk_spark.session import default_session
from astro_sdk_spark.table import BaseTable, Table, TempTable


def _materialize_dataframe_args(eng: SparkEngine, params: dict[str, Any]) -> None:
    """pandas / Spark DataFrame parameters are loaded into TempTables and
    replaced by their handles, so ``{{ df_arg }}`` renders as a real table
    identifier — reference ``load_op_arg_dataframes_into_sql``
    (``base_decorator.py:369-417``). The temp tables join the engine's
    registry and are dropped by cleanup()."""
    import pandas as pd
    from pyspark.sql import DataFrame as SparkDataFrame

    for name, value in list(params.items()):
        if isinstance(value, pd.DataFrame):
            sdf = eng.spark.createDataFrame(value)
        elif isinstance(value, SparkDataFrame):
            sdf = value
        else:
            continue
        staged = TempTable()
        eng.load_dataframe_to_table(sdf, staged)
        params[name] = staged


def _materialize(
    eng: SparkEngine,
    sql: str,
    parameters: dict[str, Any],
    output_table: BaseTable | None,
    query_modifier: QueryModifier | None = None,
    partition_by=None,
    bucket_by=None,
) -> BaseTable:
    _materialize_dataframe_args(eng, parameters)
    out = output_table or TempTable()
    eng.create_table_from_select_statement(
        sql, out, parameters=parameters, query_modifier=query_modifier,
        partition_by=partition_by, bucket_by=bucket_by,
    )
    from astro_sdk_spark.lineage import _name_of, emit

    emit(
        "transform",
        inputs=[_name_of(v) for v in parameters.values() if hasattr(v, "qualified_name")],
        outputs=[_name_of(out)],
        sql=sql,
    )
    return out


def run_transform(
    sql: str,
    parameters: dict[str, Any] | None = None,
    output_table: BaseTable | None = None,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
    query_modifier: QueryModifier | None = None,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
) -> BaseTable:
    """Direct-call form: render + CTAS + return handle. ``partition_by``
    / ``bucket_by=(n, cols)`` shape the output table's physical layout
    (partition pruning / shuffle-free co-located joins downstream)."""
    eng = engine or SparkEngine(spark or default_session())
    return _materialize(
        eng, sql, dict(parameters or {}), output_table, query_modifier,
        partition_by=partition_by, bucket_by=bucket_by,
    )


def transform(
    python_callable: Callable | None = None,
    *,
    conn_id: str = "",  # parity; unused
    parameters: dict[str, Any] | None = None,
    database: str | None = None,
    schema: str | None = None,
    engine: SparkEngine | None = None,
    query_modifier: QueryModifier | None = None,
):
    """Decorator form — ``@transform`` wraps a fn returning a SQL template.

    Function args become template parameters (reference
    ``move_function_params_into_sql_params``, ``base_decorator.py:222-238``);
    Table-typed args render as identifiers, scalars as binds. Call the
    wrapped fn with the actual Table handles; kwarg ``output_table``
    designates the destination (TempTable otherwise).
    """

    def decorator(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, output_table: BaseTable | None = None, **kwargs):
            eng = engine or SparkEngine(default_session())
            sql = fn(*args, **kwargs)
            params: dict[str, Any] = dict(parameters or {})
            if isinstance(sql, tuple):  # fn may return (sql, params)
                sql, extra = sql
                params.update(extra)
            if isinstance(sql, str) and sql.strip().endswith(".sql"):
                sql = pathlib.Path(sql.strip()).read_text()
            # bind the fn's own arguments by name (base_decorator.py:222-238)
            import inspect

            bound = inspect.signature(fn).bind(*args, **kwargs)
            bound.apply_defaults()
            params.update(bound.arguments)
            out = output_table
            if out is not None and schema and out.metadata.is_empty():
                out.metadata.schema = schema
            return _materialize(eng, sql, params, out, query_modifier)

        return wrapper

    if python_callable is not None:
        return decorator(python_callable)
    return decorator


def transform_file(
    file_path: str,
    parameters: dict[str, Any] | None = None,
    output_table: BaseTable | None = None,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
) -> BaseTable:
    """SQL read from a .sql file — reference ``transform.py:145-191``."""
    sql = pathlib.Path(file_path).read_text()
    return run_transform(
        sql, parameters=parameters, output_table=output_table, engine=engine, spark=spark
    )
