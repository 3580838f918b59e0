"""Operator-class parity layer.

The reference's public API exposes both task-decorator functions AND the
underlying Airflow operator classes (``python-sdk/src/astro/sql/__init__.py:
20-50`` exports LoadFileOperator, TransformOperator, RawSQLOperator,
DataframeOperator, AppendOperator, MergeOperator, ExportToFileOperator,
DropTableOperator, CleanupOperator, ColumnCheckOperator, SQLCheckOperator;
``files/operators/files.py:13-43`` exports ListFileOperator). Users who
instantiate classes and call ``.execute()`` can keep that shape here: each
class binds constructor kwargs and forwards to the engine-backed function on
``execute(context=None)`` (the ``context`` arg mirrors Airflow's signature
and is ignored — no scheduler in scope).
"""

from __future__ import annotations

from typing import Any, Callable

from astro_sdk_spark.operators.append import append
from astro_sdk_spark.operators.cleanup import cleanup
from astro_sdk_spark.operators.data_validation import check_column, check_table
from astro_sdk_spark.operators.dataframe import dataframe
from astro_sdk_spark.operators.drop import drop_table
from astro_sdk_spark.operators.export import export_to_file
from astro_sdk_spark.operators.export_file import export_file, export_table_to_file
from astro_sdk_spark.operators.files import get_file_list
from astro_sdk_spark.operators.load_file import load_file
from astro_sdk_spark.operators.merge import merge
from astro_sdk_spark.operators.raw_sql import run_raw_sql
from astro_sdk_spark.operators.transform import run_transform
from astro_sdk_spark.operators.values import get_value_list


class _FnOperator:
    """Bind kwargs at construction, run on execute() — the Airflow operator
    calling convention without Airflow."""

    fn: Callable[..., Any]

    def __init__(self, **kwargs: Any) -> None:
        self.kwargs = kwargs

    def execute(self, context: Any | None = None) -> Any:
        return type(self).fn(**self.kwargs)

    def __repr__(self) -> str:  # pragma: no cover - debug nicety
        return f"{type(self).__name__}({self.kwargs!r})"


class LoadFileOperator(_FnOperator):
    fn = staticmethod(load_file)


class TransformOperator(_FnOperator):
    """Takes sql= (already-rendered template string), parameters=,
    output_table= — the post-front-end shape of the reference operator."""

    fn = staticmethod(run_transform)


class RawSQLOperator(_FnOperator):
    fn = staticmethod(run_raw_sql)


class AppendOperator(_FnOperator):
    fn = staticmethod(append)


class MergeOperator(_FnOperator):
    fn = staticmethod(merge)


class ExportToFileOperator(_FnOperator):
    fn = staticmethod(export_to_file)


class DropTableOperator(_FnOperator):
    fn = staticmethod(drop_table)


class CleanupOperator(_FnOperator):
    fn = staticmethod(cleanup)


class ColumnCheckOperator(_FnOperator):
    fn = staticmethod(check_column)


class SQLCheckOperator(_FnOperator):
    fn = staticmethod(check_table)


class GetValueListOperator(_FnOperator):
    fn = staticmethod(get_value_list)


class ListFileOperator(_FnOperator):
    fn = staticmethod(get_file_list)


class DataframeOperator:
    """Class form of the ``dataframe`` decorator — reference
    ``python-sdk/src/astro/sql/__init__.py:9,25`` /
    ``operators/dataframe.py:99-343``: binds a python_callable whose
    Table-typed args arrive as pandas DataFrames; ``execute()`` runs it and
    writes a returned frame to ``output_table`` when given."""

    def __init__(
        self,
        python_callable: Callable[..., Any],
        op_args: tuple | list | None = None,
        op_kwargs: dict[str, Any] | None = None,
        output_table: Any | None = None,
        columns_names_capitalization: str | None = "original",
        if_exists: str = "replace",
        conn_id: str = "",  # parity; unused
        engine: Any | None = None,
    ) -> None:
        self.python_callable = python_callable
        self.op_args = tuple(op_args or ())
        self.op_kwargs = dict(op_kwargs or {})
        self.output_table = output_table
        self.columns_names_capitalization = columns_names_capitalization
        self.if_exists = if_exists
        self.engine = engine

    def execute(self, context: Any | None = None) -> Any:
        wrapped = dataframe(
            self.python_callable,
            columns_names_capitalization=self.columns_names_capitalization,
            if_exists=self.if_exists,
            engine=self.engine,
        )
        return wrapped(*self.op_args, output_table=self.output_table, **self.op_kwargs)

    def __repr__(self) -> str:  # pragma: no cover - debug nicety
        return f"DataframeOperator({self.python_callable!r})"


class ExportFileOperator(_FnOperator):
    """Deprecated class alias — reference ``sql/__init__.py:11,29`` keeps it
    as a warning-emitting wrapper of ExportToFileOperator."""

    fn = staticmethod(export_file)


class ExportTableToFileOperator(_FnOperator):
    """Deprecated class alias — reference ``sql/__init__.py:12,31``."""

    fn = staticmethod(export_table_to_file)
