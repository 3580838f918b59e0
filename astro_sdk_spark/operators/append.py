"""append — insert all (or column-mapped) rows of source into target.

Reference: ``python-sdk/src/astro/sql/operators/append.py:15-176``; engine
semantics ``databases/base.py:666-696`` =
``INSERT INTO tgt (cols) SELECT cols FROM src``. Both tables must exist;
the reference's same-datasource guard (``append.py:53-55``) is a no-op here
(single SparkSession).

``columns`` accepts list/tuple (same names both sides) or dict
(source→target), matching ``append.py`` / ``merge.py:46-52`` normalization.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.session import default_session
from astro_sdk_spark.table import BaseTable


def normalize_columns(columns) -> dict[str, str]:
    """list/tuple/dict → source→target map (reference merge.py:46-52)."""
    if columns is None:
        return {}
    if isinstance(columns, dict):
        return dict(columns)
    if isinstance(columns, (list, tuple)):
        return {c: c for c in columns}
    raise ValueError(f"columns must be list/tuple/dict, got {type(columns).__name__}")


def append(
    source_table: BaseTable,
    target_table: BaseTable,
    columns=None,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
) -> BaseTable:
    eng = engine or SparkEngine(spark or default_session())
    if not eng.table_exists(source_table):
        raise ValueError(f"Source table {source_table.qualified_name} does not exist")
    if not eng.table_exists(target_table):
        raise ValueError(f"Target table {target_table.qualified_name} does not exist")
    eng.append_table(source_table, target_table, normalize_columns(columns))
    from astro_sdk_spark.lineage import _name_of, emit

    emit("append", inputs=[_name_of(source_table)], outputs=[_name_of(target_table)])
    return target_table
