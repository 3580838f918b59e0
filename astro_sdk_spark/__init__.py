"""astro_sdk_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of astronomer/astro-sdk.

The reference (astro-sdk, see /root/reference/python-sdk) is an ELT
orchestration SDK whose relational compute is delegated to a SQL warehouse.
Here the "warehouse" is Spark SQL / Catalyst itself: operators are plain
Python functions over one SparkSession — no Airflow, no network hop, and the
data plane is Spark's distributed execution (parquet scans with pushdown,
hash aggregation, broadcast/sort-merge joins, AQE).

Public API (mirrors ``astro.sql.__init__`` — reference
``python-sdk/src/astro/sql/__init__.py:20-50``):

    load_file, transform, transform_file, run_raw_sql, dataframe,
    append, merge, export_to_file, drop_table, cleanup,
    check_column, check_table, get_value_list, get_file_list,
    Table, TempTable, Metadata, File

plus the LLM-data-pipeline extensions under ``astro_sdk_spark.functions``
(dedup, similarity, text analysis, flatten) and
``astro_sdk_spark.streaming``.
"""

from astro_sdk_spark.table import Metadata, Table, TempTable
from astro_sdk_spark.files import File
from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.session import get_session, default_session
from astro_sdk_spark.operators.load_file import load_file
from astro_sdk_spark.operators.transform import transform, transform_file
from astro_sdk_spark.operators.raw_sql import run_raw_sql
from astro_sdk_spark.operators.dataframe import dataframe
from astro_sdk_spark.operators.append import append
from astro_sdk_spark.operators.merge import merge
from astro_sdk_spark.operators.scd import merge_scd2, scd2_lookup, scd2_plan
from astro_sdk_spark.operators.diff import diff_summary, table_diff
from astro_sdk_spark.operators.incremental import high_water_mark, incremental_append
from astro_sdk_spark.plan_audit import assert_scale_shape, audit_plan
from astro_sdk_spark.operators.export import export_to_file
from astro_sdk_spark.operators.drop import drop_table
from astro_sdk_spark.operators.cleanup import cleanup
from astro_sdk_spark.operators.data_validation import (
    check_column,
    check_table,
    detect_outliers,
    profile_table,
    schema_drift,
)
from astro_sdk_spark.operators.values import get_value_list
from astro_sdk_spark.operators.files import get_file_list
from astro_sdk_spark.operators.export_file import export_file, export_table_to_file
from astro_sdk_spark.load_options import (
    CsvLoadOptions,
    JsonLoadOptions,
    LoadOptions,
    PandasLoadOptions,
    ParquetLoadOptions,
)
from astro_sdk_spark.object_store import configure_azure, configure_gcs, configure_s3
from astro_sdk_spark.operators.classes import (
    AppendOperator,
    CleanupOperator,
    ColumnCheckOperator,
    DataframeOperator,
    DropTableOperator,
    ExportFileOperator,
    ExportTableToFileOperator,
    ExportToFileOperator,
    GetValueListOperator,
    ListFileOperator,
    LoadFileOperator,
    MergeOperator,
    RawSQLOperator,
    SQLCheckOperator,
    TransformOperator,
)
from astro_sdk_spark.lineage import LINEAGE

__version__ = "0.1.0"

__all__ = [
    "Metadata",
    "Table",
    "TempTable",
    "File",
    "SparkEngine",
    "get_session",
    "default_session",
    "load_file",
    "transform",
    "transform_file",
    "run_raw_sql",
    "dataframe",
    "append",
    "merge",
    "merge_scd2",
    "scd2_plan",
    "scd2_lookup",
    "table_diff",
    "diff_summary",
    "incremental_append",
    "high_water_mark",
    "audit_plan",
    "assert_scale_shape",
    "export_to_file",
    "drop_table",
    "cleanup",
    "check_column",
    "check_table",
    "profile_table",
    "schema_drift",
    "detect_outliers",
    "get_value_list",
    "get_file_list",
    "export_file",
    "export_table_to_file",
    "LoadOptions",
    "CsvLoadOptions",
    "JsonLoadOptions",
    "ParquetLoadOptions",
    "PandasLoadOptions",
    "configure_s3",
    "configure_gcs",
    "configure_azure",
    "LINEAGE",
    "LoadFileOperator",
    "TransformOperator",
    "RawSQLOperator",
    "AppendOperator",
    "MergeOperator",
    "ExportToFileOperator",
    "DropTableOperator",
    "CleanupOperator",
    "ColumnCheckOperator",
    "SQLCheckOperator",
    "GetValueListOperator",
    "ListFileOperator",
    "DataframeOperator",
    "ExportFileOperator",
    "ExportTableToFileOperator",
]
