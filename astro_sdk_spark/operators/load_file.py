"""load_file — file(s)/pattern → table or DataFrame.

Reference: ``python-sdk/src/astro/sql/operators/load_file.py:37-394``
(table path ``:140-169``, dataframe path ``:171-203``) and
``databases/base.py:474-542``.

Spark-first design: ``spark.read.format(...).load(glob)`` already *is* the
reference's "native path" — executors pull file splits in parallel straight
from the object store; there is no pandas fallback because there is no
slower second path. ndjson flattening (``load_file.py:205-243``) is applied
post-read as an explicit DataFrame transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.files import File, FileType
from astro_sdk_spark.functions.flatten import flatten
from astro_sdk_spark.session import default_session
from astro_sdk_spark.table import BaseTable


def apply_columns_names_capitalization(df: DataFrame, mode: str | None) -> DataFrame:
    """'upper' | 'lower' | 'original' — reference ``constants.py:93``,
    ``utils/dataframe.py:17-33``."""
    if mode in (None, "original"):
        return df
    if mode == "lower":
        return df.toDF(*[c.lower() for c in df.columns])
    if mode == "upper":
        return df.toDF(*[c.upper() for c in df.columns])
    raise ValueError(f"columns_names_capitalization must be upper/lower/original, got {mode!r}")


def load_file(
    input_file: File,
    output_table: BaseTable | None = None,
    if_exists: str = "replace",
    ndjson_normalize_sep: str = "_",
    use_native_support: bool = True,  # parity; Spark is always native
    columns_names_capitalization: str | None = "original",
    load_options=None,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
) -> DataFrame | BaseTable:
    """Load file(s) into a table (returns the handle) or, with no
    ``output_table``, return the DataFrame (reference ``:171-203``).
    ``load_options`` accepts a typed LoadOptions object, a list of them
    (reference form), or a raw reader-options dict. ``partition_by`` /
    ``bucket_by=(n, cols)`` control the physical layout of the target
    table (partition pruning / exchange-free co-located joins — see
    engine.load_dataframe_to_table)."""
    from astro_sdk_spark.load_options import resolve_load_options

    eng = engine or SparkEngine(spark or default_session())
    reader_opts = resolve_load_options(load_options, input_file.type)
    df = eng.read_file(input_file, extra_options=reader_opts)
    if input_file.type in (FileType.NDJSON, FileType.JSON):
        # File.normalize_config wins over the operator arg (reference
        # load_file.py:205-243 passes normalize_config to json_normalize)
        sep = (input_file.normalize_config or {}).get("sep", ndjson_normalize_sep)
        df = flatten(
            df,
            sep=sep,
            illegal_chars=eng.illegal_column_name_chars,
            replacements=eng.illegal_column_name_chars_replacement,
        )
    df = apply_columns_names_capitalization(df, columns_names_capitalization)
    if output_table is None:
        return df
    eng.load_dataframe_to_table(
        df, output_table, if_exists=if_exists,
        partition_by=partition_by, bucket_by=bucket_by,
    )
    from astro_sdk_spark.lineage import _name_of, emit

    emit("load_file", inputs=[_name_of(input_file)], outputs=[_name_of(output_table)])
    return output_table
