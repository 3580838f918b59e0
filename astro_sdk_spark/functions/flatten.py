"""flatten — recursive struct flattening with separator + illegal-char map.

Replicates the relational shape produced by the reference's ndjson
normalization (``pandas.json_normalize`` with ``sep`` —
``python-sdk/src/astro/files/types/ndjson.py:54-96``,
``sql/operators/load_file.py:205-243``) and the per-database illegal-char
replacement (``databases/postgres.py:31-32``,
``databases/google/bigquery.py:88-89``).

Spark reads nested JSON natively as StructType; this operator rewrites
``a.b.c`` struct access into top-level columns ``a_b_c`` — a pure
projection, zero shuffle, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _clean(name: str, illegal: list[str], repl: list[str]) -> str:
    for ch, r in zip(illegal, repl):
        name = name.replace(ch, r)
    return name


def flatten(
    df: DataFrame,
    sep: str = "_",
    illegal_chars: list[str] | None = None,
    replacements: list[str] | None = None,
    max_depth: int = 16,
) -> DataFrame:
    """Flatten all StructType columns into top-level columns joined by
    ``sep``. Arrays/maps are left intact (the reference's json_normalize
    likewise leaves lists as object columns)."""
    illegal = illegal_chars or []
    repl = replacements or []

    for _ in range(max_depth):
        struct_fields = [f for f in df.schema.fields if isinstance(f.dataType, StructType)]
        if not struct_fields:
            break
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                for sub in f.dataType.fields:
                    new_name = _clean(f"{f.name}{sep}{sub.name}", illegal, repl)
                    cols.append(F.col(f"`{f.name}`.`{sub.name}`").alias(new_name))
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)
    return df
