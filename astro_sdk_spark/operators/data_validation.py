"""check_column / check_table — data-quality checks.

Reference:
- ``python-sdk/src/astro/sql/operators/data_validations/check_column.py:13-210``
  (per-column ``null_check``, ``distinct_check``, ``unique_check``, ``min``,
  ``max``, each compared with
  ``equal_to/greater_than/less_than/geq_to/leq_to`` + ``tolerance``)
- ``.../check_table.py:12-109`` (boolean SQL checks, run as
  ``SELECT check AS ok FROM t [WHERE partition]``).

Spark-first: check_column compiles *all* columns' checks into ONE aggregate
pass over the table (single scan, map-side partial agg) instead of one query
per check — the difference between 1 and N scans at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.session import default_session
from astro_sdk_spark.table import BaseTable


class ChecksFailedError(AssertionError):
    """One or more data-quality checks failed."""


@dataclass
class CheckResult:
    column: str | None
    check: str
    observed: Any
    passed: bool
    detail: str = ""


_COMPARISONS = ("equal_to", "greater_than", "less_than", "geq_to", "leq_to")


def _compare(observed: float, spec: dict) -> tuple[bool, str]:
    """Apply the reference's comparison contract incl. tolerance
    (check_column.py:91-142): tolerance t widens equal_to to ±t*value."""
    tol = spec.get("tolerance", 0) or 0
    for op in _COMPARISONS:
        if op not in spec:
            continue
        ref = spec[op]
        lo, hi = ref - abs(ref) * tol, ref + abs(ref) * tol
        ok = {
            "equal_to": lo <= observed <= hi,
            "greater_than": observed > lo,
            "less_than": observed < hi,
            "geq_to": observed >= lo,
            "leq_to": observed <= hi,
        }[op]
        if not ok:
            return False, f"{op} {ref} (tolerance {tol}) violated by observed {observed}"
    return True, ""


def check_column(
    dataset: BaseTable | DataFrame,
    column_mapping: dict[str, dict[str, dict]],
    partition_clause: str | None = None,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
) -> list[CheckResult]:
    """column_mapping like
    ``{"col": {"null_check": {"equal_to": 0}, "min": {"geq_to": 1}}}``.
    Raises ChecksFailedError if any check fails; returns results otherwise.
    """
    eng = engine or SparkEngine(spark or default_session())
    df = (
        eng.spark.table(dataset.qualified_name)
        if isinstance(dataset, BaseTable)
        else dataset
    )
    if partition_clause:
        df = df.filter(partition_clause)

    # one aggregate pass for every (column, check)
    aggs = []
    slots: list[tuple[str, str]] = []
    for col, checks in column_mapping.items():
        for check in checks:
            slot = f"{col}__{check}"
            if check == "null_check":
                aggs.append(F.sum(F.col(col).isNull().cast("long")).alias(slot))
            elif check == "distinct_check":
                aggs.append(F.countDistinct(F.col(col)).alias(slot))
            elif check == "unique_check":
                # count - countDistinct == 0 ⇒ unique (matches the SQL the
                # reference generates via SQLColumnCheckOperator)
                aggs.append(
                    (F.count(F.col(col)) - F.countDistinct(F.col(col))).alias(slot)
                )
            elif check == "min":
                aggs.append(F.min(F.col(col)).alias(slot))
            elif check == "max":
                aggs.append(F.max(F.col(col)).alias(slot))
            else:
                raise ValueError(f"Unknown column check: {check}")
            slots.append((col, check))
    row = df.agg(*aggs).collect()[0].asDict()

    results = []
    for col, check in slots:
        observed = row[f"{col}__{check}"]
        ok, detail = _compare(float(observed), column_mapping[col][check])
        results.append(CheckResult(col, check, observed, ok, detail))
    failures = [r for r in results if not r.passed]
    if failures:
        msgs = "; ".join(f"{r.column}.{r.check}: {r.detail}" for r in failures)
        raise ChecksFailedError(f"Column checks failed: {msgs}")
    return results


def check_table(
    dataset: BaseTable | DataFrame,
    checks: dict[str, dict[str, str]],
    partition_clause: str | None = None,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
) -> list[CheckResult]:
    """checks like ``{"row_count_check": {"check_statement": "COUNT(*) = 1000"}}``.
    Each statement must evaluate to a boolean over the table
    (reference check_table.py:55-60 runs
    ``SELECT check_name, check_result FROM (...)``)."""
    eng = engine or SparkEngine(spark or default_session())
    if isinstance(dataset, BaseTable):
        name = dataset.qualified_name
    else:
        name = "_astro_check_table_view"
        dataset.createOrReplaceTempView(name)
    where = f" WHERE {partition_clause}" if partition_clause else ""
    exprs = ", ".join(
        f"({spec['check_statement']}) AS {check_name}" for check_name, spec in checks.items()
    )
    # aggregate checks (COUNT(*) = n) and row-level checks (a + b < c) both
    # work via bool_and over a per-row evaluation when not aggregate
    row = eng.spark.sql(f"SELECT {exprs} FROM {name}{where}").collect()
    results = []
    for check_name in checks:
        vals = [r[check_name] for r in row]
        ok = all(bool(v) for v in vals)
        results.append(CheckResult(None, check_name, vals[0] if len(vals) == 1 else vals, ok))
    failures = [r for r in results if not r.passed]
    if failures:
        raise ChecksFailedError(
            "Table checks failed: " + ", ".join(r.check for r in failures)
        )
    return results
