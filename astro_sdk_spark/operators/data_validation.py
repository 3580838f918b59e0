"""check_column / check_table — data-quality checks.

Reference:
- ``python-sdk/src/astro/sql/operators/data_validations/check_column.py:13-210``
  (per-column ``null_check``, ``distinct_check``, ``unique_check``, ``min``,
  ``max``, each compared with
  ``equal_to/greater_than/less_than/geq_to/leq_to`` + ``tolerance``)
- ``.../check_table.py:12-109`` (boolean SQL checks, run as
  ``SELECT check AS ok FROM t [WHERE partition]``).

Spark-first, 100 TB-safe:
- check_column compiles *all* columns' checks into ONE aggregate pass over
  the table (single scan, map-side partial agg) instead of one query per
  check — the difference between 1 and N scans at scale.
- check_table wraps every row-level check statement in ``bool_and(...)``
  so exactly ONE row ever returns to the driver, whatever the table size.
  Statements that are already aggregates (``COUNT(*) = 1000``) are detected
  STATICALLY against the built-in aggregate/scalar function names (no
  analyzer round-trip, no ERROR-log noise); only unclassifiable statements
  (subqueries, windows, unknown functions) fall back to a driver-side
  analysis probe (no job runs).
"""

from __future__ import annotations

from dataclasses import dataclass
from numbers import Number
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.session import default_session
from astro_sdk_spark.table import BaseTable
from astro_sdk_spark.templating import is_valid_identifier


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


def _compare(observed: Any, spec: dict) -> tuple[bool, str]:
    """Apply the reference's comparison contract incl. tolerance
    (check_column.py:91-142): tolerance t widens equal_to to ±t*value.

    Works on any orderable observation (numbers, dates, strings); tolerance
    applies only to numeric pairs. ``None`` (empty input) fails the check
    with a diagnostic instead of crashing."""
    tol = spec.get("tolerance", 0) or 0
    for op in _COMPARISONS:
        if op not in spec:
            continue
        ref = spec[op]
        if observed is None:
            return False, f"{op} {ref!r} violated by observed None (empty input?)"
        numeric = (
            isinstance(observed, Number)
            and isinstance(ref, Number)
            and not isinstance(observed, bool)
        )
        if numeric:
            lo, hi = ref - abs(ref) * tol, ref + abs(ref) * tol
        else:
            lo = hi = ref
        try:
            ok = {
                "equal_to": lo <= observed <= hi,
                "greater_than": observed > lo,
                "less_than": observed < hi,
                "geq_to": observed >= lo,
                "leq_to": observed <= hi,
            }[op]
        except TypeError:
            return False, f"{op}: cannot compare observed {observed!r} with {ref!r}"
        if not ok:
            return False, f"{op} {ref!r} (tolerance {tol}) violated by observed {observed!r}"
    return True, ""


def column_check_aggs(
    column_mapping: dict[str, dict[str, dict]],
) -> tuple[list[Column], list[tuple[str, str]]]:
    """Compile a column_mapping into one list of aggregate expressions
    (single scan) + the (column, check) slot order. Shared by check_column
    and the correctness-harness query entry."""
    aggs: list[Column] = []
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
    return aggs, slots


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

    aggs, slots = column_check_aggs(column_mapping)
    row = df.agg(*aggs).collect()[0].asDict()

    results = []
    for col, check in slots:
        observed = row[f"{col}__{check}"]
        ok, detail = _compare(observed, column_mapping[col][check])
        results.append(CheckResult(col, check, observed, ok, detail))
    failures = [r for r in results if not r.passed]
    if failures:
        msgs = "; ".join(f"{r.column}.{r.check}: {r.detail}" for r in failures)
        raise ChecksFailedError(f"Column checks failed: {msgs}")
    return results


# Spark's built-in aggregate function names (SQL surface). Used to classify
# a check_statement STATICALLY — an aggregate statement must not be wrapped
# in bool_and (nested aggregates are illegal), a row-level one must be. The
# old implementation discovered this by analyzing the wrapped form and
# catching NESTED_AGGREGATE_FUNCTION, which (a) pays an extra analyzer
# round-trip per aggregate check and (b) makes Spark's SQLQueryContextLogger
# emit a full ERROR-level stack trace into otherwise-clean logs.
_AGGREGATE_FNS = frozenset({
    "any", "any_value", "approx_count_distinct", "approx_percentile",
    "array_agg", "avg", "bit_and", "bit_or", "bit_xor",
    "bitmap_construct_agg", "bitmap_or_agg", "bool_and", "bool_or",
    "collect_list", "collect_set", "corr", "count", "count_if",
    "count_min_sketch", "covar_pop", "covar_samp", "every", "first",
    "first_value", "grouping", "grouping_id", "histogram_numeric",
    "hll_sketch_agg", "hll_union_agg", "kurtosis", "last", "last_value",
    "listagg", "max", "max_by", "mean", "median", "min", "min_by", "mode",
    "percentile", "percentile_approx", "percentile_cont", "percentile_disc",
    "regr_avgx", "regr_avgy", "regr_count", "regr_intercept", "regr_r2",
    "regr_slope", "regr_sxx", "regr_sxy", "regr_syy", "skewness", "some",
    "std", "stddev", "stddev_pop", "stddev_samp", "string_agg", "sum",
    "try_avg", "try_sum", "var_pop", "var_samp", "variance",
})

# Common scalar builtins a check statement plausibly calls. Calls outside
# BOTH sets (user functions, exotic builtins) fall back to the analyzer
# probe — correct either way, just slower and noisier, so the lists only
# need to cover what real checks use, not the whole function registry.
_SCALAR_FNS = frozenset({
    "abs", "array", "array_contains", "ascii", "cast", "ceil", "ceiling",
    "char_length", "coalesce", "concat", "concat_ws", "contains", "crc32",
    "current_date", "current_timestamp", "date_add", "date_diff", "date_sub",
    "date_trunc", "datediff", "day", "dayofmonth", "dayofweek", "element_at",
    "endswith", "exp", "floor", "format_number", "format_string",
    "from_json", "from_unixtime", "get_json_object", "greatest", "hash",
    "hour", "if", "ifnull", "initcap", "instr", "isnotnull", "isnull",
    "least", "left", "length", "levenshtein", "like", "ln", "locate", "log",
    "log10", "lower", "lpad", "ltrim", "map", "md5", "minute", "mod",
    "month", "named_struct", "now", "nullif", "nvl", "nvl2", "pmod",
    "position", "pow", "power", "regexp_extract", "regexp_like",
    "regexp_replace", "repeat", "replace", "reverse", "right", "rlike",
    "round", "rpad", "rtrim", "second", "sha1", "sha2", "sign", "size",
    "split", "sqrt", "startswith", "struct", "substr", "substring",
    "to_date", "to_timestamp", "translate", "trim", "trunc", "try_cast",
    "typeof", "unix_timestamp", "upper", "year",
})


# SQL keywords that legitimately precede '(' without being function calls
# (IN-lists, boolean grouping, CASE arms) — excluded from the call scan so
# ordinary row-level checks like "x IN (1,2)" classify statically.
_NON_CALL_KEYWORDS = frozenset({
    "and", "or", "not", "in", "between", "when", "then", "else", "case",
    "end", "is", "like", "rlike", "ilike", "distinct", "exists", "all",
})


def classify_check_statement(stmt: str) -> bool | None:
    """Statically classify a check statement: ``True`` = aggregate (use
    as-is), ``False`` = row-level (wrap in bool_and), ``None`` =
    undecidable (subquery, window, or unrecognized function — let the
    analyzer probe decide). Pure string analysis; no Spark calls.

    Literals and comments are stripped FIRST (single- and double-quoted
    strings, backticked identifiers, ``--`` line and ``/* */`` block
    comments), so an aggregate-looking word inside a string or comment
    never flips the classification."""
    import re

    s = re.sub(r"/\*.*?\*/", " ", stmt, flags=re.S)  # block comments out
    s = re.sub(r"'(?:[^'\\]|\\.)*'", "''", s)  # string literals out
    s = re.sub(r'"(?:[^"\\]|\\.)*"', "''", s)  # double-quoted literals out
    s = re.sub(r"`[^`]*`", "`x`", s)  # quoted identifiers out
    s = re.sub(r"--[^\n]*", "", s)  # line comments out
    tokens = set(re.findall(r"[a-z_][a-z0-9_]*", s.lower()))
    if "select" in tokens or "over" in tokens:
        return None  # subquery / window function — not statically decidable
    calls = {
        m.group(1).lower()
        for m in re.finditer(r"\b([a-z_][a-z0-9_]*)\s*\(", s, re.I)
    } - _NON_CALL_KEYWORDS
    if calls & _AGGREGATE_FNS:
        return True
    if calls <= _SCALAR_FNS:  # includes the no-calls case
        return False
    return None  # unrecognized function — could be a UDAF


def build_check_table_sql(
    spark: SparkSession,
    table_name: str,
    checks: dict[str, dict[str, str]],
    partition_clause: str | None = None,
) -> str:
    """ONE query, ONE output row: each check_statement is wrapped in
    ``bool_and(...)`` unless it is already an aggregate. Aggregate-ness is
    decided STATICALLY (:func:`classify_check_statement` — known aggregate
    / scalar function names, no analyzer round-trip, no ERROR-log noise);
    only statements it cannot classify (subqueries, windows, unknown
    functions) fall back to the analysis probe, where a nested-aggregate
    error identifies the aggregate checks. check_name doubles as the
    output alias, so it must be a valid identifier (injection guard)."""
    import logging

    where = f" WHERE {partition_clause}" if partition_clause else ""
    exprs = []
    for check_name, spec in checks.items():
        if not is_valid_identifier(check_name):
            raise ValueError(f"check name is not a valid identifier: {check_name!r}")
        stmt = spec["check_statement"]
        # coalesce: bool_and over ZERO rows is NULL — the reference's
        # per-row evaluation passes vacuously on an empty table, so we do too
        wrapped = f"coalesce(bool_and(({stmt})), true)"
        is_agg = classify_check_statement(stmt)
        if is_agg is None:
            logging.getLogger(__name__).debug(
                "check %s: statement not statically classifiable, "
                "probing the analyzer: %s", check_name, stmt
            )
            try:
                spark.sql(f"SELECT {wrapped} FROM {table_name}{where}")
                is_agg = False
            except Exception:  # noqa: BLE001 - nested aggregate → use as-is
                is_agg = True
        expr = f"(({stmt}))" if is_agg else wrapped
        exprs.append(f"{expr} AS {check_name}")
    return f"SELECT {', '.join(exprs)} FROM {table_name}{where}"


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
    ``SELECT check_name, check_result FROM (...)``). Row-level statements
    (``a + b < c``) are aggregated with bool_and so a single row returns
    regardless of table size. Row-level checks pass VACUOUSLY on an empty
    table (coalesce over bool_and's zero-row NULL), matching the reference's
    per-row evaluation; guard with an aggregate ``COUNT(*) > 0`` check if
    emptiness should fail."""
    eng = engine or SparkEngine(spark or default_session())
    if isinstance(dataset, BaseTable):
        name = dataset.qualified_name
    else:
        name = "_astro_check_table_view"
        dataset.createOrReplaceTempView(name)
    sql = build_check_table_sql(eng.spark, name, checks, partition_clause)
    row = eng.spark.sql(sql).collect()[0]
    results = []
    for check_name in checks:
        val = row[check_name]
        results.append(CheckResult(None, check_name, val, bool(val)))
    failures = [r for r in results if not r.passed]
    if failures:
        raise ChecksFailedError(
            "Table checks failed: " + ", ".join(r.check for r in failures)
        )
    return results


def profile_table(
    dataset: BaseTable | DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
    engine: SparkEngine | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Column-level data profile — the inspection pass a pipeline runs
    before wiring checks: per column, row count, null count, distinct
    count, and min/max (rendered as strings so heterogeneous columns fit
    one tidy long-format output: ``column, n_rows, n_nulls, n_distinct,
    min_value, max_value``).

    Scale shape: ALL columns' metrics compile into ONE aggregate pass
    (the check_column device — 1 scan, not N); only that single
    aggregated row reaches the driver, where it is reshaped to one row
    per column. ``exact_distinct=False`` swaps count(distinct) for the
    HLL ``approx_count_distinct`` — at 100 TB multi-column exact
    distincts expand the aggregate input |columns|-fold (Spark's Expand
    node), and profiling rarely needs exactness."""
    eng = engine or SparkEngine(spark or default_session())
    df = (
        eng.spark.table(dataset.qualified_name)
        if isinstance(dataset, BaseTable)
        else dataset
    )
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: no such columns {missing}")
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        unordered = dtypes[c].startswith("map")  # maps have no ordering/equality
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            (F.lit(None).cast("long") if unordered else distinct(F.col(c))).alias(
                f"_nd_{c}"
            ),
            (F.lit(None) if unordered else F.min(F.col(c)))
            .cast("string")
            .alias(f"_mn_{c}"),
            (F.lit(None) if unordered else F.max(F.col(c)))
            .cast("string")
            .alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            c,
            row["_n"],
            row["_n"] - row[f"_nn_{c}"],
            row[f"_nd_{c}"],
            row[f"_mn_{c}"],
            row[f"_mx_{c}"],
        )
        for c in cols
    ]
    return eng.spark.createDataFrame(
        out,
        "column string, n_rows long, n_nulls long, n_distinct long, "
        "min_value string, max_value string",
    )


def detect_outliers(
    df: DataFrame,
    value_col: str,
    method: str = "iqr",
    k: float = 1.5,
    round_digits: int = 4,
    clip: bool = False,
) -> DataFrame:
    """Robust outlier fences for a numeric column — the data-quality op
    that catches corrupted loads (unit mix-ups, sentinel values, decimal
    shifts) BEFORE they poison aggregates.

    ``method='iqr'``: Tukey fences ``[q1 − k·IQR, q3 + k·IQR]``
    (k=1.5 standard, 3 for "far out"). ``method='mad'``: median ±
    k·1.4826·MAD (the normal-consistent median absolute deviation;
    use k≈3) — sturdier when up to half the data is bad.

    Returns every row with ``(…, lo, hi, is_outlier)`` where lo/hi are
    rounded for display but the flag compares against the exact fences.
    ``clip=True`` additionally WINSORIZES: the value column is clamped
    to the exact fences (repair instead of report) — flagged rows keep
    ``is_outlier=True`` so the repair stays visible.

    Scale shape: one exact-percentile aggregate (two for MAD — the
    second pass computes |x − median| deviations; both are single
    partial-aggregated scans), then the one-row fence broadcast onto a
    scan-side projection. No sort, no shuffle of the data itself."""
    if method not in ("iqr", "mad"):
        raise ValueError(f"method must be 'iqr' or 'mad', got {method!r}")
    v = F.col(value_col)
    if method == "iqr":
        b = df.agg(
            F.percentile(v, F.lit(0.25)).alias("_q1"),
            F.percentile(v, F.lit(0.75)).alias("_q3"),
        ).select(
            (F.col("_q1") - F.lit(k) * (F.col("_q3") - F.col("_q1"))).alias("_lo"),
            (F.col("_q3") + F.lit(k) * (F.col("_q3") - F.col("_q1"))).alias("_hi"),
        )
    else:
        med = df.agg(F.percentile(v, F.lit(0.5)).alias("_med"))
        dev = (
            df.crossJoin(F.broadcast(med))
            .agg(
                F.percentile(
                    F.abs(v - F.col("_med")), F.lit(0.5)
                ).alias("_mad"),
                F.first("_med").alias("_med"),
            )
        )
        spread = F.lit(k) * F.lit(1.4826) * F.col("_mad")
        b = dev.select(
            (F.col("_med") - spread).alias("_lo"),
            (F.col("_med") + spread).alias("_hi"),
        )
    pin = float(10**round_digits)
    out = df.crossJoin(F.broadcast(b)).select(
        "*",
        (F.floor(F.col("_lo") * F.lit(pin) + F.lit(0.5)) / F.lit(pin)).alias("lo"),
        (F.floor(F.col("_hi") * F.lit(pin) + F.lit(0.5)) / F.lit(pin)).alias("hi"),
        ((v < F.col("_lo")) | (v > F.col("_hi"))).alias("is_outlier"),
    )
    if clip:
        # winsorize: clamp to the EXACT fences (same values the flag
        # compares against) — repair instead of report. NULLs stay NULL:
        # Spark's least/greatest SKIP nulls, so the naive clamp would
        # fabricate the low fence for missing measurements.
        out = out.withColumn(
            value_col,
            F.when(
                v.isNull(), v
            ).otherwise(F.least(F.col("_hi"), F.greatest(F.col("_lo"), v))),
        )
    return out.drop("_lo", "_hi")


# (narrow, wide) pairs — writing NARROW-typed data into a WIDE column is
# a lossless upcast the store-assignment rules accept; the reverse (and
# any other pair) is rejected or lossy.
_SAFE_WIDENINGS = {  # simpleString names
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
    ("date", "timestamp"), ("date", "timestamp_ntz"),
}


def schema_drift(old: StructType, new: StructType) -> dict:
    """Compare an incoming batch's schema (``new``) against the existing
    table's (``old``) the way an append pipeline must: which columns
    appeared, which vanished, which changed type — and whether a plain
    append of the new data into the old table succeeds losslessly.

    ``compatible`` requires: identical column sets (a missing column
    fails the write outright; an extra column needs schema evolution the
    plain parquet writers don't do) and every type change a safe upcast
    INTO the stored column — i.e. ``(new_type, old_type)`` is a
    narrowing-into-wider pair (``int`` data lands in a ``bigint`` column;
    ``bigint`` data into an ``int`` column is rejected by
    store-assignment).

    Returns ``{added, removed, changed, compatible}`` where ``changed``
    maps column → (old_type, new_type, safe). Purely metadata — no jobs
    run; the pre-flight gate before ``load_file(...,
    if_exists='append')`` or ``incremental_append``."""
    o = {f.name: f.dataType.simpleString() for f in old.fields}
    n = {f.name: f.dataType.simpleString() for f in new.fields}
    added = sorted(set(n) - set(o))
    removed = sorted(set(o) - set(n))
    changed = {
        c: (o[c], n[c], (n[c], o[c]) in _SAFE_WIDENINGS)
        for c in sorted(set(o) & set(n))
        if o[c] != n[c]
    }
    compatible = (
        not added
        and not removed
        and all(safe for _, _, safe in changed.values())
    )
    return {
        "added": added,
        "removed": removed,
        "changed": changed,
        "compatible": compatible,
    }
