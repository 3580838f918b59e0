"""Z-order (Morton) clustering values — multi-dimensional data layout.

``compact_table(sort_by=[col])`` clusters a table linearly: parquet
min/max stats then prune range predicates on THAT column, but a second
column's values stay scattered across every file. Interleaving the bits
of several columns' bucket ranks (the Morton curve — Morton 1966; the
technique behind Delta/Databricks ``ZORDER BY``) gives every listed
column partial locality, so ``file_skip_report`` shows real skipping on
EACH dimension instead of one.

Scale shape: the per-column (min, max) bounds come from ONE aggregate
broadcast as a single row; the z-value itself is pure integer codegen
(scale → clamp → bit-interleave). Sorting by the z-value is whatever the
writer already does (compact_table's range partition + within-file
sort). Nothing here shuffles beyond the caller's rewrite.

Bucketing is min/max-linear, which is resolution, not correctness:
skewed columns cluster coarsely (a rank-based bucketing would cost a
global sort per column). ``bits`` trades interleave resolution against
the 63-bit budget: bits × n_cols ≤ 63.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_col(scaled: list[Column], bits: int) -> Column:
    """Interleave pre-bucketed integer columns (each in [0, 2^bits)) —
    column i contributes bit b to output bit ``b·n + i``.

    The bucket is cast to BIGINT BEFORE shifting: Spark's shiftleft on
    an IntegerType does 32-bit Java shifts (distance masked mod 32, bit
    31 is the sign), which silently corrupts any interleave wider than
    31 bits — casting the already-shifted int is too late."""
    n = len(scaled)
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(scaled):
        c64 = c.cast("bigint")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c64, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    return z


def add_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    out_col: str = "_zorder",
) -> DataFrame:
    """Append a Morton z-value over ``cols`` (numeric/date/timestamp).
    Write the frame sorted by it — or pass ``sort_by=[out_col]`` to
    ``compact_table`` — and parquet min/max stats prune predicates on
    EVERY listed column."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits <= 0 or bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) must be in (0, 63], got {bits}*{len(cols)}"
        )
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame")
    taken = set(df.columns)
    clashes = sorted(
        {out_col, *(f"_mn_{c}" for c in cols), *(f"_mx_{c}" for c in cols)}
        & taken
    )
    if clashes:
        raise ValueError(
            f"frame already has column(s) {clashes} — withColumn would "
            "silently overwrite them; rename or pass a different out_col"
        )

    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"_mn_{c}"), F.max(v).alias(f"_mx_{c}")]
    bounds = df.agg(*aggs)

    top = (1 << bits) - 1
    out = df.crossJoin(F.broadcast(bounds))
    scaled = []
    for c in cols:
        v = F.col(c).cast("double")
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        span = mx - mn
        # constant column → bucket 0; NULL value → bucket 0 (sorts first)
        b = F.when(
            v.isNull() | (span <= 0), F.lit(0)
        ).otherwise(
            F.least(
                F.lit(top),
                F.floor((v - mn) / span * F.lit(float(top + 1))).cast("int"),
            )
        )
        scaled.append(b)
    out = out.withColumn(out_col, zorder_col(scaled, bits))
    return out.drop(*[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])
