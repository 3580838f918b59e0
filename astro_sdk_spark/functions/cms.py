"""Count-min sketch — mergeable frequency estimation (Cormode &
Muthukrishnan, J. Algorithms 2005).

Completes the sketch family (HLL → distinct counts, Bloom → membership,
CMS → frequencies): a ``depth × width`` counter grid where every key
increments one counter per row (an md5-derived hash) and a key's
estimate is the MIN of its ``depth`` counters — an overestimate by at
most ``εN`` with ε = e/width at confidence 1 − e^−depth. The use at
100 TB: per-key frequencies (hot terms, hot join keys, heavy-hitter
users) in O(depth·width) memory INDEPENDENT of key cardinality, and
sketches of different partitions/days MERGE by cell-wise addition —
the same reason the engine's HLL path exists.

``by=[...]`` maintains one sketch PER GROUP (the "heavy hitters per
service" shape): every function carries the group columns through the
``(*by, d, cell, n)`` rows, so state is ``groups × depth × width`` and
merging/querying stay per-group.

Determinism: the hash is the repo-standard md5 device
(``CAST('0x' || substr(md5(i || ':' || key), 1, 15) AS BIGINT)``),
identical in Spark and any SQL engine — so building, querying, and
merging are all hash-gate-verifiable bit-for-bit, unlike
randomly-seeded sketch libraries.

Scale shape: building explodes each row into ``depth`` (row, cell)
pairs and partially aggregates — the shuffle moves at most
``depth × width`` rows per partition (× groups when ``by`` is set)
regardless of input size. Querying joins the keys' cells against the
sketch (broadcast: the sketch is ≤ depth·width rows per group by
construction) and takes the per-key min. Merging is a cell-keyed sum —
partial-agg again.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(key: Column, i: int, width: int) -> Column:
    """Row-``i`` counter index for a key — the md5 device both engines
    compute identically."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    by: list[str] | None = None,
) -> DataFrame:
    """Sketch a column: returns ``(*by, d, cell, n)`` — at most
    depth×width rows per group. Missing cells are implicitly zero."""
    if width <= 0 or depth <= 0:
        raise ValueError("width and depth must be positive")
    keys = list(by or [])
    # the md5 device costs ``depth`` digests per row and fuses into the
    # scan stage, whose parallelism is bounded by the source's row
    # groups — spread a small input across the cores first (no-op at
    # scale; see _plan.spread_small_scan). Measured at sf0.1:
    # noop-sunk build 3.09 s → 1.18 s on a 1-row-group lineitem.
    from astro_sdk_spark.functions._plan import spread_small_scan

    df = spread_small_scan(df, cols=[*keys, key_col], per_row_heavy=True)
    k = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("d"), _cell(k, i, width).alias("cell"))
            for i in range(depth)
        ]
    )
    return (
        df.select(*keys, F.explode(pairs).alias("p"))
        .groupBy(*keys, F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(*sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Cell-wise sum of same-shape sketches (different partitions, days,
    corpora) — the mergeability that makes the sketch a distributed
    aggregate rather than a single-pass artifact. Grouped sketches merge
    per group (pass the same ``by``)."""
    if not sketches:
        raise ValueError("at least one sketch required")
    keys = list(by or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys, "d", "cell").agg(F.sum("n").alias("n"))


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    by: list[str] | None = None,
) -> DataFrame:
    """Estimate each key's frequency: min over its ``depth`` counters
    (0 when a cell is absent). Returns ``(*by, key_col, est)``. An
    UNGROUPED sketch is broadcast — it is ≤ depth×width rows by
    construction, a constant bound. A GROUPED sketch is groups×depth×width
    rows with no constant bound (a high-cardinality ``by`` can make it
    arbitrarily large), so the join is left unhinted and AQE picks
    broadcast at runtime only when the actual size allows. For a grouped
    sketch, ``keys`` must carry the ``by`` columns and each (group, key)
    pair is estimated within its group.

    ``width``/``depth`` MUST match the values the sketch was built with
    — cell indices are recomputed mod ``width``, so a mismatch silently
    returns near-zero estimates. Keep the parameters next to the stored
    sketch (they are part of its identity, like an HLL's precision)."""
    if width <= 0 or depth <= 0:
        raise ValueError("width and depth must be positive")
    grp = list(by or [])
    k = F.col(key_col)
    cells = keys.select(
        *grp,
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"), _cell(k, i, width).alias("cell")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select(*grp, key_col, F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
    if grp:
        # null-safe on the group columns: cms_build stores NULL group
        # values as their own group (groupBy semantics), so the probe
        # join must reach them — plain equality would silently estimate 0
        # for every (NULL, key) pair
        cond = [cells[g].eqNullSafe(sketch[g]) for g in grp] + [
            cells["d"] == sketch["d"],
            cells["cell"] == sketch["cell"],
        ]
        joined = cells.join(sketch, cond, "left").select(
            *[cells[g] for g in grp],
            cells[key_col],
            F.coalesce(sketch["n"], F.lit(0)).alias("_n"),
        )
    else:
        joined = cells.join(F.broadcast(sketch), ["d", "cell"], "left").select(
            key_col, F.coalesce(F.col("n"), F.lit(0)).alias("_n")
        )
    return joined.groupBy(*grp, key_col).agg(F.min("_n").alias("est"))
