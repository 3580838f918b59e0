"""Deterministic sampling, dataset splitting, and sequence packing for
training-data pipelines.

A 100 TB corpus-prep job needs reproducible, cluster-order-independent
sampling: every decision here is a pure function of the row's key, never
of partition layout, RNG state, or row order. The primitive is a
**60-bit md5-derived bucket** — ``conv(substring(md5(key||salt),1,15),
16,10) % granularity`` — a pure projection (no shuffle, no UDF) that any
engine can reproduce bit-for-bit (DuckDB:
``CAST('0x'||substr(md5(k),1,15) AS BIGINT)``), so the oracle gate can
check these end-to-end.

Reference scope note: astro-sdk has no sampling/packing operators (its
pipelines stop at load/transform/export — ``sql/operators/transform.py``);
these extend the engine for LLM-corpus work per the project brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRANULARITY = 10_000  # bucket space for rate decisions: 0.01% resolution


def hash_bucket(key: Column, salt: str = "", granularity: int = GRANULARITY) -> Column:
    """Deterministic bucket in [0, granularity) from a key column.

    md5 → first 15 hex chars → 60-bit int → mod. Engine-portable (see
    module docstring) and stable across partitioning, ordering, and
    cluster size — the property `df.sample()` does NOT have.
    """
    h = F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15), 16, 10)
    return h.cast("bigint") % granularity


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label ("train"/"val"/"test" by default)
    from a hash of its key — reproducible on any cluster, and stable under
    incremental appends (new rows never move old rows between splits,
    unlike ``randomSplit``). Pure projection: no shuffle, no action.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        cond = bucket < int(round(cum * GRANULARITY))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic, per-stratum fraction of rows (training-mixture
    reweighting: e.g. {"wiki": 1.0, "web": 0.25}). A row survives iff
    ``hash_bucket(key) < fraction*GRANULARITY`` for its stratum — one
    filter, no shuffle, reproducible. Strata absent from ``fractions``
    get ``default_fraction``.

    The small fractions map becomes a literal CASE expression — it rides
    whole-stage codegen; no broadcast join needed at any scale.
    """
    bucket = hash_bucket(F.col(key_col), salt)
    thr = None
    for stratum, frac in fractions.items():
        cond = F.col(stratum_col) == stratum
        lit = F.lit(int(round(frac * GRANULARITY)))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = (
        F.lit(int(round(default_fraction * GRANULARITY)))
        if thr is None
        else thr.otherwise(int(round(default_fraction * GRANULARITY)))
    )
    return df.filter(bucket < thr)


def concat_chunk_pack(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 1024,
    salt: str = "",
) -> DataFrame:
    """GPT-style concat-and-chunk packing: documents are laid on a virtual
    tape (ordered by key within a hash bucket) and the tape is cut every
    ``budget`` tokens; a document's ``pack_id`` is the chunk its first
    token lands in.

    Scale design: one window per bucket (``n_buckets`` independent tapes
    → no global sort, no single-partition window; each bucket's window is
    a partition-local sort after one hash shuffle). Deterministic — bucket
    and order are hash/key-derived — so it is oracle-checkable with the
    same window expression in any SQL engine. Output adds ``bucket``,
    ``pack_id`` (globally unique: bucket * 2^32 + chunk index), and
    ``pack_offset`` (token offset of the doc within its chunk) — enough
    for a shard writer to materialize fixed-width training rows.
    """
    bucket = hash_bucket(F.col(key_col), salt, n_buckets).alias("bucket")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("bucket", bucket)
        .withColumn("tape_end", F.sum(token_col).over(w))
        .withColumn("tape_start", F.col("tape_end") - F.col(token_col))
        .withColumn("chunk", (F.col("tape_start") / F.lit(budget)).cast("bigint"))
        .withColumn(
            "pack_id", F.col("bucket") * F.lit(2**32) + F.col("chunk")
        )
        .withColumn(
            "pack_offset", F.col("tape_start") - F.col("chunk") * F.lit(budget)
        )
        .drop("tape_end", "chunk")
    )
    return out


def pack_greedy(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Greedy first-fit packing (no document splitting): within each hash
    bucket, walk documents in key order and open a new pack whenever the
    current one would exceed ``budget``. Documents longer than ``budget``
    get a pack of their own.

    Sequential by nature, so it runs as an Arrow-batched
    ``applyInPandas`` per bucket — ``n_buckets`` independent groups keep
    every group small and the stage embarrassingly parallel; no state
    crosses buckets. Not expressible as a fixed-depth SQL window (the
    running total resets on overflow), hence the Pandas path; the pytest
    invariants (all docs kept, no pack over budget unless single-doc)
    stand in for the SQL oracle.
    """
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort").reset_index(drop=True)
        b = int(pdf["bucket"].iloc[0])
        pack_ids, cur, used = [], 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                cur += 1
                used = 0
            pack_ids.append(b * 2**32 + cur)
            used += t
        pdf["pack_id"] = pack_ids
        return pdf

    bucketed = df.withColumn("bucket", hash_bucket(F.col(key_col), salt, n_buckets))
    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in bucketed.schema.fields)
    return bucketed.groupBy("bucket").applyInPandas(pack, out_schema + ", pack_id long")


def domain_mix(
    df: DataFrame,
    rates: dict[str, float],
    domain_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-domain downsampling — the mixture-rebalancing
    pass of a pre-training pipeline (e.g. keep 100% of books, 30% of
    common-crawl): a row survives iff its hash bucket falls under its
    domain's keep-rate. Domains absent from ``rates`` use
    ``default_rate``.

    Pure projection (no shuffle, no RNG): decisions are
    ``hash_bucket(key, salt) < rate·granularity`` — reproducible across
    cluster sizes, stable under appends (a new document never flips an
    old one's decision), and engine-portable, so mixtures are auditable
    bit-for-bit. Rates compose with :func:`deterministic_split` under a
    different salt (the decisions are independent)."""
    for d, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {d!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    bucket = hash_bucket(F.col(key_col), salt)
    rate = F.lit(default_rate)
    for d, r in rates.items():
        rate = F.when(F.col(domain_col) == d, F.lit(r)).otherwise(rate)
    return df.filter(bucket < (rate * GRANULARITY).cast("bigint"))
