"""Int8 scalar quantization for embedding columns — the fourth point in
the vector-compression family (flat → IVF → PQ → SQ8).

Scheme (the int8-cosine quantization used by sentence-transformers /
FAISS ``SQ8`` over normalized vectors): L2-normalize each vector, then
``c_i = floor(x_i / ‖x‖ · 127 + ½) ∈ [−127, 127]``. A 64-dim float
vector becomes 64 signed bytes (4× smaller than float32), and similarity
is the integer code dot ``Σ c(q)_i · c(x)_i ≈ 127² · cosine(q, x)`` —
monotone with cosine up to quantization error, measured by the recall
test in tests/test_sq.py.

Because every score is an exact INTEGER sum, ranking is reduction-order-
independent — bit-identical on any cluster layout and in any SQL engine
(queries.q_sq8_topk replays encode → score → rank in DuckDB with zero
float tolerance in the ranking path; the only float op is the per-row
normalization, whose operands never cross rows).

Scale shape:
- encoding is a shuffle-free projection (per-element HOF transform fused
  into the scan stage); at 100 TB the byte codes are what persists and
  shuffles, never the float vectors.
- scoring broadcasts the query codes (the exact-baseline shape shared
  with cosine_topk); at corpus scale, compose with the IVF router
  (similarity.ivf_topk) so only probed partitions are scanned.
- integer dots stay inside whole-stage codegen — no Arrow boundary
  anywhere in the SQ path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sq_code_col", "sq_encode", "sq_topk"]


def sq_code_col(vec_col, bits: int = 8, norm_col: Column | None = None) -> Column:
    """Signed int code array for one vector column: L2-normalize, scale by
    ``2^(bits−1) − 1``, round half-up. Zero vectors code to all-zero.
    The float element is cast to double BEFORE any arithmetic (the cosine
    float32→double contract).

    Pass ``norm_col`` (a column already holding the L2 norm) whenever
    possible: Spark re-evaluates subtrees captured by HOF lambdas on
    EVERY element call, so an inlined norm makes encoding O(d²) per row
    (the shingles_col lesson) — a materialized norm column keeps it
    O(d). :func:`sq_encode` does this automatically."""
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    half = float(2 ** (bits - 1) - 1)
    v = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    dv = F.transform(v, lambda x: x.cast("double"))
    norm = sq_norm_col(v) if norm_col is None else norm_col
    return F.transform(
        dv,
        lambda x: F.when(
            norm > 0, F.floor(x / norm * F.lit(half) + F.lit(0.5))
        ).otherwise(F.lit(0).cast("bigint")),
    )


def sq_norm_col(vec_col) -> Column:
    """L2 norm of a vector column (elements cast to double first)."""
    v = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    dv = F.transform(v, lambda x: x.cast("double"))
    return F.sqrt(
        F.aggregate(
            F.transform(dv, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def sq_encode(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "sq_code",
    bits: int = 8,
) -> DataFrame:
    """(id, code) table — the compressed representation that persists and
    shuffles in place of the float vectors. Two-step projection: the norm
    materializes once per row, then the per-element lambda references it
    as a plain column (O(d) per row, not O(d²))."""
    staged = df.select(
        F.col(id_col),
        F.col(vec_col),
        sq_norm_col(F.col(vec_col)).alias("_nrm"),
    )
    return staged.select(
        F.col(id_col),
        sq_code_col(F.col(vec_col), bits, norm_col=F.col("_nrm")).alias(code_col),
    )


def sq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
) -> DataFrame:
    """Quantized cosine top-k: both sides encoded, score = integer dot of
    code arrays (exact — no float in the ranking path), ties broken by
    candidate id. Returns (query_id, cand_id, score, rank)."""
    q = sq_encode(queries, vec_col, id_col, bits=bits).select(
        F.col(id_col).alias("query_id"), F.col("sq_code").alias("_qc")
    )
    c = sq_encode(candidates, vec_col, id_col, bits=bits).select(
        F.col(id_col).alias("cand_id"), F.col("sq_code").alias("_cc")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id")).select(
        "query_id",
        "cand_id",
        F.aggregate(
            F.zip_with("_qc", "_cc", lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
