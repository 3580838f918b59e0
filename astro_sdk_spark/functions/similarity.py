"""Embedding similarity search — brute-force cosine top-k + LSH-bucketed ANN.

No reference counterpart (astro-sdk delegates all compute to the warehouse);
these are the LLM-data-pipeline extensions required alongside SURVEY §2.

Scale design:
- Cosine math uses Spark *higher-order functions* (``zip_with`` +
  ``aggregate``) — evaluated JVM-side inside whole-stage codegen, no Python
  in the hot path.
- ``cosine_topk`` broadcasts the (small) query set against the (huge)
  candidate set, so the only wide op is the final per-query top-k, done with
  a window over ``query_id`` — shuffle size = |queries| × |candidates kept|.
- ``lsh_bucket_join`` is the scale path: random-hyperplane signatures
  (SimHash for real vectors) computed JVM-side, candidates compared only
  within matching bands — turns O(Q×N) into O(Q×N/2^bits) per band.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_similarity_col(a, b):
    """Cosine similarity between two array<float> columns — pure built-ins."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k: every query scored against every candidate.

    Returns (query_id, cand_id, cosine, rank). The query side is broadcast —
    keep it small (this is the exact baseline; use lsh_bucket_join at scale).
    Rank is deterministic: ties broken by candidate id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("_cvec")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id")).select(
        "query_id",
        "cand_id",
        cosine_similarity_col(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
    )
    if round_digits is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_digits))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def signature_col(vec_col, planes: list[list[float]]):
    """SimHash signature of a vector column: one bit per hyperplane, packed
    into a long. Pure built-ins (no UDF) — each bit is sign(dot(v, plane))."""
    bit_exprs = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = _dot(vec_col, lit_plane)
        bit_exprs.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = F.lit(0).cast("long")
    for e in bit_exprs:
        out = out + e.cast("long")
    return out


def lsh_bucket_join(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    bands: int = 4,
    k: int = 10,
    seed: int = 42,
) -> DataFrame:
    """ANN: compare query/candidate pairs only when they share an LSH bucket
    in at least one band, then exact-rescore the survivors. At 100 TB the
    bucket join shuffles on (band, signature) — uniformly distributed keys,
    no skew — instead of exploding the cross product."""
    all_planes = random_hyperplanes(dim, bits * bands, seed)

    def with_bands(df: DataFrame, prefix: str) -> DataFrame:
        rows = []
        for b in range(bands):
            planes = all_planes[b * bits : (b + 1) * bits]
            rows.append(
                df.select(
                    F.col(id_col).alias(f"{prefix}_id"),
                    F.col(vec_col).alias(f"_{prefix}vec"),
                    F.lit(b).alias("band"),
                    signature_col(F.col(vec_col), planes).alias("sig"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    qb = with_bands(queries, "q")
    cb = with_bands(candidates, "c")
    pairs = (
        qb.join(cb, on=["band", "sig"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", "_qvec", "_cvec")
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = pairs.select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("cand_id"),
        cosine_similarity_col(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
