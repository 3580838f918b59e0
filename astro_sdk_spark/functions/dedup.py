"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
near-dup.

No reference counterpart (extensions mandated alongside SURVEY §2). All
signature computation is built-in expressions (shingles via ``slice``/
``transform``, hashing via ``xxhash64``) — JVM-side, codegen, no Python UDF.

Scale design:
- exact dedup = groupBy(hash) keeping min id — one shuffle on a uniform key;
- MinHash LSH: per-band bucket join, so candidate pairs ~ O(n · collisions)
  instead of O(n²); the band/bucket shuffle key is uniform by construction;
- verification joins re-fetch only candidate pair texts (semi-join pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per exact text; returns
    (doc_id, n_copies) — the kept id and its duplicate count."""
    return (
        df.groupBy(text_col)
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "n_copies")
    )


def shingles_col(text, k: int = 3):
    """Word k-shingles of a text column — array built-ins only."""
    toks = F.split(F.lower(text), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, minhash array<long>): h_i(doc) = min over shingles of
    xxhash64(shingle, seed=i). Seeded xxhash64 is emulated by hashing the
    shingle with a per-function salt literal."""
    sh = shingles_col(F.col(text_col), shingle_k).alias("_sh")
    base = df.select(F.col(id_col), sh)

    def _minhash(i: int):
        return F.array_min(F.transform(F.col("_sh"), lambda s: F.xxhash64(s, F.lit(i))))

    mh = F.array(*[_minhash(i) for i in range(num_hashes)])
    return base.select(F.col(id_col), mh.alias("minhash"))


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Banded LSH over minhash signatures → candidate near-dup pairs
    (id_a < id_b). Pairs sharing ≥1 band bucket survive."""
    rows_per_band = num_hashes // bands
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("minhash", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        ),
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B| via
    array_intersect/array_union (verification pass after LSH)."""
    sh = df.select(F.col(id_col), shingles_col(F.col(text_col), shingle_k).alias("_sh"))
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sa"), on="id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_sb"), on="id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("_sa", "_sb"))
                / F.size(F.array_union("_sa", "_sb"))
            ).alias("jaccard"),
        )
    )
    return out


def minhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    shingle_k: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: minhash → banded LSH → exact Jaccard verify.
    Returns (id_a, id_b, jaccard) pairs above threshold."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    cands = minhash_lsh_candidates(sigs, id_col, num_hashes, bands)
    return jaccard_pairs(df, cands, text_col, id_col, shingle_k).filter(
        F.col("jaccard") >= threshold
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
) -> DataFrame:
    """(id, simhash): 64-bit SimHash over word shingles.

    Implemented as explode → xxhash64 once per shingle → ONE vectorized
    hash-aggregate with 64 per-bit vote sums (Σ of bit ? 1 : -1), then the
    bits are packed. Single shuffle on the doc id; per-bit work stays inside
    whole-stage codegen. (A per-row 64×aggregate-over-array expression is
    ~100× slower — Catalyst does not CSE the shingle array across lambdas.)
    """
    exploded = df.select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), shingle_k)).alias("_sh")
    ).select(F.col(id_col), F.xxhash64("_sh").alias("_h"))
    votes = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_v{i}")
            for i in range(64)
        ]
    )
    out = F.lit(0).cast("long")
    for i in range(64):
        # shiftleft instead of a lit(1 << i): 1 << 63 overflows a JVM long
        bit = F.shiftleft(F.lit(1).cast("long"), i)
        out = out + F.when(F.col(f"_v{i}") > 0, bit).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), out.alias("simhash"))


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_k: int = 2,
) -> DataFrame:
    """SimHash near-dup: block on 4 x 16-bit sub-keys (any pair within
    hamming distance 3 must agree exactly on ≥1 of 4 blocks — pigeonhole),
    verify candidates with exact popcount."""
    hashed = simhash_signatures(df, text_col, id_col, shingle_k)
    blocked = hashed.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).cast("long")
                    for b in range(4)
                ]
            )
        ).alias("block", "key"),
    )
    a = blocked.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"), "block", "key")
    b = blocked.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"), "block", "key")
    cands = (
        a.join(b, on=["block", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    xor = F.col("h_a").bitwiseXOR(F.col("h_b"))
    hamming = F.bit_count(xor)
    return cands.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 12,
    bands: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup via the similarity module's LSH bucket join:
    pairs with cosine ≥ threshold."""
    from astro_sdk_spark.functions.similarity import (
        cosine_similarity_col,
        random_hyperplanes,
        signature_col,
    )

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, bits * bands, seed)
    rows = []
    for b in range(bands):
        p = planes[b * bits : (b + 1) * bits]
        rows.append(
            df.select(
                F.col(id_col),
                F.col(vec_col),
                F.lit(b).alias("band"),
                signature_col(F.col(vec_col), p).alias("sig"),
            )
        )
    banded = rows[0]
    for r in rows[1:]:
        banded = banded.unionByName(r)
    a = banded.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "band", "sig")
    b = banded.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "band", "sig")
    cands = (
        a.join(b, on=["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return cands.select(
        "id_a", "id_b", cosine_similarity_col(F.col("_va"), F.col("_vb")).alias("cosine")
    ).filter(F.col("cosine") >= threshold)
