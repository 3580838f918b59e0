"""Int8 scalar quantization: code-range contracts, determinism, and ANN
quality (recall vs exact cosine)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.similarity import cosine_topk
from astro_sdk_spark.functions.sq import sq_code_col, sq_encode, sq_topk

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_codes_in_int8_range(spark):
    emb = _emb(spark)
    stats = sq_encode(emb).select(
        F.min(F.array_min("sq_code")).alias("lo"),
        F.max(F.array_max("sq_code")).alias("hi"),
    ).collect()[0]
    assert -127 <= stats["lo"] <= stats["hi"] <= 127


def test_unit_axis_vector_codes_to_full_scale(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 0.0]), (2, [0.0, -5.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r["sq_code"] for r in sq_encode(df).collect()}
    assert rows[1] == [127, 0]  # direction, not magnitude, is what codes
    assert rows[2] == [0, -127]
    assert rows[3] == [0, 0]  # zero vector guarded, no NaN


def test_codes_are_magnitude_invariant(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, -3.0]), (2, [10.0, 20.0, -30.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r["sq_code"] for r in sq_encode(df).collect()}
    assert rows[1] == rows[2]


def test_bits_validation(spark):
    with pytest.raises(ValueError, match="bits"):
        sq_code_col(F.col("embedding"), bits=1)


def test_sq8_recall_vs_exact_cosine(spark):
    """Compressed 64-byte codes must still retrieve most of the true
    top-10: recall@10 ≥ 0.8 on the synthetic embeddings (the floor guards
    against a quantization regression)."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    approx = sq_topk(queries, emb, k=10)
    exact = cosine_topk(queries, emb, k=10, round_digits=4)
    a = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.8, f"SQ8 recall@10 collapsed: {recall:.3f}"
