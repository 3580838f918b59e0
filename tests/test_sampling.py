"""functions/sampling.py: deterministic splits, stratified sampling, and
sequence packing. The md5-bucket queries are oracle-checked end-to-end
(q_train_split / q_stratified_sample / q_seq_packing); these tests cover
the properties the SQL oracle can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.sampling import (
    concat_chunk_pack,
    deterministic_split,
    hash_bucket,
    pack_greedy,
    stratified_sample,
)
from astro_sdk_spark.queries import T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        T(spark, SF, "documents")
        .withColumn("n_tokens", F.size(F.split(F.col("text"), " ")))
        .cache()
    )


def test_split_stable_under_append(spark, docs):
    """New rows must never move existing rows between splits."""
    half = docs.filter(F.col("doc_id") < 250)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {
        r.doc_id: r.split
        for r in deterministic_split(docs, "doc_id", w).select("doc_id", "split").collect()
    }
    part = {
        r.doc_id: r.split
        for r in deterministic_split(half, "doc_id", w).select("doc_id", "split").collect()
    }
    assert part == {k: v for k, v in full.items() if k < 250}
    assert set(full.values()) == {"train", "val", "test"}


def test_split_weights_validated(docs):
    with pytest.raises(ValueError, match="sum to 1.0"):
        deterministic_split(docs, "doc_id", {"a": 0.5, "b": 0.6})


def test_stratified_fraction_bounds(docs):
    """fraction 1.0 keeps everything; 0.0 default drops unlisted strata."""
    kept = stratified_sample(
        docs, "source", {"src0": 1.0}, key_col="doc_id", default_fraction=0.0
    )
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert kept.count() == n_src0
    assert kept.select("source").distinct().collect()[0][0] == "src0"


def test_hash_bucket_partition_independent(spark, docs):
    a = docs.coalesce(1).select("doc_id", hash_bucket(F.col("doc_id")).alias("b"))
    b = docs.repartition(16).select("doc_id", hash_bucket(F.col("doc_id")).alias("b"))
    assert {(r.doc_id, r.b) for r in a.collect()} == {
        (r.doc_id, r.b) for r in b.collect()
    }


def test_concat_chunk_pack_offsets(docs):
    out = concat_chunk_pack(docs, "doc_id", "n_tokens", budget=512, n_buckets=4)
    rows = out.select("bucket", "doc_id", "n_tokens", "pack_id", "pack_offset").collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r.pack_offset < 512
        assert r.pack_id >> 32 == r.bucket
    # within a bucket the tape is contiguous: total tokens == last end
    agg = (
        out.groupBy("bucket")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max(F.col("tape_start") + F.col("n_tokens")).alias("tape_end"),
        )
        .collect()
    )
    for r in agg:
        assert r.tot == r.tape_end


def test_pack_greedy_invariants(docs):
    budget = 512
    out = pack_greedy(docs, "doc_id", "n_tokens", budget=budget, n_buckets=4).cache()
    # every doc survives exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # no pack exceeds budget unless it is a single over-long doc
    packs = (
        out.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert packs
    for p in packs:
        assert p.fill <= budget or p.n == 1
    # packing is reasonably tight: average fill of multi-doc packs > 50%
    multi = [p.fill for p in packs if p.n > 1]
    if multi:
        assert sum(multi) / len(multi) > budget * 0.5
    out.unpersist()


def test_pack_greedy_matches_reference_walk(spark):
    """Tiny hand-checkable case on one bucket."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate([300, 300, 300, 700, 100, 900])],
        "doc_id long, n_tokens long",
    )
    out = pack_greedy(df, "doc_id", "n_tokens", budget=600, n_buckets=1)
    got = {r.doc_id: r.pack_id & 0xFFFFFFFF for r in out.collect()}
    # walk: 300 | 300+300 no (600 fits!) — 300,300=600 pack0; 300 pack1;
    # 700 alone pack2 (over budget, own pack); 100 pack... 700>600 so new
    # pack; then 100 starts pack3? greedy: after 700 (pack2, used=700),
    # 100 would exceed → pack3; 900 exceeds → pack4
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
