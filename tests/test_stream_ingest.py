"""Streaming near-dup corpus ingest (foreachBatch + incremental_near_dup):
stream the documents table in two micro-batches and assert the accepted
corpus equals applying the same admission logic sequentially in batch."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.queries import T
from astro_sdk_spark.streaming.ingest import admit_batch, stream_ingest_neardup

SF = "/root/testdata/sf0.001"
LSH = dict(threshold=0.7, num_hashes=32, bands=8, shingle_k=3)


@pytest.fixture(scope="module")
def docs(spark):
    return T(spark, SF, "documents").cache()


def _drop(spark, name):
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


def test_stream_ingest_matches_sequential_batches(spark, docs, tmp_path):
    lo = docs.filter(F.col("doc_id") < 250)
    hi = docs.filter(F.col("doc_id") >= 250)

    # expected: sequential admission, batch by batch
    acc1 = admit_batch(lo, None, **LSH)
    acc2 = admit_batch(hi, acc1, **LSH)
    expect = {r.doc_id for r in acc1.select("doc_id").collect()} | {
        r.doc_id for r in acc2.select("doc_id").collect()
    }

    # stream: two files written in order → two availableNow micro-batches
    d = str(tmp_path / "docs_stream")
    lo.coalesce(1).write.mode("overwrite").parquet(d)
    hi.coalesce(1).write.mode("append").parquet(d)

    _drop(spark, "accepted_docs")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = stream_ingest_neardup(
        stream, "accepted_docs", str(tmp_path / "ckpt"), **LSH
    )
    q.awaitTermination(300)

    got = {r.doc_id for r in spark.table("accepted_docs").select("doc_id").collect()}
    assert got == expect
    # sanity: the pipeline actually rejected something (corpus has
    # engineered near-dups), and kept most docs
    assert len(got) < docs.count()
    assert len(got) > docs.count() * 0.5
    _drop(spark, "accepted_docs")


def test_admit_batch_rejects_near_dups_of_corpus(spark, docs):
    corpus = docs.filter(F.col("doc_id") < 100)
    # resubmitting the identical docs under new ids must all be rejected
    resub = corpus.withColumn("doc_id", F.col("doc_id") + 10_000)
    admitted = admit_batch(resub, corpus, **LSH)
    assert admitted.count() == 0


def test_admit_batch_empty_corpus_keeps_unique_docs(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
         (3, "an entirely different document about spark and parquet")],
        "doc_id long, text string",
    )
    admitted = admit_batch(df, None, **LSH)
    assert {r.doc_id for r in admitted.collect()} == {1, 3}
