"""Streaming corpus ingest with near-duplicate filtering.

The production shape for building a 100 TB training corpus: documents
arrive continuously (files here, Kafka at deployment — the transformations
don't change) and each micro-batch is admitted only if it survives

  1. exact self-dedup within the batch (min id per text),
  2. MinHash-LSH near-dup within the batch (drop the higher id of a pair),
  3. MinHash-LSH near-dup against everything already accepted
     (``incremental_near_dup`` — banded NEW×CORPUS bucket join, never a
     corpus self-join),

then survivors append to the accepted table. ``foreachBatch`` is the right
Spark primitive: each step is plain batch DataFrame code (reusing the
tested batch dedup functions), the sink is a transactional-enough table
append per batch, and restarts replay from the checkpoint.

Scale notes: the accepted corpus is read per batch, but only its *minhash
signatures* are needed — at deployment, persist signatures alongside the
corpus (the ``corpus_sigs`` note in ``incremental_near_dup``) so each
batch pays O(|batch| + collisions), not a corpus re-hash. Bucket caps
bound skew from boilerplate-heavy crawls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astro_sdk_spark.functions.dedup import (
    exact_dedup,
    incremental_near_dup,
    minhash_near_dup,
)


def admit_batch(
    batch: DataFrame,
    corpus: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Pure-batch admission logic (unit-testable without a stream): returns
    the subset of ``batch`` that survives exact + near self-dedup and
    near-dedup against ``corpus`` (None = empty corpus)."""
    reps = exact_dedup(batch, text_col, id_col).select(id_col)
    batch = batch.join(reps, on=id_col, how="left_semi")

    self_pairs = minhash_near_dup(
        batch, text_col, id_col,
        num_hashes=num_hashes, bands=bands, threshold=threshold,
        shingle_k=shingle_k,
    )
    losers = self_pairs.select(
        F.greatest("id_a", "id_b").alias(id_col)
    ).distinct()
    batch = batch.join(losers, on=id_col, how="left_anti")

    if corpus is not None:
        flagged = incremental_near_dup(
            batch, corpus, text_col, id_col,
            num_hashes=num_hashes, bands=bands, threshold=threshold,
            shingle_k=shingle_k,
        )
        batch = batch.join(
            flagged.select(F.col("new_id").alias(id_col)).distinct(),
            on=id_col, how="left_anti",
        )
    return batch


def stream_ingest_neardup(
    docs_stream: DataFrame,
    accepted_table: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    trigger_once: bool = True,
):
    """Run the admission pipeline over a streaming source via
    ``foreachBatch``; survivors append to ``accepted_table`` (created on
    first batch). Returns the started StreamingQuery."""

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        corpus = (
            spark.table(accepted_table)
            if spark.catalog.tableExists(accepted_table)
            else None
        )
        admitted = admit_batch(
            batch, corpus, text_col, id_col, threshold,
            num_hashes, bands, shingle_k,
        )
        admitted.write.mode("append").saveAsTable(accepted_table)

    writer = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
