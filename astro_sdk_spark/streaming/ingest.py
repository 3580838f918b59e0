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

Scale design — the signature store: the pipeline maintains
``{accepted_table}__sigs`` (one ``(id, minhash)`` row per accepted doc,
appended as each batch's survivors land). Step 3 bands the STORED
signatures and verifies candidates with the MinHash estimate, so a batch
never re-reads or re-shingles the accepted corpus *text*: per-batch cost is
O(|batch| + collisions) + a scan of the (tiny relative to text) signature
table, regardless of how much has been accepted. If the signature table is
missing (pre-existing corpus, first run), it is backfilled once from the
corpus text. Bucket caps bound skew from boilerplate-heavy crawls; cached
LSH intermediates are released after every batch, so a long-running stream
holds no unbounded executor storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from astro_sdk_spark.functions._cache import release_intermediates
from astro_sdk_spark.functions.dedup import (
    exact_dedup,
    incremental_near_dup,
    minhash_near_dup,
    minhash_signatures,
)


def sigs_table_name(accepted_table: str) -> str:
    return f"{accepted_table}__sigs"


def admit_batch(
    batch: DataFrame,
    corpus: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    corpus_sigs: DataFrame | None = None,
) -> DataFrame:
    """Pure-batch admission logic (unit-testable without a stream): returns
    the subset of ``batch`` that survives exact + near self-dedup and
    near-dedup against the corpus. The corpus may be given as text
    (``corpus``), as stored minhash signatures (``corpus_sigs`` — the text
    is then never read), or both; None/None = empty corpus."""
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

    if corpus is not None or corpus_sigs is not None:
        flagged = incremental_near_dup(
            batch, corpus, text_col, id_col,
            num_hashes=num_hashes, bands=bands, threshold=threshold,
            shingle_k=shingle_k, corpus_sigs=corpus_sigs,
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
    first batch) and their minhash signatures to
    ``{accepted_table}__sigs``, which later batches dedup against instead
    of re-hashing the corpus text. Returns the started StreamingQuery."""
    sigs_table = sigs_table_name(accepted_table)

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        have_sigs = spark.catalog.tableExists(sigs_table)
        have_corpus = spark.catalog.tableExists(accepted_table)
        try:
            if have_corpus and not have_sigs:
                # pre-existing corpus from before the signature store:
                # backfill signatures once (the only full text re-hash)
                minhash_signatures(
                    spark.table(accepted_table), text_col, id_col,
                    num_hashes, shingle_k,
                ).write.mode("append").saveAsTable(sigs_table)
                have_sigs = True
            corpus_sigs = spark.table(sigs_table) if have_sigs else None
            admitted = admit_batch(
                batch, None, text_col, id_col, threshold,
                num_hashes, bands, shingle_k, corpus_sigs=corpus_sigs,
            ).persist()
            admitted.write.mode("append").saveAsTable(accepted_table)
            minhash_signatures(
                admitted, text_col, id_col, num_hashes, shingle_k
            ).write.mode("append").saveAsTable(sigs_table)
            admitted.unpersist()
        finally:
            # LSH candidate sets persisted inside the dedup functions —
            # release per batch or a long-running stream accumulates blocks
            release_intermediates()

    writer = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
