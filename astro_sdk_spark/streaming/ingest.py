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


def keys_table_name(accepted_table: str) -> str:
    return f"{accepted_table}__keys"


def bloom_table_name(accepted_table: str) -> str:
    return f"{accepted_table}__bloom"


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
    corpus_keys: DataFrame | None = None,
    corpus_bloom: bytes | None = None,
) -> DataFrame:
    """Pure-batch admission logic (unit-testable without a stream): returns
    the subset of ``batch`` that survives exact + near self-dedup and
    near-dedup against the corpus. The corpus may be given as text
    (``corpus``), as stored minhash signatures (``corpus_sigs`` — the text
    is then never read), or both; None/None = empty corpus.

    ``corpus_keys`` (one ``_tkey`` bigint column: xxhash64 of accepted
    text) + ``corpus_bloom`` (its bitmap, maintained incrementally by the
    stream) enable the exact-dup fast path: byte-identical re-crawls —
    the dominant duplicate class in web data — are dropped by a broadcast
    bitmap probe BEFORE paying shingling + the LSH band join. Exactness
    is unchanged (an exact dup has an identical minhash signature, so the
    LSH stage would flag it deterministically anyway); the bloom stage
    only moves the drop earlier and off the shuffle."""
    reps = exact_dedup(batch, text_col, id_col).select(id_col)
    batch = batch.join(reps, on=id_col, how="left_semi")

    if corpus_keys is not None:
        from astro_sdk_spark.functions.bloom import bloom_dedup

        keyed = batch.withColumn("_tkey", F.xxhash64(F.col(text_col)))
        batch = bloom_dedup(
            keyed, corpus_keys, "_tkey", bloom=corpus_bloom
        ).drop("_tkey")

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
    keys_table = keys_table_name(accepted_table)
    bloom_table = bloom_table_name(accepted_table)
    bloom_bits = 1 << 20  # ~131 KB bitmap; size up with expected corpus

    def process(batch: DataFrame, batch_id: int) -> None:
        import numpy as np

        from astro_sdk_spark.functions.bloom import build_bloom

        spark = batch.sparkSession
        have_sigs = spark.catalog.tableExists(sigs_table)
        have_corpus = spark.catalog.tableExists(accepted_table)
        have_keys = spark.catalog.tableExists(keys_table)
        try:
            if have_corpus and not have_sigs:
                # pre-existing corpus from before the signature store:
                # backfill signatures once (the only full text re-hash)
                minhash_signatures(
                    spark.table(accepted_table), text_col, id_col,
                    num_hashes, shingle_k,
                ).write.mode("append").saveAsTable(sigs_table)
                have_sigs = True
            if have_corpus and not have_keys:
                # same backfill for the exact-dup key store
                spark.table(accepted_table).select(
                    F.xxhash64(F.col(text_col)).alias("_tkey")
                ).write.mode("append").saveAsTable(keys_table)
                have_keys = True
            corpus_sigs = spark.table(sigs_table) if have_sigs else None
            corpus_keys = spark.table(keys_table) if have_keys else None
            corpus_bloom = None
            if have_keys and spark.catalog.tableExists(bloom_table):
                row = spark.table(bloom_table).head()
                if row is not None and len(row.bitmap) * 8 == bloom_bits:
                    corpus_bloom = bytes(row.bitmap)
            admitted = admit_batch(
                batch, None, text_col, id_col, threshold,
                num_hashes, bands, shingle_k, corpus_sigs=corpus_sigs,
                corpus_keys=corpus_keys, corpus_bloom=corpus_bloom,
            ).persist()
            admitted.write.mode("append").saveAsTable(accepted_table)
            minhash_signatures(
                admitted, text_col, id_col, num_hashes, shingle_k
            ).write.mode("append").saveAsTable(sigs_table)
            new_keys = admitted.select(
                F.xxhash64(F.col(text_col)).alias("_tkey")
            )
            new_keys.write.mode("append").saveAsTable(keys_table)
            # incremental bitmap: OR the admitted batch's bits into the
            # stored filter — the corpus key table is never re-scanned
            batch_bloom = build_bloom(new_keys, "_tkey", n_bits=bloom_bits)
            if corpus_bloom is not None:
                merged = (
                    np.frombuffer(corpus_bloom, dtype=np.uint8)
                    | np.frombuffer(batch_bloom, dtype=np.uint8)
                ).tobytes()
            else:
                merged = batch_bloom
            # 1-slice parallelize: a 1-row createDataFrame(list) fans the
            # write across ~#cores task commits (ann_index._one_slice's
            # measured pattern) — one slice, one file, one commit
            spark.createDataFrame(
                spark.sparkContext.parallelize([(bytearray(merged),)], 1),
                "bitmap binary",
            ).write.mode("overwrite").saveAsTable(bloom_table)
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


def clean_batch(
    batch: DataFrame,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.0,
    pii_kinds: tuple[str, ...] | None = ("email", "ipv4", "ssn", "phone"),
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    corpus_sigs: DataFrame | None = None,
    classifier_weights: DataFrame | None = None,
    classifier_min_score: float = 0.5,
    classifier_opts: dict | None = None,
) -> DataFrame:
    """Full cleaning admission for one batch: quality gate → model gate →
    PII redaction → exact/near self-dedup → near-dedup vs corpus
    (``admit_batch``).

    The heuristic gate and the redaction are pure Column expressions
    folded into one projection (no joins): ``quality_score_col`` filters,
    ``redact_col`` rewrites ``text_col`` IN PLACE before any hashing — so
    dedup operates on redacted text, and two documents identical up to
    their embedded PII (the same form letter sent to different addresses)
    correctly collapse to one.

    ``classifier_weights`` (a :func:`~astro_sdk_spark.functions.
    classifier.train_text_classifier` table) adds the model-based gate
    between the cheap heuristic and redaction: the batch is scored via
    the broadcast ≤n_buckets-row model (pass matching ``n_buckets``/
    ``shingle_k``/``hash_fn`` through ``classifier_opts``) and rows below
    ``classifier_min_score`` drop. Scoring is per-batch work against a
    FIXED model — the corpus never re-scores, so the ingest-loop
    economics are unchanged."""
    from astro_sdk_spark.functions.cleaning import redact_col
    from astro_sdk_spark.functions.text import quality_score_col

    if min_quality > 0.0:
        batch = batch.filter(quality_score_col(F.col(text_col)) >= min_quality)
    if classifier_weights is not None:
        from astro_sdk_spark.functions.classifier import score_text_classifier

        keep_ids = (
            score_text_classifier(
                batch, classifier_weights, text_col, id_col,
                **(classifier_opts or {}),
            )
            .filter(F.col("score") >= classifier_min_score)
            .select(id_col)
        )
        batch = batch.join(keep_ids, id_col, "left_semi")
    if pii_kinds:
        batch = batch.withColumn(text_col, redact_col(F.col(text_col), pii_kinds))
    return admit_batch(
        batch, corpus, text_col, id_col, threshold,
        num_hashes, bands, shingle_k, corpus_sigs=corpus_sigs,
    )


def stream_clean_ingest(
    docs_stream: DataFrame,
    accepted_table: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.0,
    pii_kinds: tuple[str, ...] | None = ("email", "ipv4", "ssn", "phone"),
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    trigger_once: bool = True,
    classifier_weights: DataFrame | None = None,
    classifier_min_score: float = 0.5,
    classifier_opts: dict | None = None,
):
    """End-to-end streaming corpus builder: every micro-batch is quality-
    gated, PII-redacted, self-deduped, and near-deduped against everything
    already accepted, then appended (with its signatures) to
    ``accepted_table`` — the one pipeline a training-data team actually
    deploys. Identical signature-store economics to
    :func:`stream_ingest_neardup`: per-batch cost is O(batch + collisions);
    the accepted corpus text is never re-read."""
    sigs_table = sigs_table_name(accepted_table)

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        have_sigs = spark.catalog.tableExists(sigs_table)
        have_corpus = spark.catalog.tableExists(accepted_table)
        try:
            if have_corpus and not have_sigs:
                minhash_signatures(
                    spark.table(accepted_table), text_col, id_col,
                    num_hashes, shingle_k,
                ).write.mode("append").saveAsTable(sigs_table)
                have_sigs = True
            corpus_sigs = spark.table(sigs_table) if have_sigs else None
            admitted = clean_batch(
                batch, None, text_col, id_col, min_quality, pii_kinds,
                threshold, num_hashes, bands, shingle_k,
                corpus_sigs=corpus_sigs,
                classifier_weights=classifier_weights,
                classifier_min_score=classifier_min_score,
                classifier_opts=classifier_opts,
            ).persist()
            admitted.write.mode("append").saveAsTable(accepted_table)
            minhash_signatures(
                admitted, text_col, id_col, num_hashes, shingle_k
            ).write.mode("append").saveAsTable(sigs_table)
            admitted.unpersist()
        finally:
            release_intermediates()

    writer = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
