"""Streaming near-dup corpus ingest (foreachBatch + incremental_near_dup):
stream the documents table in two micro-batches and assert the accepted
corpus equals applying the same admission logic sequentially in batch —
and that the signature store means later batches never re-read the
accepted corpus text."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.dedup import minhash_signatures
from astro_sdk_spark.queries import T
from astro_sdk_spark.streaming.ingest import (
    admit_batch,
    sigs_table_name,
    stream_ingest_neardup,
)

SF = "/root/testdata/sf0.001"
LSH = dict(threshold=0.7, num_hashes=32, bands=8, shingle_k=3)


@pytest.fixture(scope="module")
def docs(spark):
    return T(spark, SF, "documents").cache()


def _drop(spark, name):
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


def _drop_stores(spark, accepted):
    """Drop an accepted table and all of its admission-side stores."""
    from astro_sdk_spark.streaming.ingest import bloom_table_name, keys_table_name

    for t in (
        accepted,
        sigs_table_name(accepted),
        keys_table_name(accepted),
        bloom_table_name(accepted),
    ):
        _drop(spark, t)


def test_stream_ingest_matches_sequential_batches(spark, docs, tmp_path):
    lo = docs.filter(F.col("doc_id") < 250)
    hi = docs.filter(F.col("doc_id") >= 250)

    # expected: sequential admission, batch by batch, against the stored
    # signatures exactly as the stream does
    acc1 = admit_batch(lo, None, **LSH)
    sigs1 = minhash_signatures(acc1, "text", "doc_id", LSH["num_hashes"], LSH["shingle_k"])
    acc2 = admit_batch(hi, None, corpus_sigs=sigs1, **LSH)
    expect = {r.doc_id for r in acc1.select("doc_id").collect()} | {
        r.doc_id for r in acc2.select("doc_id").collect()
    }

    # stream: two files written in order → two availableNow micro-batches
    d = str(tmp_path / "docs_stream")
    lo.coalesce(1).write.mode("overwrite").parquet(d)
    hi.coalesce(1).write.mode("append").parquet(d)

    _drop_stores(spark, "accepted_docs")
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
    # the signature store holds exactly one signature per accepted doc
    sig_ids = {
        r.doc_id
        for r in spark.table(sigs_table_name("accepted_docs")).select("doc_id").collect()
    }
    assert sig_ids == got
    _drop_stores(spark, "accepted_docs")


def test_sig_store_admission_matches_text_path(spark, docs):
    """Batch N admits identically whether the corpus is given as text
    (exact-Jaccard verify) or as stored signatures (estimate verify)."""
    corpus = docs.filter(F.col("doc_id") < 250)
    batch = docs.filter(F.col("doc_id") >= 250)
    via_text = admit_batch(batch, corpus, **LSH)
    sigs = minhash_signatures(corpus, "text", "doc_id", LSH["num_hashes"], LSH["shingle_k"])
    via_sigs = admit_batch(batch, None, corpus_sigs=sigs, **LSH)
    assert {r.doc_id for r in via_text.collect()} == {
        r.doc_id for r in via_sigs.collect()
    }


def test_stream_never_rereads_accepted_text(spark, docs, tmp_path):
    """After batch 1, garble the accepted table's text (keeping ids and the
    signature store). If batch 2 still rejects near-dups of batch-1 docs,
    the corpus text was provably not re-read."""
    lo = docs.filter(F.col("doc_id") < 250)
    # batch 2 = batch 1 resubmitted under new ids → all near-dups of corpus
    resub = lo.withColumn("doc_id", F.col("doc_id") + 10_000)

    d = str(tmp_path / "docs_stream2")
    lo.coalesce(1).write.mode("overwrite").parquet(d)

    _drop_stores(spark, "accepted_g")
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = stream_ingest_neardup(stream, "accepted_g", str(tmp_path / "ckpt_g1"), **LSH)
    q.awaitTermination(300)
    n1 = spark.table("accepted_g").count()
    assert n1 > 0

    # garble the text column in place; signatures stay
    garbled = spark.table("accepted_g").withColumn(
        "text", F.lit("xxxx garbled xxxx")
    )
    garbled.write.mode("overwrite").format("parquet").saveAsTable("accepted_g_tmp")
    _drop(spark, "accepted_g")
    spark.sql("ALTER TABLE accepted_g_tmp RENAME TO accepted_g")

    resub.coalesce(1).write.mode("append").parquet(d)
    q = stream_ingest_neardup(stream, "accepted_g", str(tmp_path / "ckpt_g1"), **LSH)
    q.awaitTermination(300)
    # every resubmitted doc is a near-dup of an accepted doc → rejected,
    # which is only possible if admission used the stored signatures
    final = {r.doc_id for r in spark.table("accepted_g").select("doc_id").collect()}
    assert not {i for i in final if i >= 10_000}
    assert len(final) == n1
    _drop_stores(spark, "accepted_g")


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


def test_clean_batch_quality_and_redaction(spark):
    from astro_sdk_spark.streaming.ingest import clean_batch

    rows = [
        (1, "the cat sat on the mat and it was a fine day for the cat"),
        (2, "short junk"),  # fails the length band of the quality gate
        (3, "write to alice@example.com about the cat on the mat and the fine day it was"),
        (4, "write to bob@other.org about the cat on the mat and the fine day it was"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_batch(df, min_quality=0.5, threshold=0.7)
    got = {r.doc_id: r.text for r in out.collect()}
    # doc 2 gated out on quality; docs 3/4 identical AFTER redaction ->
    # exact dedup keeps only the min id
    assert set(got) == {1, 3}
    assert "[email]" in got[3] and "alice@example.com" not in got[3]


def test_clean_batch_no_redaction_keeps_both(spark):
    from astro_sdk_spark.streaming.ingest import clean_batch

    rows = [
        (3, "write to alice@example.com about the cat on the mat and the fine day it was"),
        (4, "write to bob@other.org about the cat on the mat and the fine day it was"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # Without redaction the two letters differ by one token (jaccard of
    # 3-shingles < 0.7) - both survive; with redaction they collapse.
    out = clean_batch(df, pii_kinds=None, threshold=0.7)
    assert out.count() == 2


def test_stream_clean_ingest_matches_sequential(spark, docs, tmp_path):
    from astro_sdk_spark.streaming.ingest import clean_batch, stream_clean_ingest

    CLEAN = dict(min_quality=0.3, pii_kinds=("email", "ipv4"), **LSH)
    lo = docs.filter(F.col("doc_id") < 250)
    hi = docs.filter(F.col("doc_id") >= 250)

    acc1 = clean_batch(lo, None, "text", "doc_id", **CLEAN)
    sigs1 = minhash_signatures(acc1, "text", "doc_id", LSH["num_hashes"], LSH["shingle_k"])
    acc2 = clean_batch(hi, None, "text", "doc_id", corpus_sigs=sigs1, **CLEAN)
    expect = {r.doc_id for r in acc1.select("doc_id").collect()} | {
        r.doc_id for r in acc2.select("doc_id").collect()
    }

    d = str(tmp_path / "docs_clean_stream")
    lo.coalesce(1).write.mode("overwrite").parquet(d)
    hi.coalesce(1).write.mode("append").parquet(d)

    _drop_stores(spark, "accepted_clean")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = stream_clean_ingest(
        stream, "accepted_clean", str(tmp_path / "ckpt_clean"), **CLEAN
    )
    q.awaitTermination(300)

    got = {r.doc_id for r in spark.table("accepted_clean").select("doc_id").collect()}
    assert got == expect and len(got) > 0
    sig_ids = {
        r.doc_id
        for r in spark.table(sigs_table_name("accepted_clean")).select("doc_id").collect()
    }
    assert sig_ids == got
    _drop_stores(spark, "accepted_clean")


def test_admit_batch_bloom_exact_path(spark, docs):
    """corpus_keys + bloom prefilter: byte-identical resubmissions are
    dropped before (and without) the LSH stage, and non-dup docs pass —
    same admitted set as the signature path for exact dups."""
    from astro_sdk_spark.functions.bloom import build_bloom

    corpus = docs.filter(F.col("doc_id") < 100)
    keys = corpus.select(F.xxhash64("text").alias("_tkey"))
    bloom = build_bloom(keys, "_tkey", n_bits=1 << 16)
    resub = corpus.withColumn("doc_id", F.col("doc_id") + 10_000)
    fresh = spark.createDataFrame(
        [(99_999, "an entirely novel document that matches nothing else at all")],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("x")).withColumn(
        "n_chars", F.length("text")
    ).select(*resub.columns)
    batch = resub.unionByName(fresh)
    admitted = admit_batch(
        batch, None, corpus_keys=keys, corpus_bloom=bloom, **LSH
    )
    assert {r.doc_id for r in admitted.select("doc_id").collect()} == {99_999}


def test_stream_maintains_key_and_bloom_stores(spark, docs, tmp_path):
    """The stream keeps __keys and __bloom next to __sigs, and exact
    resubmissions in batch 2 are rejected via the incremental filter."""
    from astro_sdk_spark.streaming.ingest import bloom_table_name, keys_table_name

    lo = docs.filter(F.col("doc_id") < 150)
    resub = lo.withColumn("doc_id", F.col("doc_id") + 10_000)

    d = str(tmp_path / "docs_stream_bloom")
    lo.coalesce(1).write.mode("overwrite").parquet(d)
    _drop_stores(spark, "accepted_b")
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = stream_ingest_neardup(stream, "accepted_b", str(tmp_path / "ckpt_b"), **LSH)
    q.awaitTermination(300)
    n1 = spark.table("accepted_b").count()
    assert n1 > 0
    assert spark.table(keys_table_name("accepted_b")).count() == n1
    bm = spark.table(bloom_table_name("accepted_b")).head()
    assert bm is not None and len(bm.bitmap) == (1 << 20) // 8

    resub.coalesce(1).write.mode("append").parquet(d)
    q = stream_ingest_neardup(stream, "accepted_b", str(tmp_path / "ckpt_b"), **LSH)
    q.awaitTermination(300)
    final = {r.doc_id for r in spark.table("accepted_b").select("doc_id").collect()}
    assert not {i for i in final if i >= 10_000}
    assert spark.table(keys_table_name("accepted_b")).count() == n1
    _drop_stores(spark, "accepted_b")


def test_clean_batch_classifier_gate(spark):
    from astro_sdk_spark.functions.classifier import train_text_classifier
    from astro_sdk_spark.streaming.ingest import clean_batch

    good = [f"clean prose sentence number {i} reads well" for i in range(10)]
    bad = [f"zz spam junk blob {i} click buy now" for i in range(10)]
    train = spark.createDataFrame(
        [(i, t, 1) for i, t in enumerate(good)]
        + [(100 + i, t, 0) for i, t in enumerate(bad)],
        "doc_id long, text string, y int",
    )
    w = train_text_classifier(train, "y", n_iters=3, lr=1.0, hash_fn="xxhash64")
    batch = spark.createDataFrame(
        [(1000, "clean prose sentence number 99 reads well"),
         (1001, "zz spam junk blob 99 click buy now")],
        "doc_id long, text string",
    )
    admitted = clean_batch(
        batch, None, "text", "doc_id",
        classifier_weights=w, classifier_opts={"hash_fn": "xxhash64"},
    )
    assert {r.doc_id for r in admitted.select("doc_id").collect()} == {1000}


def test_stream_clean_ingest_with_classifier(spark, docs, tmp_path):
    """The model gate rides the streaming path: spammy docs never land."""
    from astro_sdk_spark.functions.classifier import train_text_classifier
    from astro_sdk_spark.streaming.ingest import stream_clean_ingest

    good = [f"useful article text piece {i} with substance" for i in range(10)]
    bad = [f"qq buy click spam now {i} zz" for i in range(10)]
    train = spark.createDataFrame(
        [(i, t, 1) for i, t in enumerate(good)]
        + [(100 + i, t, 0) for i, t in enumerate(bad)],
        "doc_id long, text string, y int",
    )
    w = train_text_classifier(train, "y", n_iters=3, lr=1.0, hash_fn="xxhash64")

    incoming = spark.createDataFrame(
        [(2000, "useful article text piece 42 with substance"),
         (2001, "qq buy click spam now 42 zz")],
        "doc_id long, text string",
    )
    d = str(tmp_path / "docs_clf_stream")
    incoming.coalesce(1).write.mode("overwrite").parquet(d)
    _drop_stores(spark, "accepted_clf")
    stream = spark.readStream.schema(incoming.schema).parquet(d)
    q = stream_clean_ingest(
        stream, "accepted_clf", str(tmp_path / "ckpt_clf"),
        classifier_weights=w, classifier_opts={"hash_fn": "xxhash64"},
    )
    q.awaitTermination(300)
    got = {r.doc_id for r in spark.table("accepted_clf").select("doc_id").collect()}
    assert got == {2000}
    _drop_stores(spark, "accepted_clf")


def test_stream_sketch_ingest_matches_batch_sketch(spark, tmp_path):
    """Per-batch CMS merges over the stream must equal sketching the
    whole corpus at once (the mergeability contract, exercised through
    foreachBatch), and the estimates must bound the true counts."""
    from pyspark.sql import functions as F

    from astro_sdk_spark.functions.cms import cms_build, cms_query
    from astro_sdk_spark.streaming.ops import stream_sketch_ingest

    rows = [(f"k{i % 20}",) for i in range(3000)] + [("hot",)] * 400
    df = spark.createDataFrame(rows, "key string")
    d = str(tmp_path / "sketch_events")
    # several files -> several micro-batches with maxFilesPerTrigger=1
    df.repartition(4).write.parquet(d)

    spark.sql("DROP TABLE IF EXISTS cms_stream_t")
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = stream_sketch_ingest(
        stream, "key", "cms_stream_t", str(tmp_path / "ckpt"),
        width=256, depth=4,
    )
    q.awaitTermination(120)
    try:
        streamed = spark.table("cms_stream_t").select("d", "cell", "n")
        whole = cms_build(df, "key", width=256, depth=4)
        sm = {(r.d, r.cell): r.n for r in streamed.collect()}
        wm = {(r.d, r.cell): r.n for r in whole.collect()}
        assert sm == wm
        est = {
            r.key: r.est
            for r in cms_query(
                streamed, df.select("key").distinct(), "key", 256, 4
            ).collect()
        }
        assert est["hot"] >= 400
    finally:
        spark.sql("DROP TABLE IF EXISTS cms_stream_t")


def test_stream_sketch_parameter_identity_and_fresh_run(spark, tmp_path):
    """Mismatched width/depth is refused; a FRESH checkpoint keeps
    merging onto the accumulated table (its restarted batch ids are not
    replays of the old run)."""
    import pytest as _pytest

    from astro_sdk_spark.streaming.ops import stream_sketch_ingest

    d = str(tmp_path / "ev")
    spark.createDataFrame([("a",)] * 50, "key string").coalesce(1).write.parquet(d)
    spark.sql("DROP TABLE IF EXISTS cms_ident_t")
    try:
        q = stream_sketch_ingest(
            spark.readStream.schema("key string").parquet(d),
            "key", "cms_ident_t", str(tmp_path / "c1"), width=64, depth=2,
        )
        q.awaitTermination(120)
        total1 = spark.table("cms_ident_t").select("n").groupBy().sum().collect()[0][0]

        # wrong parameters refused
        q2 = stream_sketch_ingest(
            spark.readStream.schema("key string").parquet(d),
            "key", "cms_ident_t", str(tmp_path / "c2"), width=128, depth=2,
        )
        with _pytest.raises(Exception, match="incompatible hash spaces"):
            q2.awaitTermination(120)
            if q2.exception():
                raise Exception(str(q2.exception()))

        # fresh checkpoint, same params: batch 0 of the NEW run merges
        # (not swallowed as a replay of old batch ids)
        q3 = stream_sketch_ingest(
            spark.readStream.schema("key string").parquet(d),
            "key", "cms_ident_t", str(tmp_path / "c3"), width=64, depth=2,
        )
        q3.awaitTermination(120)
        total2 = spark.table("cms_ident_t").select("n").groupBy().sum().collect()[0][0]
        assert total2 == 2 * total1
    finally:
        spark.sql("DROP TABLE IF EXISTS cms_ident_t")


def test_stream_quantile_ingest_matches_batch_sketch(spark, tmp_path):
    """Per-batch quantile-sketch merges over the stream must equal
    sketching the whole corpus at once, and the whole-history quantiles
    must come out of the streamed table."""
    from pyspark.sql import functions as F

    from astro_sdk_spark.functions.quantiles import (
        quantile_sketch_build,
        quantile_sketch_query,
    )
    from astro_sdk_spark.streaming.ops import stream_quantile_ingest

    rows = [(float(i % 500),) for i in range(4000)]
    df = spark.createDataFrame(rows, "v double")
    d = str(tmp_path / "qsketch_events")
    df.repartition(4).write.parquet(d)

    spark.sql("DROP TABLE IF EXISTS qsk_stream_t")
    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = stream_quantile_ingest(
        stream, "v", "qsk_stream_t", str(tmp_path / "qckpt"), width=100
    )
    q.awaitTermination(120)
    try:
        streamed = spark.table("qsk_stream_t").select("bucket", "n")
        whole = quantile_sketch_build(df, "v", width=100)
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, whole.collect())
        )
        got = {
            r.q: r.value
            for r in quantile_sketch_query(streamed, [0.5, 0.95], width=100).collect()
        }
        # uniform 0..499 → p50 bucket lower bound ≈ 249, p95 ≈ 474
        assert abs(got[0.5] - 249.0) <= 1.0
        assert abs(got[0.95] - 474.0) <= 1.0
    finally:
        spark.sql("DROP TABLE IF EXISTS qsk_stream_t")


def test_stream_quantile_ingest_parameter_identity(spark, tmp_path):
    from astro_sdk_spark.streaming.ops import stream_quantile_ingest

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    d = str(tmp_path / "qsketch_events2")
    df.write.parquet(d)
    spark.sql("DROP TABLE IF EXISTS qsk_ident_t")
    try:
        s1 = (
            spark.readStream.schema("v double").option("maxFilesPerTrigger", 1).parquet(d)
        )
        stream_quantile_ingest(
            s1, "v", "qsk_ident_t", str(tmp_path / "ck1"), width=100
        ).awaitTermination(60)
        s2 = (
            spark.readStream.schema("v double").option("maxFilesPerTrigger", 1).parquet(d)
        )
        q2 = stream_quantile_ingest(
            s2, "v", "qsk_ident_t", str(tmp_path / "ck2"), width=50
        )
        import pytest as _pytest
        from pyspark.errors.exceptions.captured import StreamingQueryException

        with _pytest.raises(StreamingQueryException, match="incompatible"):
            q2.awaitTermination(60)
            raise AssertionError("expected the width-mismatch merge to fail")
    finally:
        spark.sql("DROP TABLE IF EXISTS qsk_ident_t")


# ---------------------------------------------------------------------------
# Empty-batch policy regression tests (round-8: the shared store contract in
# astro_sdk_spark/streaming/store.py). Coalesce-free on purpose — the round-6/7
# failure mode was an EMPTY first parquet split becoming micro-batch 0, writing
# a 0-row store table whose next-batch meta read died with IndexError.
# ---------------------------------------------------------------------------


def _staged_files(spark, tmp_path, name, frames):
    """Deterministic micro-batch schedule via the library helper (the
    same one q_stream_group_quantiles uses)."""
    from astro_sdk_spark.streaming.testing import stage_microbatch_files

    return stage_microbatch_files(frames, str(tmp_path / name))


def test_stream_quantile_ingest_empty_first_batch(spark, tmp_path):
    """Micro-batch 0 is EMPTY: the store must not be created (no 0-row
    poisoning), and the following non-empty batches must build it to the
    exact whole-data sketch."""
    from astro_sdk_spark.functions.quantiles import quantile_sketch_build
    from astro_sdk_spark.streaming.ops import stream_quantile_ingest

    data = spark.createDataFrame([(float(i),) for i in range(200)], "v double")
    empty = spark.createDataFrame([], "v double")
    d = _staged_files(spark, tmp_path, "q_empty_first", [empty, data])
    spark.sql("DROP TABLE IF EXISTS qsk_ef_t")
    try:
        q = stream_quantile_ingest(
            spark.readStream.schema("v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(d),
            "v", "qsk_ef_t", str(tmp_path / "ck_ef"), width=100,
        )
        assert q.awaitTermination(120)
        assert q.exception() is None
        got = sorted(
            map(tuple, spark.table("qsk_ef_t").select("bucket", "n").collect())
        )
        want = sorted(
            map(tuple, quantile_sketch_build(data, "v", width=100).collect())
        )
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS qsk_ef_t")


def test_stream_quantile_ingest_empty_mid_run(spark, tmp_path):
    """An empty batch BETWEEN non-empty ones is a no-op: the accumulated
    sketch survives it and later batches keep merging."""
    from astro_sdk_spark.functions.quantiles import quantile_sketch_build
    from astro_sdk_spark.streaming.ops import stream_quantile_ingest

    lo = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    hi = spark.createDataFrame([(float(i),) for i in range(100, 200)], "v double")
    empty = spark.createDataFrame([], "v double")
    d = _staged_files(spark, tmp_path, "q_empty_mid", [lo, empty, hi])
    spark.sql("DROP TABLE IF EXISTS qsk_em_t")
    try:
        q = stream_quantile_ingest(
            spark.readStream.schema("v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(d),
            "v", "qsk_em_t", str(tmp_path / "ck_em"), width=100,
        )
        assert q.awaitTermination(120)
        assert q.exception() is None
        got = sorted(
            map(tuple, spark.table("qsk_em_t").select("bucket", "n").collect())
        )
        want = sorted(
            map(tuple, quantile_sketch_build(lo.union(hi), "v", width=100).collect())
        )
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS qsk_em_t")


def test_stream_sketch_ingest_empty_first_and_mid(spark, tmp_path):
    """The CMS twin under the same schedule: empty batch 0, data, empty,
    data — final sketch equals sketching everything at once."""
    from astro_sdk_spark.functions.cms import cms_build
    from astro_sdk_spark.streaming.ops import stream_sketch_ingest

    a = spark.createDataFrame([(f"k{i % 7}",) for i in range(300)], "key string")
    b = spark.createDataFrame([("hot",)] * 50, "key string")
    empty = spark.createDataFrame([], "key string")
    d = _staged_files(spark, tmp_path, "cms_empty", [empty, a, empty, b])
    spark.sql("DROP TABLE IF EXISTS cms_ef_t")
    try:
        q = stream_sketch_ingest(
            spark.readStream.schema("key string")
            .option("maxFilesPerTrigger", 1)
            .parquet(d),
            "key", "cms_ef_t", str(tmp_path / "ck_cms_ef"), width=128, depth=3,
        )
        assert q.awaitTermination(120)
        assert q.exception() is None
        got = {
            (r.d, r.cell): r.n
            for r in spark.table("cms_ef_t").select("d", "cell", "n").collect()
        }
        want = {
            (r.d, r.cell): r.n
            for r in cms_build(a.union(b), "key", width=128, depth=3).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS cms_ef_t")


def test_store_zero_row_table_self_heals(spark, tmp_path):
    """An existing 0-ROW store table (a pre-fix poisoned store, or a crash
    between create and fill) is treated as non-existent: the next batch
    rebuilds it instead of dying on the meta read."""
    from astro_sdk_spark.functions.quantiles import quantile_sketch_build
    from astro_sdk_spark.streaming.ops import stream_quantile_ingest

    spark.sql("DROP TABLE IF EXISTS qsk_poison_t")
    spark.createDataFrame(
        [], "bucket bigint, n bigint, _run_id string, _batch_id long, "
        "_width int, _scale int",
    ).write.format("parquet").saveAsTable("qsk_poison_t")

    data = spark.createDataFrame([(float(i),) for i in range(150)], "v double")
    d = str(tmp_path / "q_poison")
    data.coalesce(1).write.parquet(d)
    try:
        q = stream_quantile_ingest(
            spark.readStream.schema("v double").parquet(d),
            "v", "qsk_poison_t", str(tmp_path / "ck_poison"), width=100,
        )
        assert q.awaitTermination(120)
        assert q.exception() is None
        got = sorted(
            map(tuple, spark.table("qsk_poison_t").select("bucket", "n").collect())
        )
        want = sorted(
            map(tuple, quantile_sketch_build(data, "v", width=100).collect())
        )
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS qsk_poison_t")


def test_stream_quantile_ingest_grouped(spark, tmp_path):
    """by=[...] maintains one sketch per group across batches; the streamed
    store equals the grouped whole-data sketch and grouped quantile queries
    come out of it."""
    from astro_sdk_spark.functions.quantiles import (
        quantile_sketch_build,
        quantile_sketch_query,
    )
    from astro_sdk_spark.streaming.ops import stream_quantile_ingest

    rows = [("svc_a", float(i % 100)) for i in range(1000)] + [
        ("svc_b", float(i % 400)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "service string, latency double")
    lo = df.filter(F.col("latency") < 50)
    hi = df.filter(F.col("latency") >= 50)
    d = _staged_files(spark, tmp_path, "q_grouped", [lo, hi])
    spark.sql("DROP TABLE IF EXISTS qsk_grp_t")
    try:
        q = stream_quantile_ingest(
            spark.readStream.schema("service string, latency double")
            .option("maxFilesPerTrigger", 1)
            .parquet(d),
            "latency", "qsk_grp_t", str(tmp_path / "ck_grp"),
            width=100, by=["service"],
        )
        assert q.awaitTermination(120)
        assert q.exception() is None
        got = sorted(
            map(
                tuple,
                spark.table("qsk_grp_t").select("service", "bucket", "n").collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                quantile_sketch_build(
                    df, "latency", width=100, by=["service"]
                ).collect(),
            )
        )
        assert got == want
        p95 = {
            r.service: r.value
            for r in quantile_sketch_query(
                spark.table("qsk_grp_t").select("service", "bucket", "n"),
                [0.95], width=100, by=["service"],
            ).collect()
        }
        assert p95["svc_a"] <= 100.0 and p95["svc_b"] >= 300.0
    finally:
        spark.sql("DROP TABLE IF EXISTS qsk_grp_t")


def test_stream_quantile_ingest_high_cardinality_stays_off_driver(
    spark, tmp_path, monkeypatch
):
    """Round-9 regression for the grouped store's scale contract: with a
    HIGH-cardinality ``by`` (one group per doc-id-like key), the merge must
    stay distributed — the only driver-side collect during the whole run is
    the 1-row store-metadata read. Under the old implementation every
    micro-batch collected the full groups x buckets sketch to the driver,
    which this test would catch as a multi-thousand-row collect."""
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame

    from astro_sdk_spark.streaming.ops import stream_quantile_ingest

    n_groups = 4000
    rows = [(f"doc{i}", float(i % 97)) for i in range(n_groups)]
    df = spark.createDataFrame(rows, "doc_id string, v double")
    lo = df.filter(F.col("v") < 50)
    hi = df.filter(F.col("v") >= 50)
    d = _staged_files(spark, tmp_path, "q_hicard", [lo, hi])

    collect_sizes: list[int] = []
    real_collect = ClassicDataFrame.collect

    def spying_collect(self):
        out = real_collect(self)
        collect_sizes.append(len(out))
        return out

    spark.sql("DROP TABLE IF EXISTS qsk_hicard_t")
    try:
        monkeypatch.setattr(ClassicDataFrame, "collect", spying_collect)
        q = stream_quantile_ingest(
            spark.readStream.schema("doc_id string, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(d),
            "v", "qsk_hicard_t", str(tmp_path / "ck_hicard"),
            width=10, by=["doc_id"],
        )
        assert q.awaitTermination(180)
        assert q.exception() is None
        monkeypatch.undo()
        assert max(collect_sizes, default=0) <= 1, (
            f"driver-side collect of {max(collect_sizes)} rows during a "
            f"grouped sketch ingest — the merge must stay distributed"
        )
        got_groups = (
            spark.table("qsk_hicard_t").select("doc_id").distinct().count()
        )
        assert got_groups == n_groups
    finally:
        monkeypatch.undo()
        spark.sql("DROP TABLE IF EXISTS qsk_hicard_t")


def test_stream_restart_same_checkpoint_replays_without_double_count(
    spark, tmp_path, monkeypatch
):
    """Driver-restart replay: the stream crashes AFTER the store merged
    micro-batch 1 but BEFORE the checkpoint committed it. A restart from
    the SAME checkpoint replays batch 1 into foreachBatch — the store's
    (_run_id, _batch_id) watermark must skip the replay (no double count)
    while still merging the batches the first run never saw."""
    from astro_sdk_spark.functions.quantiles import quantile_sketch_build
    from astro_sdk_spark.streaming import store as store_mod
    from astro_sdk_spark.streaming.ops import stream_quantile_ingest

    frames = [
        spark.createDataFrame([(float(i),) for i in rng], "v double")
        for rng in (range(0, 100), range(100, 200), range(200, 300))
    ]
    d = _staged_files(spark, tmp_path, "q_restart", frames)
    ckpt = str(tmp_path / "ck_restart")

    real_merge = store_mod.merge_sketch_batch
    crashed = {"done": False}

    def crash_after_merge(spark_, table, run_id, batch_id, batch_df, **kw):
        real_merge(spark_, table, run_id, batch_id, batch_df, **kw)
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash: merged but uncommitted")

    spark.sql("DROP TABLE IF EXISTS qsk_restart_t")
    try:
        monkeypatch.setattr(store_mod, "merge_sketch_batch", crash_after_merge)
        q = stream_quantile_ingest(
            spark.readStream.schema("v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(d),
            "v", "qsk_restart_t", ckpt, width=100,
        )
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination(180)
            if q.exception() is not None:
                raise q.exception()
        assert crashed["done"]
        monkeypatch.undo()

        # restart from the SAME checkpoint: batch 1 replays (skip), batch 2
        # merges fresh
        q2 = stream_quantile_ingest(
            spark.readStream.schema("v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(d),
            "v", "qsk_restart_t", ckpt, width=100,
        )
        assert q2.awaitTermination(180)
        assert q2.exception() is None

        got = sorted(
            map(tuple, spark.table("qsk_restart_t").select("bucket", "n").collect())
        )
        whole = spark.createDataFrame(
            [(float(i),) for i in range(300)], "v double"
        )
        want = sorted(
            map(tuple, quantile_sketch_build(whole, "v", width=100).collect())
        )
        assert got == want
    finally:
        monkeypatch.undo()
        spark.sql("DROP TABLE IF EXISTS qsk_restart_t")


def test_stream_sketch_ingest_grouped_matches_batch(spark, tmp_path):
    """by=[...] on the CMS twin: the streamed grouped sketch equals the
    grouped whole-data build and per-group queries come out of it."""
    from astro_sdk_spark.functions.cms import cms_build, cms_query
    from astro_sdk_spark.streaming.ops import stream_sketch_ingest

    rows = [("svc_a", f"k{i % 5}") for i in range(600)] + [
        ("svc_b", "hot")
    ] * 250 + [("svc_b", f"k{i % 11}") for i in range(300)]
    df = spark.createDataFrame(rows, "service string, key string")
    lo = df.filter(F.col("service") == "svc_a")
    hi = df.filter(F.col("service") == "svc_b")
    d = _staged_files(spark, tmp_path, "cms_grouped", [lo, hi])
    spark.sql("DROP TABLE IF EXISTS cms_grp_t")
    try:
        q = stream_sketch_ingest(
            spark.readStream.schema("service string, key string")
            .option("maxFilesPerTrigger", 1)
            .parquet(d),
            "key", "cms_grp_t", str(tmp_path / "ck_cms_grp"),
            width=128, depth=3, by=["service"],
        )
        assert q.awaitTermination(120)
        assert q.exception() is None
        got = {
            (r.service, r.d, r.cell): r.n
            for r in spark.table("cms_grp_t")
            .select("service", "d", "cell", "n")
            .collect()
        }
        want = {
            (r.service, r.d, r.cell): r.n
            for r in cms_build(
                df, "key", width=128, depth=3, by=["service"]
            ).collect()
        }
        assert got == want
        est = {
            (r.service, r.key): r.est
            for r in cms_query(
                spark.table("cms_grp_t").select("service", "d", "cell", "n"),
                df.select("service", "key").distinct(),
                "key", width=128, depth=3, by=["service"],
            ).collect()
        }
        assert est[("svc_b", "hot")] >= 250
        assert ("svc_a", "hot") not in est
    finally:
        spark.sql("DROP TABLE IF EXISTS cms_grp_t")


def test_sketch_ingest_by_column_collision_raises(spark, tmp_path):
    """by columns that collide with the sketch schema must be rejected
    up front, not silently fold into data_cols."""
    from astro_sdk_spark.streaming.ops import (
        stream_quantile_ingest,
        stream_sketch_ingest,
    )

    spark.createDataFrame([("a", 1.0)], "n string, v double").write.parquet(
        str(tmp_path / "x")
    )
    spark.createDataFrame([("a", "k")], "cell string, k string").write.parquet(
        str(tmp_path / "y")
    )
    s = spark.readStream.schema("n string, v double").parquet(str(tmp_path / "x"))
    with pytest.raises(ValueError, match="collide with the quantile sketch"):
        stream_quantile_ingest(s, "v", "t", str(tmp_path / "c"), by=["n"])
    s2 = spark.readStream.schema("cell string, k string").parquet(str(tmp_path / "y"))
    with pytest.raises(ValueError, match="collide with the CMS sketch"):
        stream_sketch_ingest(s2, "k", "t", str(tmp_path / "c2"), by=["cell"])
