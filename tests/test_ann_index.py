"""Persisted ANN index (functions/ann_index.py).

Contracts under test: (1) a two-batch incremental build answers queries
EXACTLY like the in-query one-shot ivf_topk — the equivalence that makes
index persistence safe; (2) re-adding already-indexed ids is a no-op
(idempotent adds); (3) geometry mismatches fail loudly instead of
poisoning the lists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.ann_index import (
    ann_index_add,
    ann_index_topk,
    build_ann_index,
    drop_ann_index,
)
from astro_sdk_spark.functions.similarity import ivf_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(map(tuple, df.select("query_id", "cand_id", "cosine", "rank").collect()))


@pytest.fixture()
def idx(spark):
    name = "t_ann_idx"
    drop_ann_index(spark, name)
    yield name
    drop_ann_index(spark, name)


def test_incremental_build_equals_one_shot(spark, emb, idx):
    cents = emb.filter(F.col("vec_id") < 16)
    build_ann_index(spark, emb.filter(F.col("vec_id") % 2 == 0), idx, cents)
    ann_index_add(spark, emb.filter(F.col("vec_id") % 2 == 1), idx)
    got = ann_index_topk(spark, emb.filter(F.col("vec_id") < 8), idx, nprobe=4, k=10)
    want = ivf_topk(
        emb.filter(F.col("vec_id") < 8), emb, centroids=cents, nprobe=4, k=10
    )
    assert _rows(got) == _rows(want)


def test_add_is_idempotent(spark, emb, idx):
    cents = emb.filter(F.col("vec_id") < 16)
    batch = emb.filter(F.col("vec_id") % 2 == 0)
    build_ann_index(spark, batch, idx, cents)
    n_before = spark.table(f"{idx}__lists").count()
    ann_index_add(spark, batch, idx)  # same ids again
    assert spark.table(f"{idx}__lists").count() == n_before


def test_every_vector_lands_in_exactly_one_list(spark, emb, idx):
    build_ann_index(spark, emb, idx, emb.filter(F.col("vec_id") < 16))
    lists = spark.table(f"{idx}__lists")
    assert lists.count() == emb.count()
    assert lists.select("cand_id").distinct().count() == emb.count()


def test_probe_scan_prunes_unprobed_list_partitions(spark, emb, idx):
    """The 100 TB payoff of the directory-per-centroid layout: a probe of
    nprobe lists must OPEN only those partitions' files. Measured the
    same way file_skip_report measures clustering: distinct
    input_file_name() counts."""
    build_ann_index(spark, emb, idx, emb.filter(F.col("vec_id") < 16))
    lists = spark.table(f"{idx}__lists")
    total_files = lists.select(F.input_file_name()).distinct().count()
    probed = lists.filter(F.col("cent_id").isin([0, 1])).select(
        F.input_file_name()
    ).distinct().count()
    assert probed < total_files, (total_files, probed)
    # and the partition filter shows up as pruning in the scan plan
    plan = lists.filter(F.col("cent_id").isin([0, 1]))._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def _codebooks_from(emb):
    cw = (
        emb.filter(F.col("vec_id") < 16).orderBy("vec_id")
        .select("embedding").collect()
    )
    m, dsub = 4, 16
    return [
        [[float(r.embedding[s * dsub + t]) for t in range(dsub)] for r in cw]
        for s in range(m)
    ]


def test_pq_incremental_build_equals_one_shot_ivfpq(spark, emb, idx):
    from astro_sdk_spark.functions.pq import ivfpq_topk

    cents = emb.filter(F.col("vec_id") < 16)
    cbs = _codebooks_from(emb)
    build_ann_index(
        spark, emb.filter(F.col("vec_id") % 2 == 0), idx, cents, codebooks=cbs
    )
    ann_index_add(spark, emb.filter(F.col("vec_id") % 2 == 1), idx)
    got = ann_index_topk(spark, emb.filter(F.col("vec_id") < 8), idx, nprobe=4, k=10)
    want = ivfpq_topk(
        emb.filter(F.col("vec_id") < 8), emb, centroids=cents,
        codebooks=cbs, nprobe=4, k=10,
    )
    key = lambda df: sorted(
        map(tuple, df.select("query_id", "vec_id", "adist", "rank").collect())
    )
    assert key(got) == key(want)


def test_pq_lists_store_codes_not_vectors(spark, emb, idx):
    build_ann_index(spark, emb, idx, emb.filter(F.col("vec_id") < 16),
                    codebooks=_codebooks_from(emb))
    lists = spark.table(f"{idx}__lists")
    assert set(lists.columns) == {"cent_id", "cand_id", "pq_code"}
    row = lists.head()
    assert len(row.pq_code) == 4  # m subspace codes — bytes, not floats
    meta = spark.table(f"{idx}__meta").head()
    assert meta.kind == "pq" and meta.pq_m == 4 and meta.pq_k == 16


def test_dim_mismatch_and_missing_index_fail_loudly(spark, emb, idx):
    with pytest.raises(ValueError, match="does not exist"):
        ann_index_topk(spark, emb.limit(1), "no_such_index")
    build_ann_index(spark, emb, idx, emb.filter(F.col("vec_id") < 16))
    bad = emb.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.slice("embedding", 1, 3).alias("embedding"),
    )
    with pytest.raises(ValueError, match="dim"):
        ann_index_add(spark, bad, idx)


def test_stream_ann_index_ingest_matches_one_shot(spark, emb, idx, tmp_path):
    """Streaming maintenance: two micro-batches of new vectors flow into
    the persisted index via foreachBatch; the final index answers exactly
    like the one-shot build, and a REPLAYED batch (same data streamed
    again under a fresh checkpoint) is a no-op thanks to id-dedupe."""
    from astro_sdk_spark.functions.similarity import ivf_topk
    from astro_sdk_spark.streaming.ops import stream_ann_index_ingest
    from astro_sdk_spark.streaming.testing import stage_microbatch_files

    cents = emb.filter(F.col("vec_id") < 16)
    build_ann_index(spark, emb.filter(F.col("vec_id") < 0), idx, cents)  # empty
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    d = stage_microbatch_files([b1, b2], str(tmp_path / "ann_stream"))
    schema = spark.read.parquet(d).schema
    q = stream_ann_index_ingest(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d),
        idx, str(tmp_path / "ck_ann"),
    )
    assert q.awaitTermination(180)
    assert q.exception() is None
    got = ann_index_topk(spark, emb.filter(F.col("vec_id") < 8), idx, nprobe=4, k=10)
    want = ivf_topk(
        emb.filter(F.col("vec_id") < 8), emb, centroids=cents, nprobe=4, k=10
    )
    assert _rows(got) == _rows(want)
    n = spark.table(f"{idx}__lists").count()
    # replay the same files under a NEW checkpoint: ids already indexed
    q2 = stream_ann_index_ingest(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d),
        idx, str(tmp_path / "ck_ann_replay"),
    )
    assert q2.awaitTermination(180)
    assert q2.exception() is None
    assert spark.table(f"{idx}__lists").count() == n


def test_stream_ann_index_ingest_requires_existing_index(spark, emb, tmp_path):
    from astro_sdk_spark.streaming.ops import stream_ann_index_ingest

    src = tmp_path / "empty_src"
    src.mkdir()
    with pytest.raises(ValueError, match="does not exist"):
        stream_ann_index_ingest(
            spark.readStream.schema("vec_id long, embedding array<float>")
            .parquet(str(src)),
            "no_such_index", str(tmp_path / "ck_missing"),
        )
