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
