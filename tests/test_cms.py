"""Count-min sketch: overestimate-only errors, mergeability, bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.cms import cms_build, cms_merge, cms_query


@pytest.fixture(scope="module")
def stream(spark):
    rows = [(f"k{i % 50}",) for i in range(2000)] + [("hot",)] * 500
    return spark.createDataFrame(rows, "key string")


def test_cms_estimates_are_overestimates(spark, stream):
    sketch = cms_build(stream, "key", width=256, depth=4)
    keys = stream.select("key").distinct()
    est = {r.key: r.est for r in cms_query(sketch, keys, "key", 256, 4).collect()}
    true = {r.key: r.n for r in stream.groupBy("key").agg(F.count("*").alias("n")).collect()}
    for k, t in true.items():
        assert est[k] >= t, k  # CMS never underestimates
    # hot key: estimate close to truth (collision error bounded by eN)
    assert est["hot"] >= 500 and est["hot"] <= 500 + 2500 * 4 // 256


def test_cms_sketch_size_bounded(spark, stream):
    sketch = cms_build(stream, "key", width=64, depth=3)
    assert sketch.count() <= 64 * 3
    assert set(sketch.columns) == {"d", "cell", "n"}


def test_cms_merge_equals_union_build(spark, stream):
    """Sketching two halves and merging == sketching the whole — the
    distributed-aggregate property."""
    # deterministic split (limit() is not stable across evaluations)
    a = stream.filter(F.col("key") < "k3")
    b = stream.filter(~(F.col("key") < "k3"))
    merged = cms_merge(
        cms_build(a, "key", 128, 3), cms_build(b, "key", 128, 3)
    )
    whole = cms_build(stream, "key", 128, 3)
    m = {(r.d, r.cell): r.n for r in merged.collect()}
    w = {(r.d, r.cell): r.n for r in whole.collect()}
    assert m == w


def test_cms_absent_key_small_estimate(spark, stream):
    sketch = cms_build(stream, "key", width=1024, depth=4)
    ghost = spark.createDataFrame([("never-seen",)], "key string")
    est = cms_query(sketch, ghost, "key", 1024, 4).collect()[0].est
    assert est <= 2500 * 4 // 1024 + 10  # only collision mass


def test_cms_validates(spark, stream):
    with pytest.raises(ValueError, match="positive"):
        cms_build(stream, "key", width=0)
    with pytest.raises(ValueError, match="at least one"):
        cms_merge()


def test_cms_query_validates(spark, stream):
    sketch = cms_build(stream, "key", width=64, depth=3)
    keys = stream.select("key").distinct()
    with pytest.raises(ValueError, match="positive"):
        cms_query(sketch, keys, "key", width=0, depth=3)


def test_grouped_cms_null_group_reachable(spark):
    """NULL group values are stored as their own group by cms_build; the
    probe join must be null-safe so their estimates come back non-zero."""
    from astro_sdk_spark.functions.cms import cms_build, cms_query

    df = spark.createDataFrame(
        [(None, "k1")] * 7 + [("g1", "k1")] * 3, "grp string, key string"
    )
    sk = cms_build(df, "key", width=64, depth=3, by=["grp"])
    est = {
        (r.grp, r.key): r.est
        for r in cms_query(
            sk, df.select("grp", "key").distinct(), "key",
            width=64, depth=3, by=["grp"],
        ).collect()
    }
    assert est[(None, "k1")] >= 7
    assert est[("g1", "k1")] >= 3
