"""quantile_sketch — mergeability, accuracy bound, negative/NULL/edge
semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.quantiles import (
    quantile_sketch_build,
    quantile_sketch_merge,
    quantile_sketch_query,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_merge_equals_whole_build(spark):
    df = _vals(spark, [i * 0.37 for i in range(1, 2001)])
    whole = quantile_sketch_build(df, "v", width=50)
    a = quantile_sketch_build(df.filter(F.col("v") < 300), "v", width=50)
    b = quantile_sketch_build(df.filter(F.col("v") >= 300), "v", width=50)
    merged = quantile_sketch_merge(a, b)
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_quantile_within_one_bucket_of_exact(spark):
    xs = [i * 1.01 for i in range(1, 5001)]
    df = _vals(spark, xs)
    sk = quantile_sketch_build(df, "v", width=100)  # $1 buckets
    got = {r.q: r.value for r in quantile_sketch_query(sk, [0.5, 0.9, 0.99], width=100).collect()}
    import math

    n = len(xs)
    for q, est in got.items():
        exact = sorted(xs)[math.ceil(q * n) - 1]
        assert est <= exact < est + 1.0, (q, est, exact)


def test_negative_values_floor_bucketing(spark):
    # -0.50 must land in bucket [-1.00, 0.00), not [0.00, 1.00)
    df = _vals(spark, [-0.5, -1.5, 0.5])
    sk = {r.bucket: r.n for r in quantile_sketch_build(df, "v", width=100).collect()}
    assert sk == {-1: 1, -2: 1, 0: 1}
    # p-small quantile reports the lowest bucket's lower bound
    q = quantile_sketch_query(
        quantile_sketch_build(df, "v", width=100), [0.01], width=100
    ).collect()[0]
    assert q.value == -2.0


def test_exact_boundary_values(spark):
    # values exactly on a bucket edge belong to the upper bucket
    df = _vals(spark, [1.0, 2.0])
    sk = {r.bucket: r.n for r in quantile_sketch_build(df, "v", width=100).collect()}
    assert sk == {1: 1, 2: 1}


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(1.0,), (None,), (2.0,)], "v double")
    total = quantile_sketch_build(df, "v", width=100).agg(F.sum("n")).collect()[0][0]
    assert total == 2


def test_validation(spark):
    df = _vals(spark, [1.0])
    with pytest.raises(ValueError):
        quantile_sketch_build(df, "v", width=0)
    with pytest.raises(ValueError):
        quantile_sketch_query(quantile_sketch_build(df, "v"), [])
    with pytest.raises(ValueError):
        quantile_sketch_query(quantile_sketch_build(df, "v"), [1.5])
    with pytest.raises(ValueError):
        quantile_sketch_merge()


def test_p100_is_max_bucket(spark):
    xs = [1.0, 50.0, 99.0]
    df = _vals(spark, xs)
    sk = quantile_sketch_build(df, "v", width=100)
    r = quantile_sketch_query(sk, [1.0], width=100).collect()[0]
    assert r.value == 99.0


def test_grouped_sketch_per_key_quantiles(spark):
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(i * 10)) for i in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    sk = quantile_sketch_build(df, "v", width=100, by=["k"])
    got = {
        (r.k, r.q): r.value
        for r in quantile_sketch_query(sk, [0.5, 0.99], width=100, by=["k"]).collect()
    }
    # group a: values 1..100 → p50 bucket lower bound 50.0; p99 → 99.0
    assert got[("a", 0.5)] == 50.0 and got[("a", 0.99)] == 99.0
    # group b: values 10..1000 → p50 = 500.0, p99 = 990.0
    assert got[("b", 0.5)] == 500.0 and got[("b", 0.99)] == 990.0


def test_grouped_merge_equals_whole(spark):
    rows = [("a", float(i)) for i in range(1, 501)] + [
        ("b", float(i) * 0.5) for i in range(1, 501)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    whole = quantile_sketch_build(df, "v", width=77, by=["k"])
    lo = quantile_sketch_build(df.filter(F.col("v") < 100), "v", width=77, by=["k"])
    hi = quantile_sketch_build(df.filter(F.col("v") >= 100), "v", width=77, by=["k"])
    merged = quantile_sketch_merge(lo, hi, by=["k"])
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_randomized_merge_and_accuracy_invariants(spark):
    """Seeded random draws: (1) merging K random disjoint splits always
    equals the whole-corpus build; (2) every quantile estimate is within
    one bucket width of the exact lower-interpolation quantile."""
    import math
    import random

    rng = random.Random(618)
    for trial in range(3):
        n = rng.randint(200, 800)
        xs = [round(rng.uniform(-50, 950), 2) for _ in range(n)]
        width = rng.choice([37, 100, 250])
        df = spark.createDataFrame([(x,) for x in xs], "v double")
        whole = quantile_sketch_build(df, "v", width=width)
        k = rng.randint(2, 4)
        splits = df.randomSplit([1.0] * k, seed=rng.randint(0, 9999))
        parts = [quantile_sketch_build(s, "v", width=width) for s in splits]
        merged = quantile_sketch_merge(*parts)
        assert sorted(map(tuple, whole.collect())) == sorted(
            map(tuple, merged.collect())
        ), f"trial={trial} width={width}"
        qs = sorted({rng.choice([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) for _ in range(3)})
        got = {
            r.q: r.value
            for r in quantile_sketch_query(merged, qs, width=width).collect()
        }
        ordered = sorted(xs)
        for q in qs:
            exact = ordered[math.ceil(q * n) - 1]
            est = got[q]
            assert est <= exact < est + width / 100.0, (
                f"trial={trial} q={q} est={est} exact={exact} width={width}"
            )


def test_grouped_quantile_null_group_reachable(spark):
    """NULL group rows keep their own sketch and their quantiles come
    back (null-safe totals join)."""
    from astro_sdk_spark.functions.quantiles import (
        quantile_sketch_build,
        quantile_sketch_query,
    )

    df = spark.createDataFrame(
        [(None, float(i)) for i in range(100)]
        + [("g1", float(i)) for i in range(1000, 1100)],
        "grp string, v double",
    )
    sk = quantile_sketch_build(df, "v", width=10, by=["grp"])
    got = {
        (r.grp, r.q): r.value
        for r in quantile_sketch_query(sk, [0.5], width=10, by=["grp"]).collect()
    }
    assert (None, 0.5) in got and abs(got[(None, 0.5)] - 49.0) <= 0.2
    assert abs(got[("g1", 0.5)] - 1049.0) <= 0.2
