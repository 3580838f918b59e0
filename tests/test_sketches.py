"""Sketch-based aggregates — the approximate tools a 100 TB pipeline uses
when exact distinct/quantiles are too expensive: one pass, bounded memory,
mergeable state. These are Spark built-ins (HLL++ and KLL-style quantile
sketches); the tests pin their error contracts against exact answers so a
conf or version drift that degrades accuracy fails loudly.
"""

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey").alias("d")).collect()[0].d
    approx = li.select(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("d")
    ).collect()[0].d
    assert abs(approx - exact) / exact <= 0.06  # 3× the requested rsd


def test_approx_percentile_within_accuracy(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    acc = 100  # error bound: n / acc rank positions
    got = li.select(
        F.percentile_approx("l_extendedprice", [0.5, 0.9], acc).alias("p")
    ).collect()[0].p
    ordered = [r.l_extendedprice for r in li.select("l_extendedprice").collect()]
    ordered.sort()
    for q, v in zip([0.5, 0.9], got):
        target = int(q * (n - 1))
        slack = n // acc + 1
        lo, hi = ordered[max(0, target - slack)], ordered[min(n - 1, target + slack)]
        assert lo <= v <= hi, (q, v, lo, hi)


def test_hll_sketch_mergeable(spark, sf_dir):
    """The 100 TB property that matters: per-partition sketches merge to
    the global answer (hll_sketch_agg → hll_union_agg), so distinct
    counting composes across shards/days without a re-scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey").alias("d")).collect()[0].d
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("d")
    ).collect()[0].d
    assert abs(merged - exact) / exact <= 0.05
