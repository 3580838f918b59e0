"""pagerank (functions/graph.py) — fixed-point determinism and the
hand-computable small-graph contracts."""

import pyspark.sql.functions as F
import pytest

from astro_sdk_spark.functions.graph import pagerank

SCALE = 1_000_000
BASE = 150_000  # (100-85)% of scale


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.pr for r in pagerank(df, **kw).collect()}


def test_two_cycle_fixed_point(spark):
    # a <-> b: symmetric, deg 1 each. pr stays at the fixed point:
    # pr' = 150000 + 85*1000000 div 100 = 1000000 exactly.
    out = _pr(spark, [("a", "b"), ("b", "a")], iters=4)
    assert out == {"a": SCALE, "b": SCALE}


def test_source_sink_one_iter(spark):
    # a -> b only. After 1 round: a gets base only; b gets
    # base + 85*(1000000 div 1) div 100 = 150000 + 850000.
    out = _pr(spark, [("a", "b")], iters=1)
    assert out["a"] == BASE
    assert out["b"] == BASE + (85 * SCALE) // 100


def test_second_iter_uses_updated_ranks(spark):
    # a -> b, second round: b receives 85% of a's NEW rank (150000).
    out = _pr(spark, [("a", "b")], iters=2)
    assert out["a"] == BASE
    assert out["b"] == BASE + (85 * (BASE // 1)) // 100


def test_out_degree_splits_mass(spark):
    # hub h -> x, y: each gets pr div 2.
    out = _pr(spark, [("h", "x"), ("h", "y")], iters=1)
    assert out["x"] == out["y"] == BASE + (85 * (SCALE // 2)) // 100


def test_duplicate_edges_collapse(spark):
    # the same link stated twice must not double the mass transfer
    once = _pr(spark, [("a", "b")], iters=2)
    twice = _pr(spark, [("a", "b"), ("a", "b")], iters=2)
    assert once == twice


def test_dangling_node_keeps_receiving(spark):
    # b has no out-edges: it accumulates but never emits; a stays base.
    out = _pr(spark, [("a", "b")], iters=3)
    assert out["a"] == BASE
    assert out["b"] > BASE


def test_deterministic_across_runs_and_partitioning(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(100)]
    df1 = spark.createDataFrame(edges, ["src", "dst"]).repartition(16)
    df2 = spark.createDataFrame(list(reversed(edges)), ["src", "dst"]).repartition(3)
    r1 = {r.node: r.pr for r in pagerank(df1, iters=3).collect()}
    r2 = {r.node: r.pr for r in pagerank(df2, iters=3).collect()}
    assert r1 == r2


def test_nulls_dropped_and_validation(spark):
    df = spark.createDataFrame([("a", "b"), (None, "b"), ("a", None)], ["src", "dst"])
    out = {r.node: r.pr for r in pagerank(df, iters=1).collect()}
    assert set(out) == {"a", "b"}
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=100)


def test_star_ranks_center_highest(spark):
    # undirected star: center exchanges with 5 leaves — center must
    # outrank every leaf, leaves tie exactly (integer arithmetic).
    edges = []
    for i in range(5):
        edges += [("c", f"l{i}"), (f"l{i}", "c")]
    out = _pr(spark, edges, iters=3)
    leaf_vals = {v for k, v in out.items() if k != "c"}
    assert len(leaf_vals) == 1
    assert out["c"] > leaf_vals.pop()


def test_checkpoint_blocks_released(spark):
    # iterating must not accumulate one checkpoint block set per round
    from astro_sdk_spark.functions._cache import (
        persistent_rdd_ids,
        sweep_persistent_rdds,
    )

    df = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    before = persistent_rdd_ids(spark)
    pagerank(df, iters=9, checkpoint_every=2).count()
    leaked = persistent_rdd_ids(spark) - before
    # bounded: the edge blocks + at most ONE surviving mid-loop
    # checkpoint back the (lazy) returned plan — NOT one set per round;
    # the repo-wide sweep reclaims them once the result is consumed
    assert len(leaked) <= 2
    sweep_persistent_rdds(spark)
    assert not (persistent_rdd_ids(spark) - before)


def test_connected_components_generic_api(spark):
    from astro_sdk_spark.functions.graph import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")], ["src", "dst"]
    )
    stats = {}
    out = {
        r.node: r.component
        for r in connected_components(edges, stats=stats).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    assert stats["rounds"] >= 1


def test_assume_deduped_matches_default_on_distinct_edges(spark):
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 5 + 2) % 17}") for i in range(40)], ["src", "dst"]
    ).distinct()
    a = {r.node: r.pr for r in pagerank(edges, iters=3).collect()}
    b = {r.node: r.pr for r in pagerank(edges, iters=3, assume_deduped=True).collect()}
    assert a == b
