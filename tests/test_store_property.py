"""Property test for the shared streaming sketch store
(astro_sdk_spark/streaming/store.py): for ANY schedule of micro-batches —
arbitrary values, arbitrary empties anywhere, arbitrary replays of
already-merged batch ids — the final store must equal the one-shot sketch
of the concatenated non-empty data, and replays/empties must never
double-count or poison. This is the invariant the targeted regression
tests in test_stream_ingest.py pin pointwise; here hypothesis drives the
schedule."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from astro_sdk_spark.functions.quantiles import quantile_sketch_build
from astro_sdk_spark.streaming.store import merge_sketch_batch

# each batch: a (possibly empty) list of small float values; schedules of
# up to 5 batches keep Spark round-trips affordable
batch_strategy = st.lists(
    st.integers(min_value=-300, max_value=300).map(lambda i: float(i)),
    max_size=8,
)
schedule_strategy = st.lists(batch_strategy, min_size=1, max_size=5)


@settings(max_examples=10, deadline=None)
@given(schedule=schedule_strategy, replay_mask=st.integers(min_value=0, max_value=31))
def test_store_equals_one_shot_sketch_under_any_schedule(
    spark, schedule, replay_mask
):
    table = "prop_store_t"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        batch_id = 0
        for i, values in enumerate(schedule):
            df = spark.createDataFrame([(v,) for v in values], "v double")
            merge_sketch_batch(
                spark, table, "run1", batch_id, df,
                params={"width": 100, "scale": 2},
                data_cols=["bucket", "n"],
                build=lambda b: quantile_sketch_build(b, "v", width=100),
                merge=lambda s, f: s.unionByName(f)
                .groupBy("bucket")
                .agg({"n": "sum"})
                .withColumnRenamed("sum(n)", "n"),
                incompatible_what="incompatible bucket grids",
            )
            if (replay_mask >> i) & 1:
                # replay the SAME batch id with the same data — must no-op
                merge_sketch_batch(
                    spark, table, "run1", batch_id, df,
                    params={"width": 100, "scale": 2},
                    data_cols=["bucket", "n"],
                    build=lambda b: quantile_sketch_build(b, "v", width=100),
                    merge=lambda s, f: s.unionByName(f)
                    .groupBy("bucket")
                    .agg({"n": "sum"})
                    .withColumnRenamed("sum(n)", "n"),
                    incompatible_what="incompatible bucket grids",
                )
            batch_id += 1

        all_values = [v for batch in schedule for v in batch]
        if not all_values:
            assert not spark.catalog.tableExists(table), (
                "an all-empty schedule must never create the store"
            )
            return
        got = sorted(
            map(tuple, spark.table(table).select("bucket", "n").collect())
        )
        whole = spark.createDataFrame([(v,) for v in all_values], "v double")
        want = sorted(
            map(tuple, quantile_sketch_build(whole, "v", width=100).collect())
        )
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


# grouped schedules: each element is (group, value); groups g0/g1/g2 so
# every batch can hit a mix of groups, including groups that appear in
# only one batch
grouped_batch_strategy = st.lists(
    st.tuples(
        st.sampled_from(["g0", "g1", "g2"]),
        st.integers(min_value=-300, max_value=300).map(lambda i: float(i)),
    ),
    max_size=8,
)
grouped_schedule_strategy = st.lists(
    grouped_batch_strategy, min_size=1, max_size=5
)


@settings(max_examples=8, deadline=None)
@given(
    schedule=grouped_schedule_strategy,
    replay_mask=st.integers(min_value=0, max_value=31),
)
def test_grouped_store_equals_one_shot_sketch_under_any_schedule(
    spark, schedule, replay_mask
):
    """The grouped (by=[...]) store under the same adversarial schedules:
    arbitrary values and group mixes, empties anywhere, replays anywhere —
    the final store must equal the grouped one-shot sketch of all data."""
    from astro_sdk_spark.functions.quantiles import quantile_sketch_merge

    table = "prop_store_grp_t"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    def step(batch_id, df):
        merge_sketch_batch(
            spark, table, "run1", batch_id, df,
            params={"width": 100, "scale": 2},
            data_cols=["g", "bucket", "n"],
            build=lambda b: quantile_sketch_build(b, "v", width=100, by=["g"]),
            merge=lambda s, f: quantile_sketch_merge(s, f, by=["g"]),
            incompatible_what="incompatible bucket grids",
        )

    try:
        for i, rows in enumerate(schedule):
            df = spark.createDataFrame(rows, "g string, v double")
            step(i, df)
            if (replay_mask >> i) & 1:
                step(i, df)  # replay — must no-op

        all_rows = [r for batch in schedule for r in batch]
        if not all_rows:
            assert not spark.catalog.tableExists(table)
            return
        got = sorted(
            map(tuple, spark.table(table).select("g", "bucket", "n").collect())
        )
        whole = spark.createDataFrame(all_rows, "g string, v double")
        want = sorted(
            map(
                tuple,
                quantile_sketch_build(whole, "v", width=100, by=["g"]).collect(),
            )
        )
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_checkpoint_rdd_ids_identifies_only_its_own_checkpoint(spark):
    """ADVICE r9 (medium): the old before/after persistent-set diff
    swallowed RDDs persisted CONCURRENTLY by other queries and unpersisted
    them mid-use — lineage-truncated blocks, so the victim stream died
    with block-not-found. checkpoint_rdd_ids must return exactly the one
    RDD the checkpointed DataFrame owns, whatever else is persisted."""
    from astro_sdk_spark.functions._cache import (
        checkpoint_rdd_ids,
        persistent_rdd_ids,
        unpersist_rdd_ids,
    )

    bystander = spark.range(100).toDF("x")
    bystander.persist()
    bystander.count()
    a = spark.range(50).toDF("x").localCheckpoint(eager=True)
    other = spark.range(70).toDF("x").localCheckpoint(eager=True)  # "concurrent"
    ids_a = checkpoint_rdd_ids(a)
    ids_other = checkpoint_rdd_ids(other)
    try:
        assert len(ids_a) == 1 and len(ids_other) == 1
        assert ids_a.isdisjoint(ids_other)
        assert ids_a <= persistent_rdd_ids(spark)
        # releasing a's checkpoint must leave the other two readable
        unpersist_rdd_ids(spark, ids_a)
        assert other.count() == 70
        assert bystander.count() == 100
        # non-checkpointed plan → empty set (never a guess)
        assert checkpoint_rdd_ids(bystander) == set()
    finally:
        unpersist_rdd_ids(spark, ids_other)
        bystander.unpersist()
