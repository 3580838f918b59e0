"""incremental_append: high-water-mark loading derived from the target."""

from __future__ import annotations

import pytest

from astro_sdk_spark import Table
from astro_sdk_spark.operators.incremental import (
    high_water_mark,
    incremental_append,
)

SCHEMA = "id long, ts long, payload string"


@pytest.fixture()
def tgt(engine):
    t = Table(name="incr_tgt")
    yield t
    engine.drop_table(t)


def test_initial_load_then_incremental(engine, spark, tgt):
    batch1 = spark.createDataFrame(
        [(1, 100, "a"), (2, 200, "b")], SCHEMA
    )
    assert incremental_append(batch1, tgt, "ts", engine=engine) == 2
    assert high_water_mark(engine, tgt, "ts") == 200

    # second batch overlaps: only rows strictly past the mark load
    batch2 = spark.createDataFrame(
        [(2, 200, "b"), (3, 300, "c"), (4, 150, "late")], SCHEMA
    )
    assert incremental_append(batch2, tgt, "ts", engine=engine) == 1
    rows = {r.id for r in spark.table(tgt.name).collect()}
    assert rows == {1, 2, 3}  # the late row (150 <= 200) is NOT loaded


def test_rerun_same_batch_is_noop(engine, spark, tgt):
    batch = spark.createDataFrame([(1, 100, "a")], SCHEMA)
    assert incremental_append(batch, tgt, "ts", engine=engine) == 1
    assert incremental_append(batch, tgt, "ts", engine=engine) == 0
    assert spark.table(tgt.name).count() == 1


def test_missing_watermark_column_raises(engine, spark, tgt):
    batch = spark.createDataFrame([(1, 100, "a")], SCHEMA)
    with pytest.raises(ValueError, match="nope"):
        incremental_append(batch, tgt, "nope", engine=engine)


def test_high_water_mark_missing_table(engine):
    assert high_water_mark(engine, Table(name="incr_never_made"), "ts") is None


def test_null_watermarks_excluded_and_guarded(engine, spark, tgt):
    batch = spark.createDataFrame(
        [(1, 100, "a"), (2, None, "null-ts")], SCHEMA
    )
    # NULL-watermark rows never load (same rule on first and n-th run)
    assert incremental_append(batch, tgt, "ts", engine=engine) == 1
    assert {r.id for r in spark.table(tgt.name).collect()} == {1}
    # rerun: idempotent
    assert incremental_append(batch, tgt, "ts", engine=engine) == 0


def test_all_null_watermark_target_refused(engine, spark, tgt):
    spark.createDataFrame([(1, None, "x")], SCHEMA).write.saveAsTable(tgt.name)
    batch = spark.createDataFrame([(2, 100, "y")], SCHEMA)
    with pytest.raises(ValueError, match="NULL"):
        incremental_append(batch, tgt, "ts", engine=engine)
