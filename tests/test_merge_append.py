"""Merge/append parity tests — modeled on the reference's integration
contract (``tests_integration/sql/operators/test_merge.py:75-95``): after
merging homes_merge_2 into homes_merge_1 on ``list``, mode 'ignore' keeps
original ages/taxes and inserts the new key; mode 'update' overwrites."""

import pytest

from astro_sdk_spark import Table, append, merge
from astro_sdk_spark.operators.merge import MergeConflictException

MAIN = [  # sell, list, age, taxes
    (142, 160, 60, 3167),
    (175, 180, 12, 4033),
    (129, 132, 52, 1471),
    (138, 140, 28, 3204),
    (232, 240, 20, 3613),
]
INCOMING = [
    (100, 160, 1, 1),
    (100, 180, 1, 1),
    (100, 132, 1, 1),
    (100, 140, 1, 1),
    (100, 999, 1, 1),  # new key
]
COLS = ["sell", "list", "age", "taxes"]


@pytest.fixture()
def homes(engine):
    tgt, src = Table(name="homes_tgt"), Table(name="homes_src")
    engine.spark.createDataFrame(MAIN, COLS).write.mode("overwrite").saveAsTable(tgt.name)
    engine.spark.createDataFrame(INCOMING, COLS).write.mode("overwrite").saveAsTable(src.name)
    yield src, tgt
    engine.drop_table(src)
    engine.drop_table(tgt)


def _by_list(engine, t):
    return {r["list"]: r.asDict() for r in engine.fetch_all_rows(t)}


def test_merge_ignore_keeps_target_rows(engine, homes):
    src, tgt = homes
    merge(src, tgt, COLS, target_conflict_columns=["list"], if_conflicts="ignore", engine=engine)
    rows = _by_list(engine, tgt)
    assert len(rows) == 6
    assert rows[160]["age"] == 60 and rows[160]["taxes"] == 3167  # untouched
    assert rows[999]["age"] == 1  # inserted


def test_merge_update_overwrites_mapped_cols(engine, homes):
    src, tgt = homes
    merge(src, tgt, COLS, target_conflict_columns=["list"], if_conflicts="update", engine=engine)
    rows = _by_list(engine, tgt)
    assert len(rows) == 6
    assert all(rows[k]["taxes"] == 1 for k in (160, 180, 132, 140, 999))


def test_merge_update_preserves_unmapped_target_cols(engine, homes):
    src, tgt = homes
    # only map taxes — age must be preserved on matched rows
    merge(
        src,
        tgt,
        {"list": "list", "taxes": "taxes"},
        target_conflict_columns=["list"],
        if_conflicts="update",
        engine=engine,
    )
    rows = _by_list(engine, tgt)
    assert rows[160]["taxes"] == 1  # updated
    assert rows[160]["age"] == 60  # preserved
    assert rows[160]["sell"] == 142  # preserved
    assert rows[999]["age"] is None  # inserted row: unmapped → NULL


def test_merge_exception_raises_on_duplicate_key(engine, homes):
    src, tgt = homes
    with pytest.raises(MergeConflictException):
        merge(src, tgt, COLS, target_conflict_columns=["list"], if_conflicts="exception", engine=engine)


def test_merge_exception_ok_when_no_conflicts(engine, homes):
    src, tgt = homes
    only_new = Table(name="homes_new")
    engine.spark.createDataFrame([(1, 777, 2, 3)], COLS).write.mode("overwrite").saveAsTable(
        only_new.name
    )
    merge(only_new, tgt, COLS, target_conflict_columns=["list"], if_conflicts="exception", engine=engine)
    assert engine.row_count(tgt) == 6
    engine.drop_table(only_new)


def test_append_all_columns(engine, homes):
    src, tgt = homes
    append(src, tgt, engine=engine)
    assert engine.row_count(tgt) == 10


def test_append_column_map(engine, homes):
    src, tgt = homes
    append(src, tgt, columns={"sell": "sell", "list": "list"}, engine=engine)
    rows = engine.fetch_all_rows(tgt)
    assert len(rows) == 10
    appended = [r for r in rows if r["age"] is None]
    assert len(appended) == 5  # unmapped target cols → NULL


def test_append_missing_table_raises(engine, homes):
    src, _ = homes
    with pytest.raises(ValueError):
        append(src, Table(name="does_not_exist_xyz"), engine=engine)
