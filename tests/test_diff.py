"""table_diff / diff_summary: keyed CDC snapshot comparison."""

from __future__ import annotations

import pytest

from astro_sdk_spark.operators.diff import diff_summary, table_diff

SCHEMA = "id long, status string, price double"


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "b", 2.0),
            (3, "c", 3.0),
            (4, "d", None),
            (None, "k", 9.0),  # null key must survive the null-safe join
        ],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (1, "a", 1.0),      # unchanged
            (2, "B", 2.0),      # status changed
            (3, "c", 30.0),     # price changed
            (4, "D", 40.0),     # both changed (was NULL price)
            (None, "k", 9.0),   # unchanged null key
            (5, "e", 5.0),      # added
        ],
        SCHEMA,
    )
    return old, new


def test_diff_classification(snaps):
    old, new = snaps
    rows = {r.id: r for r in table_diff(old, new, ["id"]).collect()}
    assert rows[2].diff == "changed" and rows[2].changed_cols == "status"
    assert rows[3].diff == "changed" and rows[3].changed_cols == "price"
    assert rows[4].diff == "changed"
    assert rows[4].changed_cols == "status,price"
    assert rows[5].diff == "added" and rows[5].changed_cols == ""
    assert 1 not in rows  # unchanged filtered by default
    assert None not in rows  # null-key row matched itself (unchanged)


def test_diff_removed_and_include_unchanged(snaps):
    old, new = snaps
    out = table_diff(new, old, ["id"], include_unchanged=True)
    rows = {r.id: r for r in out.collect()}
    assert rows[5].diff == "removed"
    assert rows[1].diff == "unchanged"
    assert rows[None].diff == "unchanged"
    assert len(rows) == 6


def test_diff_compare_cols_subset(snaps):
    old, new = snaps
    rows = {
        r.id: r
        for r in table_diff(old, new, ["id"], compare_cols=["status"]).collect()
    }
    # price-only change is invisible when only status is compared
    assert 3 not in rows
    assert rows[2].diff == "changed"


def test_diff_summary_counts(snaps):
    old, new = snaps
    counts = {r.diff: r.n for r in diff_summary(old, new, ["id"]).collect()}
    assert counts == {"added": 1, "changed": 3, "unchanged": 2}


def test_diff_validates_columns(snaps):
    old, new = snaps
    with pytest.raises(ValueError, match="nope"):
        table_diff(old, new, ["id"], compare_cols=["nope"])
    with pytest.raises(ValueError, match="non-empty"):
        table_diff(old, new, [])
