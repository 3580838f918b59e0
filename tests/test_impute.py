"""impute_nulls: mean/median/mode/constant fills, global and grouped."""

from __future__ import annotations

import pytest

from astro_sdk_spark.functions.impute import impute_nulls

SCHEMA = "id long, grp string, x double, tag string"
ROWS = [
    (1, "a", 10.0, "red"),
    (2, "a", 20.0, "red"),
    (3, "a", None, "blue"),
    (4, "b", 100.0, None),
    (5, "b", None, "green"),
    (6, "c", None, None),  # whole group NULL
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_mean_global_and_grouped(df):
    out = {r.id: r for r in impute_nulls(df, ["x"], "mean", value_scale=100).collect()}
    assert out[3].x == pytest.approx((10 + 20 + 100) / 3)
    assert out[3]._imputed_x and not out[1]._imputed_x

    g = {r.id: r for r in impute_nulls(df, ["x"], "mean", group_by="grp").collect()}
    assert g[3].x == 15.0   # group a mean
    assert g[5].x == 100.0  # group b mean
    assert g[6].x is None and not g[6]._imputed_x  # all-NULL group stays


def test_median_and_constant(df):
    m = {r.id: r for r in impute_nulls(df, ["x"], "median").collect()}
    assert m[3].x == 20.0  # median of 10, 20, 100
    c = {r.id: r for r in impute_nulls(df, ["tag"], "constant", fill_value="?").collect()}
    assert c[4].tag == "?" and c[6].tag == "?" and c[1].tag == "red"


def test_mode_with_tiebreak(df, spark):
    out = {r.id: r for r in impute_nulls(df, ["tag"], "mode").collect()}
    assert out[4].tag == "red"  # red x2 beats blue/green x1
    # exact tie -> lowest value
    tied = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, None)], "id long, tag string"
    )
    t = {r.id: r for r in impute_nulls(tied, ["tag"], "mode").collect()}
    assert t[3].tag == "a"


def test_validates(df):
    with pytest.raises(ValueError, match="strategy"):
        impute_nulls(df, ["x"], "magic")
    with pytest.raises(ValueError, match="not in frame"):
        impute_nulls(df, ["nope"])
    with pytest.raises(ValueError, match="fill_value"):
        impute_nulls(df, ["x"], "constant")


def test_grouped_impute_preserves_null_key_rows(spark):
    """Rows whose GROUP KEY is NULL must survive (unfilled) — an inner
    fill join would delete data."""
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (3, None, 99.0), (4, None, None)],
        "id long, grp string, x double",
    )
    for strat in ("mean", "mode"):
        out = {r.id: r for r in impute_nulls(df, ["x"], strat, group_by="grp").collect()}
        assert set(out) == {1, 2, 3, 4}, strat
        assert out[3].x == 99.0 and not out[3]._imputed_x
        assert out[4].x is None and not out[4]._imputed_x
        assert out[2].x == 10.0 and out[2]._imputed_x


def test_grouped_mode_all_null_group_survives(df):
    out = {r.id: r for r in impute_nulls(df, ["x"], "mode", group_by="grp").collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert out[6].x is None and not out[6]._imputed_x  # all-NULL group c
    assert out[3].x == 10.0  # group-a mode (tie 10/20 -> lowest)


def test_median_grouped(spark):
    from astro_sdk_spark.functions.impute import impute_nulls

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 9.0), (3, "a", None),
         (4, "b", 100.0), (5, "b", None)],
        "id long, grp string, x double",
    )
    out = {r.id: r for r in impute_nulls(df, ["x"], "median", group_by="grp").collect()}
    assert out[3].x == 5.0    # median of 1, 9
    assert out[5].x == 100.0  # single-value group
