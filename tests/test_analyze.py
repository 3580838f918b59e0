"""engine.analyze_table: statistics collection feeding Catalyst's CBO."""

from __future__ import annotations

import pytest

from astro_sdk_spark.queries import T
from astro_sdk_spark.table import Table


@pytest.fixture()
def stats_table(spark, engine):
    name = "analyze_target"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    T(spark, "/root/testdata/sf0.001", "orders").write.mode("overwrite").saveAsTable(name)
    yield Table(name=name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_analyze_table_row_stats(spark, engine, stats_table):
    engine.analyze_table(stats_table)
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {stats_table.name}").collect()
    }
    assert "Statistics" in desc
    n = spark.table(stats_table.name).count()
    assert f"{n} rows" in desc["Statistics"]


def test_analyze_table_column_stats(spark, engine, stats_table):
    engine.analyze_table(stats_table, columns=["o_orderkey", "o_totalprice"])
    desc = {r.info_name: r.info_value for r in spark.sql(
        f"DESCRIBE TABLE EXTENDED {stats_table.name} o_orderkey"
    ).collect()}
    assert desc.get("distinct_count") not in (None, "NULL")
    assert int(desc["max"]) >= int(desc["min"])


def test_analyze_table_validates_columns(engine, stats_table):
    with pytest.raises(ValueError, match="not all present"):
        engine.analyze_table(stats_table, columns=["no_such_col"])


# ---------------------------------------------------------------------------
# detect_outliers (robust fences)


def test_detect_outliers_iqr(spark):
    from astro_sdk_spark.operators.data_validation import detect_outliers

    vals = list(range(1, 101)) + [10_000, -10_000]  # two gross outliers
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                               "id long, v double")
    out = detect_outliers(df, "v", method="iqr", k=1.5)
    flagged = {r["v"] for r in out.filter("is_outlier").collect()}
    assert flagged == {10_000.0, -10_000.0}
    row = out.filter("id = 0").collect()[0]
    assert row["lo"] < 1 and row["hi"] > 100  # fences outside the bulk


def test_detect_outliers_mad_resists_contamination(spark):
    from astro_sdk_spark.operators.data_validation import detect_outliers

    # 30% of rows corrupted by a decimal shift: MAD fences still catch
    # them (the median is untouched by the contamination)
    vals = [float(50 + (i % 11)) for i in range(70)] + [5500.0] * 30
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, v double")
    out = detect_outliers(df, "v", method="mad", k=3.0)
    flagged = out.filter("is_outlier").count()
    assert flagged == 30
    clean_flagged = out.filter("is_outlier AND v < 1000").count()
    assert clean_flagged == 0


def test_detect_outliers_validates_method(spark):
    import pytest as _pytest

    from astro_sdk_spark.operators.data_validation import detect_outliers

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with _pytest.raises(ValueError, match="method"):
        detect_outliers(df, "v", method="zscore")


# ---------------------------------------------------------------- drift


def test_schema_drift_detects_and_judges(spark):
    from pyspark.sql.types import StructType

    from astro_sdk_spark.operators.data_validation import schema_drift

    old = StructType.fromDDL("id int, price float, tag string")
    new = StructType.fromDDL("id long, price double, note string")
    d = schema_drift(old, new)
    assert d["added"] == ["note"] and d["removed"] == ["tag"]
    # bigint DATA into an int column is rejected by store-assignment
    assert d["changed"]["id"] == ("int", "bigint", False)
    assert d["changed"]["price"] == ("float", "double", False)
    assert not d["compatible"]


def test_schema_drift_upcast_into_wider_column_is_compatible(spark):
    from pyspark.sql.types import StructType

    from astro_sdk_spark.operators.data_validation import schema_drift

    # table is WIDE, batch is NARROW -> lossless upcast on write
    old = StructType.fromDDL("id long, ts timestamp")
    new = StructType.fromDDL("id int, ts date")
    d = schema_drift(old, new)
    assert d["compatible"]
    assert d["changed"]["id"] == ("bigint", "int", True)
    # the reverse direction (wide data into narrow column) is breaking
    d2 = schema_drift(new, old)
    assert not d2["compatible"]
    # an extra batch column also breaks a plain append
    d3 = schema_drift(old, StructType.fromDDL("id long, ts timestamp, x int"))
    assert d3["added"] == ["x"] and not d3["compatible"]


def test_schema_drift_identical(spark):
    from pyspark.sql.types import StructType

    from astro_sdk_spark.operators.data_validation import schema_drift

    s = StructType.fromDDL("a int, b string")
    d = schema_drift(s, s)
    assert d == {"added": [], "removed": [], "changed": {}, "compatible": True}


def test_detect_outliers_clip_winsorizes(spark):
    from astro_sdk_spark.operators.data_validation import detect_outliers

    rows = [(float(i),) for i in range(1, 21)] + [(1000.0,), (-500.0,), (None,)]
    df = spark.createDataFrame(rows, "x double")
    res = detect_outliers(df, "x", method="iqr", k=1.5, clip=True).collect()
    # NULL stays NULL — least/greatest would otherwise fabricate the fence
    assert any(r.x is None for r in res)
    vals = sorted(r.x for r in res if r.x is not None)
    hi = max(r.hi for r in res)
    lo = min(r.lo for r in res)
    # extremes clamped INTO the fences
    assert vals[-1] <= hi + 1e-6 and vals[0] >= lo - 1e-6
    assert sum(bool(r.is_outlier) for r in res) == 2  # flags preserved
    # inliers untouched
    assert 10.0 in vals
