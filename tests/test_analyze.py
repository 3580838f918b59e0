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
