"""publish_table — write-audit-publish atomicity and audit wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.operators.data_validation import ChecksFailedError
from astro_sdk_spark.operators.publish import publish_table


def _drop(spark, *names):
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_publish_passes_checks_and_swaps(spark):
    _drop(spark, "wap_tgt", "wap_tgt__wap_staged")
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    publish_table(
        df,
        "wap_tgt",
        table_checks={"not_empty": {"check_statement": "COUNT(*) > 0"}},
        column_checks={"id": {"null_check": {"equal_to": 0}}},
    )
    assert spark.table("wap_tgt").count() == 10
    assert not spark.catalog.tableExists("wap_tgt__wap_staged")
    _drop(spark, "wap_tgt")


def test_publish_failure_leaves_live_table_untouched(spark):
    _drop(spark, "wap_tgt2", "wap_tgt2__wap_staged")
    good = spark.range(5).select(F.col("id"), F.lit("ok").alias("tag"))
    publish_table(good, "wap_tgt2")
    bad = spark.range(0).select(F.col("id"), F.lit("bad").alias("tag"))
    with pytest.raises(ChecksFailedError):
        publish_table(
            bad,
            "wap_tgt2",
            table_checks={"not_empty": {"check_statement": "COUNT(*) > 0"}},
        )
    # live table still serves the GOOD version; staging cleaned up
    rows = spark.table("wap_tgt2")
    assert rows.count() == 5
    assert rows.filter(F.col("tag") == "bad").count() == 0
    assert not spark.catalog.tableExists("wap_tgt2__wap_staged")
    _drop(spark, "wap_tgt2")


def test_publish_keep_staging_on_fail(spark):
    _drop(spark, "wap_tgt3", "wap_tgt3__wap_staged")
    bad = spark.range(3).select(F.col("id"), F.lit(None).cast("string").alias("tag"))
    with pytest.raises(ChecksFailedError):
        publish_table(
            bad,
            "wap_tgt3",
            column_checks={"tag": {"null_check": {"equal_to": 0}}},
            keep_staging_on_fail=True,
        )
    # staged copy preserved for debugging; target never created
    assert spark.catalog.tableExists("wap_tgt3__wap_staged")
    assert not spark.catalog.tableExists("wap_tgt3")
    _drop(spark, "wap_tgt3__wap_staged")


def test_publish_first_time_creates_target(spark):
    _drop(spark, "wap_new")
    publish_table(spark.range(4), "wap_new")
    assert spark.table("wap_new").count() == 4
    _drop(spark, "wap_new")


def test_publish_emits_lineage(spark):
    from astro_sdk_spark.lineage import LINEAGE

    _drop(spark, "wap_lin")
    LINEAGE.clear()
    publish_table(spark.range(2), "wap_lin")
    evs = [e for e in LINEAGE.events() if e.op == "publish_table"]
    assert evs and evs[-1].outputs == ["wap_lin"]
    _drop(spark, "wap_lin")


def test_publish_recovers_from_orphaned_staging_dir(spark, tmp_path):
    """A killed previous run leaves the staging DIRECTORY behind with no
    catalog entry — the next publish must scrub it instead of dying on
    LOCATION_ALREADY_EXISTS."""
    import os
    from urllib.parse import urlparse

    _drop(spark, "wap_orph", "wap_orph__wap_staged")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    orphan = os.path.join(wh.path or wh.netloc, "wap_orph__wap_staged")
    os.makedirs(orphan, exist_ok=True)
    open(os.path.join(orphan, "junk"), "w").write("leftover")
    publish_table(spark.range(3), "wap_orph")
    assert spark.table("wap_orph").count() == 3
    _drop(spark, "wap_orph")


def test_publish_recovers_orphan_in_named_database(spark, tmp_path):
    """Same orphaned-staging recovery for a SCHEMA-QUALIFIED target: the
    managed layout there is <warehouse>/<db>.db/<table>, which the scrub
    used to miss (it joined the warehouse root with the bare name)."""
    import os
    from urllib.parse import urlparse

    from astro_sdk_spark.table import Metadata, Table

    spark.sql("CREATE DATABASE IF NOT EXISTS wapdb")
    spark.sql("DROP TABLE IF EXISTS wapdb.wap_qual")
    spark.sql("DROP TABLE IF EXISTS wapdb.wap_qual__wap_staged")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    orphan = os.path.join(
        wh.path or wh.netloc, "wapdb.db", "wap_qual__wap_staged"
    )
    os.makedirs(orphan, exist_ok=True)
    open(os.path.join(orphan, "junk"), "w").write("leftover")
    tgt = Table(name="wap_qual", metadata=Metadata(schema="wapdb"))
    publish_table(spark.range(7), tgt)
    assert spark.table("wapdb.wap_qual").count() == 7
    spark.sql("DROP TABLE IF EXISTS wapdb.wap_qual")
    spark.sql("DROP DATABASE IF EXISTS wapdb")
