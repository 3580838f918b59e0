"""Lineage log: every data-moving operator emits (op, inputs, outputs)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from astro_sdk_spark.engine import SparkEngine
from astro_sdk_spark.files import File
from astro_sdk_spark.lineage import LINEAGE
from astro_sdk_spark.operators.export import export_to_file
from astro_sdk_spark.operators.load_file import load_file
from astro_sdk_spark.operators.merge import merge
from astro_sdk_spark.operators.transform import run_transform
from astro_sdk_spark.table import Table


def test_lineage_chain(spark, engine, tmp_path):
    LINEAGE.clear()
    src_csv = tmp_path / "in.csv"
    src_csv.write_text("k,v\n1,a\n2,b\n")

    loaded = Table(name="lin_loaded")
    load_file(File(str(src_csv)), loaded, engine=engine)

    out = Table(name="lin_out")
    run_transform(
        "SELECT k, upper(v) AS v FROM {{ t }}",
        parameters={"t": loaded},
        output_table=out,
        engine=engine,
    )

    tgt = Table(name="lin_tgt")
    spark.createDataFrame([(9, "z")], "k bigint, v string").write.mode(
        "overwrite"
    ).saveAsTable("lin_tgt")
    merge(out, tgt, columns={"k": "k", "v": "v"},
          target_conflict_columns=["k"], if_conflicts="ignore", engine=engine)

    export_to_file(tgt, File(str(tmp_path / "out.csv")), if_exists="replace", engine=engine)

    ops = [e.op for e in LINEAGE.events()]
    assert ops == ["load_file", "transform", "merge:ignore", "export_to_file"]

    by_op = {e.op: e for e in LINEAGE.events()}
    assert by_op["load_file"].inputs == [f"file:{src_csv}"]
    assert by_op["load_file"].outputs == ["table:lin_loaded"]
    assert by_op["transform"].inputs == ["table:lin_loaded"]
    assert by_op["transform"].outputs == ["table:lin_out"]
    assert "{{ t }}" in by_op["transform"].sql
    assert by_op["merge:ignore"].inputs == ["table:lin_out"]
    assert by_op["export_to_file"].outputs == [f"file:{tmp_path / 'out.csv'}"]

    # exportable as JSON
    parsed = json.loads(LINEAGE.to_json())
    assert len(parsed) == 4 and parsed[0]["op"] == "load_file"

    for name in ("lin_loaded", "lin_out", "lin_tgt"):
        engine.drop_table(Table(name=name))
    LINEAGE.clear()


def test_lineage_can_be_disabled(engine, tmp_path):
    LINEAGE.clear()
    LINEAGE.enabled = False
    try:
        p = tmp_path / "x.csv"
        p.write_text("a\n1\n")
        load_file(File(str(p)), engine=engine)
        assert LINEAGE.events() == []
    finally:
        LINEAGE.enabled = True
