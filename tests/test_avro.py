"""Avro container codec: round-trip, split-parallel read, engine wiring.

The codec implements the public Avro 1.11 spec (no reference counterpart —
the reference's format matrix stops at csv/json/ndjson/parquet; Avro is a
§2.4 extension for row-oriented lake interchange)."""

from __future__ import annotations

import datetime
import os

import pytest

from astro_sdk_spark.avro import (
    read_avro,
    read_avro_distributed,
    read_header,
    scan_ranges,
    decode_range,
    spark_to_avro_schema,
    write_avro,
)
from astro_sdk_spark.files import File, FileType, filetype_from_path

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "blob", "type": "bytes"},
    ],
}


def _rows(n):
    return [
        {
            "id": i,
            "name": None if i % 7 == 0 else f"n{i}",
            "score": i * 0.5,
            "flag": i % 2 == 0,
            "tags": [f"t{j}" for j in range(i % 4)],
            "attrs": {"a": i, "b": i * 2},
            "blob": bytes([i % 256]) * 3,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_round_trip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    rows = _rows(3000)
    n = write_avro(p, rows, SCHEMA, codec=codec, block_records=257)
    assert n == 3000
    schema, back = read_avro(p)
    assert back == rows


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_split_scan_covers_every_block_exactly_once(tmp_path, codec):
    """Adversarially small ranges (most smaller than one block): the
    block-start ownership rule must still decode each record once."""
    p = str(tmp_path / "t.avro")
    rows = _rows(2000)
    write_avro(p, rows, SCHEMA, codec=codec, block_records=101)
    with open(p, "rb") as f:
        schema, cd, sync, he = read_header(f)
    file_len = os.path.getsize(p)
    for step in (997, 64 * 1024):
        got = []
        s = he
        while s < file_len:
            e = min(file_len, s + step)
            got += list(decode_range(p, s, e, he, schema, cd, sync))
            s = e
        assert got == rows, (codec, step, len(got))


def test_scan_ranges_partition_the_file():
    ranges = scan_ranges(10_000_000, 1234, 8)
    assert ranges[0][0] == 1234
    assert ranges[-1][1] == 10_000_000
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 == s2


def test_distributed_read_matches_driver_read(spark, tmp_path):
    p = str(tmp_path / "t.avro")
    rows = _rows(5000)
    write_avro(p, rows, SCHEMA, codec="deflate", block_records=199)
    df = read_avro_distributed(spark, p, n_splits=13)
    got = sorted(
        (r.asDict(recursive=True) for r in df.collect()), key=lambda r: r["id"]
    )
    for g, w in zip(got, rows):
        g["blob"] = bytes(g["blob"])
        assert g == w
    assert len(got) == 5000


def test_distributed_read_directory(spark, tmp_path):
    d = tmp_path / "many"
    d.mkdir()
    rows = _rows(600)
    write_avro(str(d / "a.avro"), rows[:300], SCHEMA)
    write_avro(str(d / "b.avro"), rows[300:], SCHEMA)
    df = read_avro_distributed(spark, str(d))
    assert df.count() == 600
    assert set(r.id for r in df.select("id").collect()) == set(range(600))


def test_timestamp_and_date_round_trip(spark, tmp_path, engine):
    """Spark df → export_to_file(.avro) → load via engine → same values."""
    from astro_sdk_spark.operators.export import export_to_file

    src = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 5, 1, 12, 30, 45, 123456), datetime.date(2024, 5, 1)),
            (2, datetime.datetime(1999, 12, 31, 23, 59, 59), datetime.date(1970, 1, 2)),
        ],
        "id long, ts timestamp_ntz, d date",
    )
    p = str(tmp_path / "ts.avro")
    export_to_file(src, File(p), engine=engine)
    back = engine.read_file(File(p))
    got = {r.id: (r.ts, r.d) for r in back.collect()}
    assert got[1] == (
        datetime.datetime(2024, 5, 1, 12, 30, 45, 123456),
        datetime.date(2024, 5, 1),
    )
    assert got[2] == (
        datetime.datetime(1999, 12, 31, 23, 59, 59),
        datetime.date(1970, 1, 2),
    )


def test_engine_read_file_avro_load_file_path(spark, engine, sf_dir, tmp_path):
    """parquet → avro export → load_file → identical aggregate."""
    from astro_sdk_spark.operators.export import export_to_file
    from astro_sdk_spark.operators.load_file import load_file
    from astro_sdk_spark.table import Table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "docs.avro")
    export_to_file(docs, File(p), engine=engine)
    tbl = Table(name="avro_docs_rt")
    load_file(File(p), tbl, engine=engine, if_exists="replace")
    back = spark.table(tbl.qualified_name)
    assert back.count() == docs.count()
    a = {r.lang: r.s for r in back.groupBy("lang").agg({"n_chars": "sum"}).withColumnRenamed("sum(n_chars)", "s").collect()}
    b = {r.lang: r.s for r in docs.groupBy("lang").agg({"n_chars": "sum"}).withColumnRenamed("sum(n_chars)", "s").collect()}
    assert a == b
    spark.sql("DROP TABLE IF EXISTS avro_docs_rt")


def test_filetype_detection_and_unsupported_schema_errors(tmp_path):
    assert filetype_from_path("x/y.avro") is FileType.AVRO
    with pytest.raises(ValueError, match="union"):
        write_avro(
            str(tmp_path / "u.avro"),
            [],
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "u", "type": ["int", "string"]}],
            },
        )
    with pytest.raises(ValueError, match="not an Avro container"):
        p = tmp_path / "bad.avro"
        p.write_bytes(b"PAR1not-avro")
        read_avro(str(p))


def test_spark_to_avro_schema_nullable_union(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    sch = spark_to_avro_schema(df.schema)
    assert sch["fields"][0]["type"] == ["null", "long"]


def test_empty_export_round_trip(spark, engine, tmp_path):
    """0-record DataFrame → header-only container → empty DF, same schema."""
    from astro_sdk_spark.operators.export import export_to_file

    src = spark.createDataFrame([], "id long, s string")
    p = str(tmp_path / "empty.avro")
    export_to_file(src, File(p), engine=engine)
    back = read_avro_distributed(spark, p)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["id", "s"]


def test_schema_generation_is_deterministic(spark):
    """Identical Spark schemas (incl. nested structs) → byte-identical
    Avro schemas and therefore byte-identical container files."""
    import json

    df1 = spark.createDataFrame(
        [(1, (2, "x"))], "id long, nested struct<a: long, b: string>"
    )
    df2 = spark.createDataFrame(
        [(9, (8, "y"))], "id long, nested struct<a: long, b: string>"
    )
    s1 = spark_to_avro_schema(df1.schema)
    s2 = spark_to_avro_schema(df2.schema)
    assert json.dumps(s1, sort_keys=True) == json.dumps(s2, sort_keys=True)


def test_nested_struct_round_trip(spark, engine, tmp_path):
    from astro_sdk_spark.operators.export import export_to_file

    src = spark.createDataFrame(
        [(1, (2, "x")), (2, (3, None))],
        "id long, nested struct<a: long, b: string>",
    )
    p = str(tmp_path / "nested.avro")
    export_to_file(src, File(p), engine=engine)
    back = engine.read_file(File(p))
    got = {r.id: (r.nested.a, r.nested.b) for r in back.collect()}
    assert got == {1: (2, "x"), 2: (3, None)}
