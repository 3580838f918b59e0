import json
import os

import pytest

from astro_sdk_spark import File, Table, load_file
from astro_sdk_spark.files import FileType, filetype_from_path


def test_filetype_from_extension():
    assert filetype_from_path("a/b.csv") == FileType.CSV
    assert filetype_from_path("s3://x/y.parquet") == FileType.PARQUET
    assert filetype_from_path("z.ndjson") == FileType.NDJSON
    assert filetype_from_path("z.jsonl") == FileType.NDJSON
    with pytest.raises(ValueError):
        filetype_from_path("a.unknown")


def test_is_pattern():
    assert File("/data/dir").is_pattern()
    assert File("/data/*.csv").is_pattern()
    assert not File("/data/f.csv").is_pattern()


def test_load_parquet_to_table(engine, sf_dir):
    t = load_file(File(f"{sf_dir}/region.parquet"), Table(name="t_region"), engine=engine)
    assert engine.row_count(t) == 5
    engine.drop_table(t)


def test_load_parquet_returns_dataframe(engine, sf_dir):
    df = load_file(File(f"{sf_dir}/nation.parquet"), engine=engine)
    assert df.count() == 25
    assert "n_name" in df.columns


def test_load_csv_with_header_and_inference(engine, tmp_path):
    p = tmp_path / "homes.csv"
    p.write_text("sell,list,age\n142,160,60\n175,180,12\n")
    df = load_file(File(str(p)), engine=engine)
    assert df.count() == 2
    assert dict(df.dtypes)["sell"] == "int"


def test_load_ndjson_flattens_nested(engine, tmp_path):
    p = tmp_path / "nested.ndjson"
    rows = [
        {"id": 1, "payload": {"commit": {"author": "a"}, "ref": "r1"}},
        {"id": 2, "payload": {"commit": {"author": "b"}, "ref": "r2"}},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = load_file(File(str(p)), engine=engine)
    assert set(df.columns) == {"id", "payload_commit_author", "payload_ref"}


def test_load_json_array(engine, tmp_path):
    p = tmp_path / "sample.json"
    p.write_text(json.dumps([{"id": 1, "name": "First"}, {"id": 2, "name": "पांचाल"}]))
    df = load_file(File(str(p)), engine=engine)
    assert df.count() == 2
    names = {r["name"] for r in df.collect()}
    assert "पांचाल" in names


def test_if_exists_append_vs_replace(engine, sf_dir):
    t = Table(name="t_region_app")
    load_file(File(f"{sf_dir}/region.parquet"), t, engine=engine)
    load_file(File(f"{sf_dir}/region.parquet"), t, if_exists="append", engine=engine)
    assert engine.row_count(t) == 10
    load_file(File(f"{sf_dir}/region.parquet"), t, if_exists="replace", engine=engine)
    assert engine.row_count(t) == 5
    engine.drop_table(t)


def test_columns_names_capitalization(engine, sf_dir):
    df = load_file(
        File(f"{sf_dir}/region.parquet"),
        columns_names_capitalization="upper",
        engine=engine,
    )
    assert df.columns == ["R_REGIONKEY", "R_NAME"]


def test_glob_pattern_load(engine, tmp_path):
    for i in range(3):
        (tmp_path / f"part_{i}.csv").write_text(f"a,b\n{i},{i * 2}\n")
    df = load_file(File(str(tmp_path / "part_*.csv")), engine=engine)
    assert df.count() == 3


def test_load_file_bucketed_layout(engine, spark, tmp_path):
    from astro_sdk_spark.files import File
    from astro_sdk_spark.operators.load_file import load_file
    from astro_sdk_spark.table import Table

    p = tmp_path / "bk.csv"
    p.write_text("k,v\n" + "\n".join(f"{i % 10},{i}" for i in range(100)) + "\n")
    t = Table(name="lf_bucketed")
    engine.drop_table(t)
    load_file(File(str(p)), t, bucket_by=(4, ["k"]), engine=engine)
    agg = spark.table("lf_bucketed").groupBy("k").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert agg.count() == 10
    engine.drop_table(t)


def test_load_file_normalize_config_sep(engine, tmp_path):
    from astro_sdk_spark.files import File
    from astro_sdk_spark.operators.load_file import load_file

    p = tmp_path / "nested.ndjson"
    p.write_text('{"a": {"b": 1}}\n{"a": {"b": 2}}\n')
    df = load_file(File(str(p), normalize_config={"sep": "__"}), engine=engine)
    assert df.columns == ["a__b"]


def test_schema_sample_bounded_inference(engine, tmp_path):
    """A many-file ndjson directory infers its schema from the largest
    SCHEMA_SAMPLE_FILES files only (one bounded pass instead of a second
    full-corpus read), and still reads every file's rows."""
    d = tmp_path / "many"
    d.mkdir()
    for i in range(12):
        (d / f"part-{i:02d}.json").write_text(
            "\n".join(json.dumps({"k": j, "v": f"x{j}"}) for j in range(i * 5, i * 5 + 5))
        )
    sample = engine._schema_sample_paths(str(d), {})
    assert sample is not None and len(sample) == engine.SCHEMA_SAMPLE_FILES
    df = engine.read_file(File(str(d), filetype=FileType.NDJSON))
    assert df.count() == 60
    assert set(df.columns) == {"k", "v"}
    # explicit schema / samplingRatio / few files disable sampling
    assert engine._schema_sample_paths(str(d), {"schema": "k long"}) is None
    assert engine._schema_sample_paths(str(d), {"samplingRatio": 0.1}) is None
    few = tmp_path / "few"
    few.mkdir()
    (few / "a.json").write_text('{"k": 1}')
    assert engine._schema_sample_paths(str(few), {}) is None


def test_gz_ndjson_round_trip(spark, engine, tmp_path):
    """x.ndjson.gz: compression suffix is transparent on read (Hadoop
    codec) and honored on single-file export."""
    from astro_sdk_spark.files import File, FileType, filetype_from_path
    from astro_sdk_spark.operators.export import export_to_file

    assert filetype_from_path("a/b.ndjson.gz") is FileType.NDJSON
    assert filetype_from_path("a/b.csv.bz2") is FileType.CSV

    src = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, s string"
    )
    p = str(tmp_path / "out.ndjson.gz")
    export_to_file(src, File(p), engine=engine)
    import gzip

    with gzip.open(p, "rt") as fh:  # really gzip bytes on disk
        assert '"alpha"' in fh.read()
    back = engine.read_file(File(p))
    assert {(r.id, r.s) for r in back.collect()} == {(1, "alpha"), (2, "beta"), (3, "gamma")}


def test_compressed_columnar_rejected(tmp_path):
    from astro_sdk_spark.files import filetype_from_path

    import pytest as _pytest

    with _pytest.raises(ValueError, match="own compression"):
        filetype_from_path("x/part.parquet.gz")


def test_compressed_array_json_export_rejected(spark, engine, tmp_path):
    from astro_sdk_spark.files import File
    from astro_sdk_spark.operators.export import export_to_file

    import pytest as _pytest

    src = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError, match="ndjson"):
        export_to_file(src, File(str(tmp_path / "o.json.gz")), engine=engine)


def test_csv_malformed_row_modes(engine, spark, tmp_path):
    """mode=DROPMALFORMED skips bad rows; PERMISSIVE +
    corrupt_record_col captures them; FAILFAST raises."""
    import pytest as _pytest

    from astro_sdk_spark import CsvLoadOptions, Table, load_file
    from astro_sdk_spark.files import File

    p = tmp_path / "dirty.csv"
    # row '3' has too few tokens (malformed for the inferred reader);
    # row 'x,y' fails the INT schema (malformed for the typed reader)
    p.write_text("a,b\n1,2\n3\nx,y\n4,5\n")

    schema = "a INT, b INT"
    dropped = spark.read.options(mode="DROPMALFORMED").schema(schema).csv(
        str(p), header=True
    )
    tgt = Table(name="dirty_drop_t")
    try:
        load_file(
            File(str(p)),
            tgt,
            engine=engine,
            load_options=[CsvLoadOptions(header=True, mode="DROPMALFORMED")],
        )
        # without inferSchema all cols are strings; the malformed row has
        # too few columns and is dropped
        rows = spark.table(tgt.name).collect()
        # the short row drops; 'x,y' is token-complete (strings) so stays
        assert len(rows) == 3
    finally:
        engine.drop_table(tgt)

    with _pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        spark.read.options(mode="FAILFAST").schema(schema).csv(
            str(p), header=True
        ).collect()
    # typed reader: short rows AND cast failures both DROP under
    # DROPMALFORMED — but only when the rows are actually parsed.
    # count() would report 4: column pruning parses no columns, so no
    # record is ever classified malformed — assert on collect(), which
    # materializes the parse
    assert len(dropped.collect()) == 2
