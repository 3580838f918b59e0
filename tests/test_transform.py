import pytest

from astro_sdk_spark import File, Table, load_file, run_raw_sql, transform
from astro_sdk_spark.operators.transform import run_transform, transform_file


@pytest.fixture()
def lineitem(engine, sf_dir):
    t = Table(name="t_lineitem_tr")
    load_file(File(f"{sf_dir}/lineitem.parquet"), t, engine=engine)
    yield t
    engine.drop_table(t)


def test_run_transform_ctas(engine, lineitem):
    out = run_transform(
        "SELECT l_returnflag, count(*) AS n FROM {{ li }} GROUP BY l_returnflag",
        parameters={"li": lineitem},
        engine=engine,
    )
    assert out.temp  # no output_table given → temp
    rows = {r["l_returnflag"]: r["n"] for r in engine.fetch_all_rows(out)}
    assert set(rows) == {"A", "N", "R"}
    engine.drop_table(out)


def test_transform_decorator_with_params(engine, lineitem):
    @transform(engine=engine)
    def big_quantities(li: Table, min_qty: int):
        return "SELECT * FROM {{ li }} WHERE l_quantity >= :min_qty"

    out = big_quantities(lineitem, 50, output_table=Table(name="t_bigq"))
    assert out.name == "t_bigq"
    df = engine.spark.table(out.qualified_name)
    assert df.count() > 0
    assert df.agg({"l_quantity": "min"}).collect()[0][0] >= 50
    engine.drop_table(out)


def test_transform_replaces_existing_output(engine, lineitem):
    out = Table(name="t_replace_me")
    run_transform("SELECT 1 AS a", engine=engine, output_table=out)
    run_transform("SELECT 2 AS b", engine=engine, output_table=out)
    df = engine.spark.table(out.qualified_name)
    assert df.columns == ["b"]
    engine.drop_table(out)


def test_transform_file(engine, lineitem, tmp_path):
    sql_file = tmp_path / "q.sql"
    sql_file.write_text("SELECT max(l_quantity) AS max_qty FROM {{ li }}")
    out = transform_file(str(sql_file), parameters={"li": lineitem}, engine=engine)
    assert engine.fetch_all_rows(out)[0]["max_qty"] == 50
    engine.drop_table(out)


def test_run_raw_sql_results_formats(engine, lineitem):
    rows = run_raw_sql(
        "SELECT l_returnflag FROM {{ t }} GROUP BY 1",
        parameters={"t": lineitem},
        results_format="list",
        engine=engine,
    )
    assert len(rows) == 3
    pdf = run_raw_sql(
        "SELECT l_returnflag FROM {{ t }} GROUP BY 1",
        parameters={"t": lineitem},
        results_format="pandas_dataframe",
        engine=engine,
    )
    assert len(pdf) == 3
    with pytest.raises(ValueError):
        run_raw_sql(
            "SELECT * FROM {{ t }} WHERE l_quantity > 1e9",
            parameters={"t": lineitem},
            fail_on_empty=True,
            engine=engine,
        )


def test_run_raw_sql_handler_and_response_size(engine, lineitem):
    out = run_raw_sql(
        "SELECT * FROM {{ t }}",
        parameters={"t": lineitem},
        handler=lambda df: df.limit(7).collect(),
        response_size=5,
        engine=engine,
    )
    assert len(out) == 5


def test_transform_materializes_dataframe_args(engine, spark, lineitem):
    import pandas as pd

    lookup = pd.DataFrame({"l_linestatus": ["O", "F"], "label": ["open", "filled"]})
    out = Table(name="tx_df_arg_out")
    from astro_sdk_spark.operators.transform import run_transform

    run_transform(
        """
        SELECT t.l_linestatus, m.label, count(*) AS n
        FROM {{ t }} t JOIN {{ m }} m ON t.l_linestatus = m.l_linestatus
        GROUP BY t.l_linestatus, m.label
        """,
        parameters={"t": lineitem, "m": lookup},
        output_table=out,
        engine=engine,
    )
    rows = {(r.l_linestatus, r.label) for r in spark.table("tx_df_arg_out").collect()}
    assert rows == {("O", "open"), ("F", "filled")}
    # the pandas arg was staged as a registered temp table (cleanup target)
    assert any(t.name.startswith("_tmp") for t in engine.temp_tables)
    engine.drop_table(out)


def test_transform_partitioned_ctas(spark, engine, sf_dir):
    """partition_by produces a hive-partitioned table: filters on the
    partition column prune at the scan (PartitionFilters), and the table
    directory is laid out by value."""
    import os

    from astro_sdk_spark.files import File
    from astro_sdk_spark.operators.load_file import load_file
    from astro_sdk_spark.operators.transform import run_transform
    from astro_sdk_spark.table import Table

    src = Table(name="pt_docs_src")
    load_file(File(f"{sf_dir}/documents.parquet"), src, engine=engine, if_exists="replace")
    out = run_transform(
        "SELECT doc_id, n_chars, lang FROM {{ src }}",
        parameters={"src": src},
        output_table=Table(name="pt_docs_by_lang"),
        engine=engine,
        partition_by=["lang"],
    )
    back = spark.table(out.qualified_name)
    assert back.count() == spark.table(src.qualified_name).count()
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {out.qualified_name}")
        .filter("col_name = 'Location'").collect()[0].data_type
    ).removeprefix("file:")
    assert any(d.startswith("lang=") for d in os.listdir(loc))
    plan = (
        back.filter("lang = 'en'")._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    spark.sql("DROP TABLE IF EXISTS pt_docs_src")
    spark.sql("DROP TABLE IF EXISTS pt_docs_by_lang")


def test_transform_bucketed_ctas(spark, engine, sf_dir):
    from astro_sdk_spark.files import File
    from astro_sdk_spark.operators.load_file import load_file
    from astro_sdk_spark.operators.transform import run_transform
    from astro_sdk_spark.table import Table

    src = Table(name="bk_docs_src")
    load_file(File(f"{sf_dir}/documents.parquet"), src, engine=engine, if_exists="replace")
    out = run_transform(
        "SELECT doc_id, n_chars FROM {{ src }}",
        parameters={"src": src},
        output_table=Table(name="bk_docs_bucketed"),
        engine=engine,
        bucket_by=(4, ["doc_id"]),
    )
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {out.qualified_name}").collect()
    info = {r.col_name: r.data_type for r in desc}
    assert info.get("Num Buckets") == "4"
    assert "doc_id" in info.get("Bucket Columns", "")
    spark.sql("DROP TABLE IF EXISTS bk_docs_src")
    spark.sql("DROP TABLE IF EXISTS bk_docs_bucketed")
