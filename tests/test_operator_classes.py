"""Operator-class parity: reference users who instantiate operator classes
and call .execute() keep working."""

from __future__ import annotations

import astro_sdk_spark as aql
from astro_sdk_spark.files import File
from astro_sdk_spark.table import Table


def test_class_roundtrip(spark, engine, tmp_path):
    csv = tmp_path / "ops.csv"
    csv.write_text("k,v\n1,a\n2,b\n")

    loaded = Table(name="opcls_loaded")
    out = aql.LoadFileOperator(
        input_file=File(str(csv)), output_table=loaded, engine=engine
    ).execute()
    assert out is loaded

    transformed = Table(name="opcls_out")
    aql.TransformOperator(
        sql="SELECT k, upper(v) AS v FROM {{ t }}",
        parameters={"t": loaded},
        output_table=transformed,
        engine=engine,
    ).execute()
    rows = {(r.k, r.v) for r in spark.table("opcls_out").collect()}
    assert rows == {(1, "A"), (2, "B")}

    vals = aql.GetValueListOperator(
        sql="SELECT k FROM opcls_out ORDER BY k", engine=engine
    ).execute()
    assert [r.k for r in vals] == [1, 2]

    results = aql.SQLCheckOperator(
        dataset=transformed,
        checks={"has_rows": {"check_statement": "COUNT(*) = 2"}},
        engine=engine,
    ).execute()
    assert results[0].passed

    export = aql.ExportToFileOperator(
        input_data=transformed,
        output_file=File(str(tmp_path / "ops_out.csv")),
        if_exists="replace",
        engine=engine,
    ).execute()
    assert (tmp_path / "ops_out.csv").exists()

    aql.DropTableOperator(table=loaded, engine=engine).execute()
    aql.DropTableOperator(table=transformed, engine=engine).execute()
    assert not engine.table_exists(loaded)


def test_all_reference_operator_classes_exported():
    for name in (
        "LoadFileOperator", "TransformOperator", "RawSQLOperator",
        "DataframeOperator", "AppendOperator", "MergeOperator",
        "ExportToFileOperator", "ExportFileOperator",
        "ExportTableToFileOperator", "DropTableOperator", "CleanupOperator",
        "ColumnCheckOperator", "SQLCheckOperator", "ListFileOperator",
    ):
        assert hasattr(aql, name), name


def test_dataframe_operator_executes(spark, engine):
    src = Table(name="opcls_df_src")
    spark.createDataFrame([(1, 2.0), (2, 4.0)], ["k", "v"]).write.mode(
        "overwrite"
    ).saveAsTable(src.name)

    def double(df):
        df["v"] = df["v"] * 2
        return df

    out_table = Table(name="opcls_df_out")
    result = aql.DataframeOperator(
        python_callable=double,
        op_args=(src,),
        output_table=out_table,
        engine=engine,
    ).execute()
    assert result is out_table
    rows = {(r.k, r.v) for r in spark.table(out_table.name).collect()}
    assert rows == {(1, 4.0), (2, 8.0)}
    aql.DropTableOperator(table=src, engine=engine).execute()
    aql.DropTableOperator(table=out_table, engine=engine).execute()


def test_deprecated_export_operator_classes(spark, engine, tmp_path):
    import warnings

    df = spark.createDataFrame([(1,)], "x int")
    for cls, fname in (
        (aql.ExportFileOperator, "dep1.csv"),
        (aql.ExportTableToFileOperator, "dep2.csv"),
    ):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            cls(
                input_data=df,
                output_file=File(str(tmp_path / fname)),
                if_exists="replace",
                engine=engine,
            ).execute()
            assert any(issubclass(x.category, DeprecationWarning) for x in w)
        assert (tmp_path / fname).exists()
