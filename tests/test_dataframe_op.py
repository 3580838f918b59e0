import pandas as pd
import pytest

from astro_sdk_spark import File, Table, dataframe, load_file
from astro_sdk_spark.operators.dataframe import apply_in_pandas, map_in_pandas


@pytest.fixture()
def customer(engine, sf_dir):
    t = Table(name="t_cust_df")
    load_file(File(f"{sf_dir}/customer.parquet"), t, engine=engine)
    yield t
    engine.drop_table(t)


def test_dataframe_decorator_table_arg_to_pandas(engine, customer):
    @dataframe(engine=engine)
    def top_balance(c: pd.DataFrame):
        return c.nlargest(3, "c_acctbal")[["c_custkey", "c_acctbal"]]

    sdf = top_balance(customer)
    assert sdf.count() == 3


def test_dataframe_decorator_writeback(engine, customer):
    @dataframe(engine=engine)
    def shrink(c: pd.DataFrame):
        return c[["c_custkey"]].head(10)

    out = shrink(customer, output_table=Table(name="t_shrunk"))
    assert engine.row_count(out) == 10
    engine.drop_table(out)


def test_map_in_pandas_distributed(engine, customer):
    out = map_in_pandas(
        customer,
        lambda pdf: pdf.assign(bal2=pdf.c_acctbal * 2)[["c_custkey", "bal2"]],
        schema="c_custkey long, bal2 double",
        spark=engine.spark,
    )
    assert out.count() == 150
    row = out.orderBy("c_custkey").first()
    src = engine.spark.table(customer.name).orderBy("c_custkey").first()
    assert abs(row["bal2"] - 2 * src["c_acctbal"]) < 1e-9


def test_apply_in_pandas_grouped(engine, customer):
    out = apply_in_pandas(
        customer,
        ["c_mktsegment"],
        lambda pdf: pd.DataFrame(
            {"c_mktsegment": [pdf.c_mktsegment.iloc[0]], "n": [len(pdf)]}
        ),
        schema="c_mktsegment string, n long",
        spark=engine.spark,
    )
    rows = out.collect()
    assert sum(r["n"] for r in rows) == 150
