from astro_sdk_spark.table import MAX_TABLE_NAME_LENGTH, BaseTable, Metadata, Table, TempTable


def test_unnamed_table_is_temp_with_prefix():
    t = Table()
    assert t.temp
    assert t.name.startswith("_tmp")
    assert len(t.name) <= MAX_TABLE_NAME_LENGTH


def test_named_table_not_temp():
    t = Table(name="customers")
    assert not t.temp
    assert t.qualified_name == "customers"


def test_leading_underscore_is_temp():
    t = Table(name="_staging")
    assert t.temp


def test_qualified_name_with_metadata():
    t = Table(name="c", metadata=Metadata(schema="analytics"))
    assert t.qualified_name == "analytics.c"


def test_temp_table_autoname_unique():
    names = {TempTable().name for _ in range(50)}
    assert len(names) == 50


def test_uri():
    t = Table(name="c", metadata=Metadata(schema="db1"))
    assert t.uri == "spark://db1?table=c"
