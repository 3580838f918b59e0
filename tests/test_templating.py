import datetime

import pytest

from astro_sdk_spark.table import Table
from astro_sdk_spark.templating import (
    TemplateError,
    is_valid_identifier,
    quote_identifier,
    render_literal,
    render_sql,
)


def test_table_placeholder_renders_qualified_name():
    t = Table(name="orders")
    assert render_sql("SELECT * FROM {{ t }}", {"t": t}) == "SELECT * FROM orders"


def test_scalar_param_renders_literal():
    out = render_sql("SELECT * FROM x WHERE a > :n AND b = :s", {"n": 5, "s": "it's"})
    assert out == "SELECT * FROM x WHERE a > 5 AND b = 'it\\'s'"


def test_double_colon_cast_untouched():
    out = render_sql("SELECT a::int FROM x WHERE b = :p", {"p": 1})
    assert out == "SELECT a::int FROM x WHERE b = 1"


def test_unknown_colon_token_left_alone():
    assert render_sql("SELECT ':notparam'", {}) == "SELECT ':notparam'"


def test_invalid_identifier_rejected():
    with pytest.raises(TemplateError):
        render_sql("SELECT * FROM {{ t }}", {"t": "orders; DROP TABLE x"})


def test_missing_template_param_raises():
    with pytest.raises(TemplateError):
        render_sql("SELECT * FROM {{ t }}", {})


def test_quote_identifier_backticks_weird_names():
    assert quote_identifier("my table") == "`my table`"
    assert quote_identifier("db.tbl") == "db.tbl"


def test_is_valid_identifier():
    assert is_valid_identifier("a_b$1")
    assert not is_valid_identifier("1abc")
    assert not is_valid_identifier("a-b")
    assert not is_valid_identifier("")


def test_literals():
    assert render_literal(None) == "NULL"
    assert render_literal(True) == "TRUE"
    assert render_literal(3.5) == "3.5"
    assert render_literal(datetime.date(2024, 1, 2)) == "DATE '2024-01-02'"
    assert render_literal([1, 2]) == "(1, 2)"
