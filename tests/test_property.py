"""Property-based tests (hypothesis) for the pure-Python parity layers:
SQL literal rendering, xlsx round-trips, column-letter arithmetic,
identifier validation. These run without a SparkSession."""

from __future__ import annotations

import datetime
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from astro_sdk_spark.templating import (
    is_valid_identifier,
    quote_identifier,
    render_literal,
)
from astro_sdk_spark.xlsx import _col_index, _col_letter, read_xlsx, write_xlsx

# ---------------------------------------------------------------- templating


@given(st.text(max_size=200))
@settings(max_examples=200)
def test_string_literals_always_quoted_and_escaped(s):
    lit = render_literal(s)
    assert lit.startswith("'") and lit.endswith("'")
    # the rendered body never terminates the quote early: every single
    # quote inside is preceded by a backslash escape
    body = lit[1:-1]
    i = 0
    while i < len(body):
        if body[i] == "\\":
            i += 2
            continue
        assert body[i] != "'", f"unescaped quote in {lit!r}"
        i += 1


@given(st.floats(allow_nan=True, allow_infinity=True))
@settings(max_examples=200)
def test_float_literals_are_valid_tokens(x):
    lit = render_literal(x)
    if math.isnan(x):
        assert lit == "CAST('NaN' AS DOUBLE)"
    elif math.isinf(x):
        assert "Infinity" in lit
    else:
        assert float(lit) == x  # repr round-trips


@given(st.dates())
def test_date_literals(d):
    assert render_literal(d) == f"DATE '{d.isoformat()}'"


@given(st.text(min_size=1, max_size=64))
def test_quote_identifier_always_safe(name):
    q = quote_identifier(name)
    if is_valid_identifier(name):
        assert q == name
    else:
        # backtick-quoted with internal backticks doubled
        for part, qpart in zip(name.split("."), q.split("`.`")):
            pass
        assert q.startswith("`") or all(
            is_valid_identifier(p) for p in name.split(".")
        )


# --------------------------------------------------------------------- xlsx


@given(st.integers(min_value=0, max_value=20000))
def test_col_letter_roundtrip(i):
    assert _col_index(_col_letter(i)) == i


_cell = st.one_of(
    st.none(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
    st.text(max_size=40).filter(lambda s: "\x00" not in s and s == s.strip() or s == ""),
)


@given(
    st.integers(min_value=1, max_value=5).flatmap(
        lambda width: st.tuples(
            st.just([f"c{i}" for i in range(width)]),
            st.lists(
                st.lists(_cell, min_size=width, max_size=width), max_size=8
            ),
        )
    )
)
@settings(max_examples=60, deadline=None)
def test_xlsx_roundtrip_property(tmp_path_factory, cols_rows):
    cols, rows = cols_rows
    d = tmp_path_factory.mktemp("xlsxprop")
    path = str(d / "t.xlsx")
    # xml strips control chars; keep printable text only
    clean_rows = [
        [
            "".join(ch for ch in v if ch.isprintable()) if isinstance(v, str) else v
            for v in row
        ]
        for row in rows
    ]
    write_xlsx(path, cols, [tuple(r) for r in clean_rows])
    rcols, rrows = read_xlsx(path)
    assert rcols == cols
    assert len(rrows) == len(clean_rows)
    for got, exp in zip(rrows, clean_rows):
        for g, e in zip(got, exp):
            if isinstance(e, float) and isinstance(g, (int, float)):
                assert math.isclose(float(g), e, rel_tol=0, abs_tol=0) or float(g) == e
            else:
                assert g == e, (g, e)


# ---------------------------------------------------------------- xls writer

_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2 ** 52), max_value=2 ** 52),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)


@given(
    st.integers(min_value=1, max_value=5).flatmap(
        lambda ncols: st.tuples(
            st.lists(
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs",), min_codepoint=32
                    ),
                    min_size=1,
                    max_size=12,
                ),
                min_size=ncols,
                max_size=ncols,
            ),
            st.lists(
                st.lists(_cell, min_size=ncols, max_size=ncols),
                max_size=8,
            ),
        )
    )
)
@settings(max_examples=40, deadline=None)
def test_xls_write_read_round_trip(header_rows):
    import os
    import tempfile

    from astro_sdk_spark.xls import read_xls, write_xls

    header, rows = header_rows
    fd, path = tempfile.mkstemp(suffix=".xls")
    os.close(fd)
    try:
        write_xls(path, header, rows)
        h2, r2 = read_xls(path)
        # reader infers width from the rightmost populated cell; trailing
        # all-None columns (and all-None tail rows) legitimately collapse
        assert h2 == header[: len(h2)]
        assert len(r2) <= len(rows)
        for got, exp in zip(r2, rows):
            for g, e in zip(got, exp[: len(got)]):
                if isinstance(e, float) and g is not None:
                    assert float(g) == e
                elif isinstance(e, str):
                    # headers/cells survive as written
                    assert g == e or (g is None and e == "")
                else:
                    assert g == e
    finally:
        os.unlink(path)


# ---------------------------------------------------------------- avro codec

_AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "bl", "type": "boolean"},
        {"name": "by", "type": "bytes"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ],
}

_avro_row = st.fixed_dictionaries(
    {
        "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.none() | st.text(max_size=40),
        "d": st.floats(allow_nan=False, allow_infinity=True, width=64),
        "f": st.floats(allow_nan=False, allow_infinity=True, width=32),
        "bl": st.booleans(),
        "by": st.binary(max_size=64),
        "arr": st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=8),
        "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=4),
    }
)


@given(
    rows=st.lists(_avro_row, max_size=60),
    block=st.integers(min_value=1, max_value=17),
    codec=st.sampled_from(["null", "deflate"]),
    step=st.integers(min_value=37, max_value=5000),
)
@settings(max_examples=60, deadline=None)
def test_avro_round_trip_and_split_scan(tmp_path_factory, rows, block, codec, step):
    """Any record set round-trips byte-exactly through the container
    (zigzag extremes, unicode, ±inf, empty collections), and an arbitrary
    byte-range split decodes every record exactly once."""
    import os

    from astro_sdk_spark.avro import decode_range, read_avro, read_header, write_avro

    p = str(tmp_path_factory.mktemp("avro") / "t.avro")
    write_avro(p, rows, _AVRO_SCHEMA, codec=codec, block_records=block)
    _, back = read_avro(p)
    assert back == rows

    with open(p, "rb") as f:
        schema, cd, sync, he = read_header(f)
    file_len = os.path.getsize(p)
    got, s = [], he
    while s < file_len:
        e = min(file_len, s + step)
        got += list(decode_range(p, s, e, he, schema, cd, sync))
        s = e
    assert got == rows
