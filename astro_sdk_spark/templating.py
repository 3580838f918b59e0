"""SQL templating: ``{{ name }}`` table identifiers + ``:param`` scalar binds.

Replicates the reference's template semantics (SURVEY §3.1):
- ``translate_jinja_to_sqlalchemy_template``
  (``python-sdk/src/astro/sql/operators/base_decorator.py:240-272``):
  ``Table`` parameters render as *safe identifiers*, scalar parameters as
  bind values.
- identifier-injection validation modeled on
  ``is_valid_snow_identifier`` (``databases/snowflake.py:1107-1155``).

Spark SQL has no server-side bind parameters in the classic DB-API sense for
arbitrary strings in spark.sql() pre-3.4; we render scalars as escaped SQL
literals (Spark >=3.4 also supports spark.sql(sql, args) — we use that when
available for exactness, falling back to literal rendering).
"""

from __future__ import annotations

import datetime as _dt
import math as _math
import re
from typing import Any, Mapping

_JINJA_VAR = re.compile(r"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")
# :param binds — avoid matching '::' casts and ':=' assignments.
_COLON_PARAM = re.compile(r"(?<![:\w']):([A-Za-z_][A-Za-z0-9_]*)")
_VALID_IDENTIFIER = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")


class TemplateError(ValueError):
    pass


def is_valid_identifier(name: str) -> bool:
    """Unquoted-identifier validation (idea from reference
    ``databases/snowflake.py:1107-1155``): letters/digits/_/$, not starting
    with a digit. Qualified names validate each dot-separated part."""
    return all(_VALID_IDENTIFIER.match(part) for part in name.split(".")) and bool(name)


def quote_identifier(name: str) -> str:
    """Return a safely renderable identifier; backtick-quote anything that
    fails unquoted validation (Spark's quoting char is the backtick)."""
    if is_valid_identifier(name):
        return name
    parts = name.split(".")
    return ".".join("`" + p.replace("`", "``") + "`" for p in parts)


def render_literal(value: Any) -> str:
    """Render a Python scalar as a Spark SQL literal with escaping."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, float):
        # repr(nan/inf) would render invalid SQL tokens
        if _math.isnan(value):
            return "CAST('NaN' AS DOUBLE)"
        if _math.isinf(value):
            sign = "-" if value < 0 else ""
            return f"CAST('{sign}Infinity' AS DOUBLE)"
        return repr(value)
    if isinstance(value, int):
        return repr(value)
    if isinstance(value, _dt.datetime):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    if isinstance(value, _dt.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, (list, tuple)):
        return "(" + ", ".join(render_literal(v) for v in value) + ")"
    s = str(value).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def render_sql(
    sql: str,
    parameters: Mapping[str, Any] | None = None,
    resolve_table: Any = None,
) -> str:
    """Render a templated SQL string.

    - ``{{ name }}`` where ``parameters[name]`` is a table handle (anything
      with a ``qualified_name``) or a plain string → validated identifier.
    - ``:name`` where ``parameters[name]`` is a scalar → escaped literal.

    ``resolve_table(handle) -> str`` lets the engine map handles to
    registered view/table names.
    """
    parameters = dict(parameters or {})

    def _identifier_for(value: Any) -> str:
        if resolve_table is not None:
            resolved = resolve_table(value)
            if resolved is not None:
                return quote_identifier(resolved)
        if hasattr(value, "qualified_name"):
            return quote_identifier(value.qualified_name)
        if isinstance(value, str):
            if not is_valid_identifier(value) and not value.startswith("`"):
                raise TemplateError(f"Invalid table identifier: {value!r}")
            return quote_identifier(value)
        raise TemplateError(f"Cannot render {type(value).__name__} as a table identifier")

    def _sub_jinja(m: re.Match) -> str:
        name = m.group(1)
        if name not in parameters:
            raise TemplateError(f"Template variable '{{{{ {name} }}}}' has no parameter")
        return _identifier_for(parameters[name])

    rendered = _JINJA_VAR.sub(_sub_jinja, sql)

    def _sub_param(m: re.Match) -> str:
        name = m.group(1)
        if name not in parameters:
            return m.group(0)  # leave unknown :tokens (e.g. inside casts) alone
        value = parameters[name]
        if hasattr(value, "qualified_name"):
            return _identifier_for(value)
        return render_literal(value)

    return _COLON_PARAM.sub(_sub_param, rendered)
