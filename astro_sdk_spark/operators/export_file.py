"""Deprecated aliases of export_to_file — reference parity for
``python-sdk/src/astro/sql/operators/export_file.py:15-39`` (``export_file``)
and ``export_table_to_file.py:15-39`` (``export_table_to_file``), both of
which the reference keeps as warning-emitting wrappers of the same operator.
"""

from __future__ import annotations

import warnings

from astro_sdk_spark.operators.export import export_to_file


def export_file(*args, **kwargs):
    """Deprecated: use export_to_file."""
    warnings.warn(
        "export_file is deprecated and will be removed; use export_to_file",
        DeprecationWarning,
        stacklevel=2,
    )
    return export_to_file(*args, **kwargs)


def export_table_to_file(*args, **kwargs):
    """Deprecated: use export_to_file."""
    warnings.warn(
        "export_table_to_file is deprecated and will be removed; use export_to_file",
        DeprecationWarning,
        stacklevel=2,
    )
    return export_to_file(*args, **kwargs)
