"""Typed per-format load options — reference parity for the ``load_options``
parameter of ``load_file`` (``python-sdk/src/astro/sql/operators/load_file.py``
accepts a list of ``LoadOptions`` subclasses such as ``PandasLoadOptions``;
``python-sdk/src/astro/options.py``).

Here each subclass maps declaratively onto ``spark.read`` options for its
format — the engine merges them into the DataFrameReader, so they reach the
scan (and with it, pushdown/pruning) rather than a driver-side pandas call.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any

from astro_sdk_spark.files import FileType


@dataclass
class LoadOptions:
    """Base: free-form reader options that apply to any format."""

    extra: dict[str, Any] = field(default_factory=dict)

    #: file types this options object applies to; None = all
    file_types: tuple[FileType, ...] | None = None

    def to_reader_options(self) -> dict[str, Any]:
        out = {}
        for f in fields(self):
            if f.name in ("extra", "file_types"):
                continue
            val = getattr(self, f.name)
            if val is not None:
                out[_OPTION_NAMES.get(f.name, f.name)] = val
        out.update(self.extra)
        return out

    def applies_to(self, ftype: FileType) -> bool:
        return self.file_types is None or ftype in self.file_types


# dataclass field name → Spark reader option name
_OPTION_NAMES = {
    "delimiter": "sep",
    "null_value": "nullValue",
    "infer_schema": "inferSchema",
    "date_format": "dateFormat",
    "timestamp_format": "timestampFormat",
    "multi_line": "multiLine",
    "merge_schema": "mergeSchema",
    "sampling_ratio": "samplingRatio",
    "corrupt_record_col": "columnNameOfCorruptRecord",
}


@dataclass
class CsvLoadOptions(LoadOptions):
    delimiter: str | None = None
    header: bool | None = None
    quote: str | None = None
    escape: str | None = None
    null_value: str | None = None
    encoding: str | None = None
    infer_schema: bool | None = None
    date_format: str | None = None
    timestamp_format: str | None = None
    #: malformed-row policy: PERMISSIVE (null-fill, default),
    #: DROPMALFORMED (skip bad rows), FAILFAST (error) — dirty corpora
    #: at scale want an explicit choice, not the silent default
    mode: str | None = None
    #: with PERMISSIVE: column name to capture the raw malformed record
    corrupt_record_col: str | None = None

    def __post_init__(self):
        self.file_types = (FileType.CSV,)


@dataclass
class JsonLoadOptions(LoadOptions):
    multi_line: bool | None = None
    encoding: str | None = None
    sampling_ratio: float | None = None
    date_format: str | None = None
    timestamp_format: str | None = None
    mode: str | None = None
    corrupt_record_col: str | None = None

    def __post_init__(self):
        self.file_types = (FileType.JSON, FileType.NDJSON)


@dataclass
class ParquetLoadOptions(LoadOptions):
    merge_schema: bool | None = None

    def __post_init__(self):
        self.file_types = (FileType.PARQUET,)


@dataclass
class PandasLoadOptions(LoadOptions):
    """Reference-parity name (``astro.options.PandasLoadOptions``): in the
    reference these are pandas ``read_*`` kwargs; here they ride the same
    declarative path as every other option set (``extra`` dict)."""


def resolve_load_options(
    load_options: LoadOptions | list[LoadOptions] | dict | None,
    ftype: FileType,
) -> dict[str, Any]:
    """Merge every applicable options object into one reader-options dict
    (later entries win), accepting the reference's list form, a single
    object, or a raw dict."""
    if load_options is None:
        return {}
    if isinstance(load_options, dict):
        return dict(load_options)
    if isinstance(load_options, LoadOptions):
        load_options = [load_options]
    out: dict[str, Any] = {}
    for opt in load_options:
        if opt.applies_to(ftype):
            out.update(opt.to_reader_options())
    return out
