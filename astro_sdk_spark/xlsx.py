"""Minimal stdlib-only XLSX read/write (zipfile + SpreadsheetML XML).

Reference parity: ``python-sdk/src/astro/files/types/excel.py:13-46`` reads
and writes Excel via pandas (openpyxl under the hood). openpyxl is not
available in this environment, so this module implements the subset of the
OOXML spreadsheet format the reference path needs: one sheet, a header row,
inline or shared strings, numbers, booleans. Driver-side small-file path by
contract (same as the reference) — XLSX is not a scale format.

Writer notes: values are emitted as inline strings (no sharedStrings table
needed), numbers as plain ``<v>``, booleans as ``t="b"``. Reader notes:
handles shared strings, inline strings, formula-cached strings, booleans,
and numerics (int when integral), tolerating files produced by openpyxl,
pandas or Excel itself.
"""

from __future__ import annotations

import datetime
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index → A, B, …, Z, AA, …"""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(letters: str) -> int:
    out = 0
    for ch in letters:
        out = out * 26 + (ord(ch) - ord("A") + 1)
    return out - 1


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    if isinstance(value, (datetime.datetime, datetime.date)):
        value = value.isoformat()
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def write_xlsx(path: str, columns: list[str], rows: list[tuple]) -> None:
    """Write one sheet: a header row of column names, then the data rows."""
    body = []
    header = "".join(
        _cell_xml(f"{_col_letter(i)}1", str(c)) for i, c in enumerate(columns)
    )
    body.append(f'<row r="1">{header}</row>')
    for rix, row in enumerate(rows, start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(i)}{rix}", v) for i, v in enumerate(row)
        )
        body.append(f'<row r="{rix}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # an <si> may hold one <t> or multiple rich-text <r><t> runs
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(cell: ET.Element, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text == "1"
    num = float(v.text)
    return int(num) if num.is_integer() and "e" not in v.text.lower() and "." not in v.text else num


def read_xlsx(path: str) -> tuple[list[str], list[list]]:
    """Read the first worksheet: (header row as column names, data rows).
    Missing cells come back as None; ragged rows are padded to the header
    width."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        sheet_names = sorted(
            n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            raise ValueError(f"{path}: no worksheet found")
        root = ET.fromstring(z.read(sheet_names[0]))
    raw_rows: list[dict[int, object]] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for cix, cell in enumerate(row.findall(f"{_NS}c")):
            ref = cell.get("r")
            idx = _col_index(_CELL_REF.match(ref).group(1)) if ref else cix
            cells[idx] = _cell_value(cell, shared)
        raw_rows.append(cells)
    if not raw_rows:
        return [], []
    width = max(max(r.keys(), default=-1) for r in raw_rows) + 1
    header_cells = raw_rows[0]
    columns = [str(header_cells.get(i, f"col{i}")) for i in range(width)]
    rows = [[r.get(i) for i in range(width)] for r in raw_rows[1:]]
    return columns, rows
