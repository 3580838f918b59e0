"""Stdlib-only legacy binary ``.xls`` (BIFF8) reader AND writer.

Reference parity: ``python-sdk/src/astro/files/types/excel.py:13-46`` reads
``.xls`` via ``pd.read_excel`` (xlrd under the hood) and historically wrote
it via xlwt (since retired from pandas). Neither xlrd nor any Excel library
is available in this environment, so this module implements the subset of
the public formats needed to load and write a worksheet:

- the OLE2 / Compound File Binary container ([MS-CFB]): header, DIFAT,
  FAT chains, directory entries, and the mini-stream/miniFAT for streams
  under the 4096-byte cutoff;
- the BIFF8 record stream ([MS-XLS]): SST shared strings (including
  CONTINUE-record splits with per-fragment compression flags), BOUNDSHEET
  offsets, and the cell records LABELSST, LABEL, NUMBER, RK, MULRK,
  BOOLERR, FORMULA (cached result + trailing STRING), BLANK/MULBLANK.

Scope matches the xlsx module: driver-side small-file path (xls caps at
65536 rows by format), first worksheet, first row = header. Date cells are
returned as their raw serial numbers — distinguishing dates from plain
numbers requires the XF/FORMAT record chain, which ``pd.read_excel``
resolves via xlrd; callers needing datetimes should convert explicitly.

The write path (:func:`write_xls`) emits LABELSST/NUMBER/BOOLERR cells,
chooses the mini-stream or regular-FAT container automatically by size,
and CONTINUE-splits the SST at the 8224-byte record cap — see the writer
section below.
"""

from __future__ import annotations

import struct

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE

# BIFF8 record ids
_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_BLANK = 0x0201
_MULBLANK = 0x00BE


# ---------------------------------------------------------------- OLE2/CFB


def _sector_chain(data: bytes, fat: list[int], start: int, sector_size: int,
                  offset: int) -> bytes:
    """Concatenate a FAT (or miniFAT) chain starting at ``start``.

    ``offset`` is the byte position of sector 0 (512 for the main FAT,
    0 for chains over an already-extracted mini stream)."""
    out = bytearray()
    sect = start
    seen = 0
    while sect != _ENDOFCHAIN and sect != _FREE:
        pos = offset + sect * sector_size
        out += data[pos:pos + sector_size]
        if sect >= len(fat):
            raise ValueError(f"xls: corrupt sector chain (sector {sect})")
        sect = fat[sect]
        seen += 1
        if seen > len(fat) + 1:
            raise ValueError("xls: cyclic sector chain")
    return bytes(out)


def _u32s(b: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(b) // 4}I", b[: len(b) // 4 * 4]))


def _ole_open_workbook(data: bytes) -> bytes:
    """Parse the CFB container and return the Workbook/Book stream bytes."""
    if data[:8] != _OLE_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic) — not .xls")
    sector_shift = struct.unpack("<H", data[30:32])[0]
    mini_shift = struct.unpack("<H", data[32:34])[0]
    sector_size = 1 << sector_shift
    mini_size = 1 << mini_shift
    n_fat = struct.unpack("<I", data[44:48])[0]
    dir_start = struct.unpack("<I", data[48:52])[0]
    mini_cutoff = struct.unpack("<I", data[56:60])[0]
    minifat_start = struct.unpack("<I", data[60:64])[0]
    difat_start = struct.unpack("<I", data[68:72])[0]
    n_difat = struct.unpack("<I", data[72:76])[0]

    # DIFAT: 109 entries in the header, then chained DIFAT sectors whose
    # last u32 points at the next DIFAT sector.
    difat = _u32s(data[76:512])
    sect = difat_start
    for _ in range(n_difat):
        if sect in (_ENDOFCHAIN, _FREE):
            break
        pos = 512 + sect * sector_size
        entries = _u32s(data[pos:pos + sector_size])
        difat += entries[:-1]
        sect = entries[-1]
    fat_sectors = [s for s in difat if s not in (_FREE, _ENDOFCHAIN)][:n_fat]

    fat: list[int] = []
    for s in fat_sectors:
        pos = 512 + s * sector_size
        fat += _u32s(data[pos:pos + sector_size])

    directory = _sector_chain(data, fat, dir_start, sector_size, 512)
    root_start = root_size = None
    wb_start = wb_size = None
    for off in range(0, len(directory) - 127, 128):
        entry = directory[off:off + 128]
        name_len = struct.unpack("<H", entry[64:66])[0]
        if name_len < 2:
            continue
        name = entry[: name_len - 2].decode("utf-16-le", errors="replace")
        obj_type = entry[66]
        start = struct.unpack("<I", entry[116:120])[0]
        size = struct.unpack("<Q", entry[120:128])[0]
        if obj_type == 5:  # root storage → mini stream location
            root_start, root_size = start, size
        elif obj_type == 2 and name in ("Workbook", "Book"):
            wb_start, wb_size = start, size
    if wb_start is None:
        raise ValueError("xls: no Workbook/Book stream in OLE2 container")

    if wb_size >= mini_cutoff:
        return _sector_chain(data, fat, wb_start, sector_size, 512)[:wb_size]

    # Small stream: lives in the mini stream, chained through the miniFAT.
    if root_start is None:
        raise ValueError("xls: mini stream missing root entry")
    mini_stream = _sector_chain(data, fat, root_start, sector_size, 512)[:root_size]
    minifat = _u32s(_sector_chain(data, fat, minifat_start, sector_size, 512))
    return _sector_chain(mini_stream, minifat, wb_start, mini_size, 0)[:wb_size]


# ------------------------------------------------------------------ BIFF8


def _records(stream: bytes):
    """Yield (record_id, payload_offset, payload_len) without copying."""
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, pos)
        if rid == 0:
            break
        yield rid, pos + 4, ln
        pos += 4 + ln


def _parse_sst(stream: bytes, offset: int, length: int) -> list[str]:
    """Parse the SST record plus its CONTINUE records.

    Strings are XLUnicodeRichExtendedString: cch(2) grbit(1)
    [cRun(2) if rich] [cbExt(4) if ext] chars(cch or 2*cch bytes)
    [4*cRun rich bytes] [cbExt bytes]. A string may split across a
    CONTINUE boundary; when the split lands inside the character data,
    the continuation opens with a fresh compression-flag byte."""
    # Gather the SST payload fragments: the SST record itself, then every
    # directly following CONTINUE record.
    frags: list[bytes] = [stream[offset:offset + length]]
    pos = offset + length
    while pos + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, pos)
        if rid != _CONTINUE:
            break
        frags.append(stream[pos + 4:pos + 4 + ln])
        pos += 4 + ln

    n_unique = struct.unpack_from("<I", frags[0], 4)[0]
    strings: list[str] = []
    fi = 0                      # fragment index
    fp = 8                      # position within fragment (skip cst+cstUnique)

    def _avail() -> int:
        return len(frags[fi]) - fp

    def _advance_fragment() -> None:
        nonlocal fi, fp
        fi += 1
        fp = 0
        if fi >= len(frags):
            raise ValueError("xls: SST truncated")

    def _read(nbytes: int) -> bytes:
        """Read raw bytes that may NOT span fragments mid-field headers —
        used for fixed headers, which Excel never splits."""
        nonlocal fp
        if _avail() == 0:
            _advance_fragment()
        if _avail() < nbytes:
            raise ValueError("xls: SST field split unexpectedly")
        out = frags[fi][fp:fp + nbytes]
        fp += nbytes
        return out

    def _read_chars(cch: int, high: bool) -> str:
        """Read cch UTF-16 code units (or compressed bytes), following
        fragment splits; each new fragment restarts with its own
        compression-flag byte. UTF-16 spans run through an incremental
        decoder so a surrogate pair split across a CONTINUE boundary
        (legal — cch counts code units) reassembles correctly."""
        import codecs as _codecs

        nonlocal fp
        dec = _codecs.getincrementaldecoder("utf-16-le")()
        out: list[str] = []
        remaining = cch
        width = 2 if high else 1
        while remaining:
            if _avail() == 0:
                _advance_fragment()
                flag = frags[fi][fp]
                fp += 1
                high = bool(flag & 0x01)
                width = 2 if high else 1
            take = min(remaining, _avail() // width)
            if take == 0:
                raise ValueError("xls: SST char data truncated")
            raw = frags[fi][fp:fp + take * width]
            fp += take * width
            out.append(dec.decode(raw) if high else raw.decode("latin-1"))
            remaining -= take
        out.append(dec.decode(b"", True))
        return "".join(out)

    def _skip(nbytes: int) -> None:
        """Skip trailing rich/ext payloads, which may span fragments."""
        nonlocal fp
        remaining = nbytes
        while remaining:
            if _avail() == 0:
                _advance_fragment()
            take = min(remaining, _avail())
            fp += take
            remaining -= take

    for _ in range(n_unique):
        cch = struct.unpack("<H", _read(2))[0]
        grbit = _read(1)[0]
        high = bool(grbit & 0x01)
        rich = bool(grbit & 0x08)
        ext = bool(grbit & 0x04)
        c_run = struct.unpack("<H", _read(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", _read(4))[0] if ext else 0
        strings.append(_read_chars(cch, high))
        _skip(4 * c_run + cb_ext)
    return strings


def _decode_rk(rk: int) -> float | int:
    """RK-packed number: 30-bit int or truncated IEEE double, /100 flag."""
    f_div100 = rk & 0x01
    f_int = rk & 0x02
    if f_int:
        val: float | int = rk >> 2
        if rk & 0x80000000:  # sign-extend the 30-bit int
            val = (rk >> 2) - (1 << 30)
    else:
        val = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    if f_div100:
        val = val / 100
    return val


def _unicode_string(payload: bytes, pos: int) -> str:
    """XLUnicodeString: cch(2) grbit(1) chars — used by LABEL/STRING."""
    cch, grbit = struct.unpack_from("<HB", payload, pos)
    pos += 3
    if grbit & 0x01:
        return payload[pos:pos + 2 * cch].decode("utf-16-le")
    return payload[pos:pos + cch].decode("latin-1")


def _maybe_int(v: float | int):
    if isinstance(v, float) and v.is_integer() and abs(v) < 2**53:
        return int(v)
    return v


def read_xls(path: str) -> tuple[list[str], list[list]]:
    """Read the first worksheet of a BIFF8 .xls → (header, rows).

    Mirrors ``xlsx.read_xlsx``: first row is the header; numeric cells
    come back as int when integral, floats otherwise; missing cells are
    None; rows are padded to the header width.
    """
    with open(path, "rb") as f:
        data = f.read()
    stream = _ole_open_workbook(data)

    sst: list[str] = []
    sheet_offsets: list[int] = []
    for rid, off, ln in _records(stream):
        if rid == _SST:
            sst = _parse_sst(stream, off, ln)
        elif rid == _BOUNDSHEET:
            sheet_offsets.append(struct.unpack_from("<I", stream, off)[0])
        elif rid == _EOF:
            break  # end of workbook-globals substream
    if not sheet_offsets:
        raise ValueError("xls: no worksheets (missing BOUNDSHEET)")

    cells: dict[tuple[int, int], object] = {}
    max_row = -1
    max_col = -1

    def put(r: int, c: int, v: object) -> None:
        nonlocal max_row, max_col
        cells[(r, c)] = v
        max_row = max(max_row, r)
        max_col = max(max_col, c)

    sheet = stream[sheet_offsets[0]:]
    pending_formula: tuple[int, int] | None = None
    depth = 0
    for rid, off, ln in _records(sheet):
        if rid == _BOF:
            depth += 1
            continue
        if rid == _EOF:
            depth -= 1
            if depth <= 0:
                break
            continue
        if rid == _LABELSST:
            r, c, _, isst = struct.unpack_from("<HHHI", sheet, off)
            put(r, c, sst[isst] if isst < len(sst) else None)
        elif rid == _NUMBER:
            r, c, _ = struct.unpack_from("<HHH", sheet, off)
            put(r, c, _maybe_int(struct.unpack_from("<d", sheet, off + 6)[0]))
        elif rid == _RK:
            r, c, _, rk = struct.unpack_from("<HHHI", sheet, off)
            put(r, c, _maybe_int(_decode_rk(rk)))
        elif rid == _MULRK:
            r, c0 = struct.unpack_from("<HH", sheet, off)
            n = (ln - 6) // 6
            for i in range(n):
                rk = struct.unpack_from("<I", sheet, off + 4 + i * 6 + 2)[0]
                put(r, c0 + i, _maybe_int(_decode_rk(rk)))
        elif rid == _BOOLERR:
            r, c, _, val, f_err = struct.unpack_from("<HHHBB", sheet, off)
            put(r, c, None if f_err else bool(val))
        elif rid == _LABEL:
            r, c, _ = struct.unpack_from("<HHH", sheet, off)
            put(r, c, _unicode_string(sheet, off + 6))
        elif rid == _FORMULA:
            r, c, _ = struct.unpack_from("<HHH", sheet, off)
            result = sheet[off + 6:off + 14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:       # string → value in the next STRING record
                    pending_formula = (r, c)
                elif kind == 1:
                    put(r, c, bool(result[2]))
                elif kind == 3:
                    put(r, c, None)
                # kind == 2 (error) → leave missing
            else:
                put(r, c, _maybe_int(struct.unpack("<d", result)[0]))
        elif rid == _STRING and pending_formula is not None:
            put(*pending_formula, _unicode_string(sheet, off))
            pending_formula = None
        elif rid in (_BLANK, _MULBLANK):
            pass

    if max_row < 0:
        return [], []
    width = max_col + 1
    header = [
        str(cells.get((0, c), f"col{c}")) for c in range(width)
    ]
    rows = [
        [cells.get((r, c)) for c in range(width)]
        for r in range(1, max_row + 1)
    ]
    return header, rows


# ------------------------------------------------------------------ writer
#
# Write path: pandas dropped .xls writing when xlwt retired, so the
# reference stack cannot produce these files any more — but plenty of
# legacy consumers still ingest them. Both public formats are implemented
# from their specs ([MS-XLS] BIFF8 records, [MS-CFB] compound container),
# mirroring the reader above: LABELSST+SST for strings (CONTINUE-split at
# 8224-byte record boundaries, mid-string splits carry a fresh
# compression-flag byte), NUMBER for numerics, BOOLERR for booleans; the
# BIFF stream lands in the mini stream when under the 4096-byte cutoff
# and in regular FAT sectors otherwise.

_MAX_RECORD = 8224          # BIFF8 record payload cap
_SECTOR = 512
_MINI_SECTOR = 64
_MINI_CUTOFF = 4096
_FATSECT = 0xFFFFFFFD
_NOSTREAM = 0xFFFFFFFF


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _sst_records(strings: list[str], total_refs: int) -> bytes:
    """SST + CONTINUE records. Strings are always written uncompressed
    (UTF-16-LE, grbit 0x01); records split at string boundaries when
    possible, mid-characters (with a fresh flag byte) when one string
    alone exceeds the record cap."""
    out = bytearray()
    cur = bytearray(struct.pack("<II", total_refs, len(strings)))
    rid = _SST

    def flush() -> None:
        nonlocal cur, rid
        out.extend(_rec(rid, bytes(cur)))
        rid = _CONTINUE
        cur = bytearray()

    for s in strings:
        data = s.encode("utf-16-le")
        n_units = len(data) // 2  # cch counts UTF-16 CODE UNITS, not chars
        if n_units > 0xFFFF:
            raise ValueError(
                f"xls cell text exceeds 65535 UTF-16 units ({n_units})"
            )
        header = struct.pack("<HB", n_units, 0x01)
        if len(cur) + len(header) > _MAX_RECORD:
            flush()
        cur += header
        pos = 0
        while pos < len(data):
            room = _MAX_RECORD - len(cur)
            if room < 2:
                flush()
                cur += b"\x01"  # continuation flag byte: still utf-16
                room = _MAX_RECORD - len(cur)
            take = min(len(data) - pos, room - room % 2)
            cur += data[pos:pos + take]
            pos += take
    flush()
    return bytes(out)


def _biff_stream(header: list[str], rows: list[list]) -> bytes:
    """Assemble the full Workbook BIFF8 stream (globals + one sheet)."""
    n_rows = len(rows) + 1
    n_cols = len(header)
    if n_rows > 65536:
        raise ValueError(f".xls caps at 65536 rows, got {n_rows}")
    if n_cols > 256:
        raise ValueError(f".xls caps at 256 columns, got {n_cols}")

    # Pass 1: classify cells, building the shared-string table.
    sst_index: dict[str, int] = {}
    sst_list: list[str] = []
    total_refs = 0

    def intern(s: str) -> int:
        nonlocal total_refs
        total_refs += 1
        if s not in sst_index:
            sst_index[s] = len(sst_list)
            sst_list.append(s)
        return sst_index[s]

    ixfe = 15  # default cell XF (after the 15 style XFs)
    cell_recs = bytearray()
    all_rows = [list(header)] + [list(r) for r in rows]
    for r, row in enumerate(all_rows):
        for c, v in enumerate(row[:n_cols]):
            if v is None:
                continue
            if isinstance(v, bool):
                cell_recs += _rec(
                    _BOOLERR, struct.pack("<HHHBB", r, c, ixfe, int(v), 0)
                )
            elif isinstance(v, (int, float)) and not isinstance(v, bool):
                as_f = float(v)
                if isinstance(v, int) and abs(v) >= 2 ** 53:
                    cell_recs += _rec(
                        _LABELSST,
                        struct.pack("<HHHI", r, c, ixfe, intern(str(v))),
                    )
                else:
                    cell_recs += _rec(
                        _NUMBER, struct.pack("<HHHd", r, c, ixfe, as_f)
                    )
            else:
                cell_recs += _rec(
                    _LABELSST,
                    struct.pack("<HHHI", r, c, ixfe, intern(str(v))),
                )

    # Globals substream. BOUNDSHEET's lbPlyPos needs the final globals
    # length, which depends on the SST — assemble SST first.
    sst = _sst_records(sst_list, total_refs)
    bof_globals = _rec(
        _BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0)
    )
    codepage = _rec(0x0042, struct.pack("<H", 1200))
    window1 = _rec(
        0x003D, struct.pack("<HHHHHHHHH", 0x0168, 0x011E, 0x3A5C, 0x23BE,
                            0x0038, 0, 0, 1, 0x0258)
    )
    font = _rec(
        0x0031,
        struct.pack("<HHHHHBBBB", 200, 0, 0x7FFF, 0x0190, 0, 0, 0, 0, 0)
        + struct.pack("<BB", 5, 0) + b"Arial",
    )
    xfs = bytearray()
    for i in range(16):
        f_style = 0xFFF5 if i < 15 else 0x0001
        xfs += _rec(
            0x00E0,
            struct.pack("<HHHBBBBIIH", 0, 0, f_style, 0x20, 0, 0, 0, 0, 0, 0x20C0),
        )
    sheet_name = b"Sheet1"
    boundsheet_len = 4 + 2 + 1 + 1 + len(sheet_name)
    globals_len = (
        len(bof_globals) + len(codepage) + len(window1) + len(font)
        + len(xfs) + 4 + boundsheet_len + len(sst) + 4  # +4s: rec headers
    )
    boundsheet = _rec(
        _BOUNDSHEET,
        struct.pack("<IHBB", globals_len, 0x0000, len(sheet_name), 0)
        + sheet_name,
    )
    glob = (
        bof_globals + codepage + window1 + font + bytes(xfs) + boundsheet
        + sst + _rec(_EOF, b"")
    )
    assert len(glob) == globals_len, (len(glob), globals_len)

    bof_sheet = _rec(
        _BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0)
    )
    dimensions = _rec(
        0x0200, struct.pack("<IIHHH", 0, n_rows, 0, n_cols, 0)
    )
    sheet = bof_sheet + dimensions + bytes(cell_recs) + _rec(_EOF, b"")
    return glob + sheet


def _dir_entry(name: str, obj_type: int, start: int, size: int,
               left: int = _NOSTREAM, right: int = _NOSTREAM,
               child: int = _NOSTREAM) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    entry = bytearray(128)
    entry[0:len(raw)] = raw
    struct.pack_into("<H", entry, 64, len(raw))
    entry[66] = obj_type
    entry[67] = 1  # black
    struct.pack_into("<III", entry, 68, left, right, child)
    struct.pack_into("<I", entry, 116, start)
    struct.pack_into("<Q", entry, 120, size)
    return bytes(entry)


def _free_dir_entry() -> bytes:
    entry = bytearray(128)
    struct.pack_into("<III", entry, 68, _NOSTREAM, _NOSTREAM, _NOSTREAM)
    struct.pack_into("<I", entry, 116, _FREE)
    return bytes(entry)


def write_xls(path: str, header: list[str], rows: list[list]) -> None:
    """Write (header, rows) as a single-sheet BIFF8 ``.xls``.

    Mirrors ``xlsx.write_xlsx``'s contract: first row is the header;
    str/int/float/bool/None are written natively, everything else as
    ``str(value)``. Round-trips through :func:`read_xls` and external
    BIFF8 consumers."""
    biff = _biff_stream([str(h) for h in header], rows)

    sectors: list[bytes] = []       # regular sectors, in order
    fat: list[int] = []             # parallel FAT entries

    def pad(b: bytes, size: int) -> bytes:
        return b + b"\x00" * (-len(b) % size)

    def add_chain(data: bytes) -> int:
        """Append data as a chained run of regular sectors; returns start."""
        chunks = [data[i:i + _SECTOR] for i in range(0, len(data), _SECTOR)] or [b""]
        start = len(sectors)
        for i, ch in enumerate(chunks):
            sectors.append(pad(ch, _SECTOR))
            fat.append(start + i + 1 if i + 1 < len(chunks) else _ENDOFCHAIN)
        return start

    use_mini = len(biff) < _MINI_CUTOFF
    if use_mini:
        # mini stream: BIFF chained through the miniFAT in 64-byte sectors
        n_mini = max(1, -(-len(biff) // _MINI_SECTOR))
        minifat_entries = [i + 1 for i in range(n_mini - 1)] + [_ENDOFCHAIN]
        minifat_start = add_chain(
            pad(b"".join(struct.pack("<I", e) for e in minifat_entries), _SECTOR)
        )
        mini_container = pad(biff, _MINI_SECTOR)
        root_start = add_chain(mini_container)
        root_size = len(mini_container)
        wb_start, wb_size = 0, len(biff)   # mini-sector index 0
        n_minifat_sectors = 1
    else:
        minifat_start = _ENDOFCHAIN
        n_minifat_sectors = 0
        wb_start = add_chain(biff)
        wb_size = len(biff)
        root_start, root_size = _ENDOFCHAIN, 0

    directory = (
        _dir_entry("Root Entry", 5, root_start, root_size, child=1)
        + _dir_entry("Workbook", 2, wb_start, wb_size)
        + _free_dir_entry() + _free_dir_entry()
    )
    dir_start = add_chain(directory)

    # FAT sector(s) go last; they must also mark themselves.
    n_data = len(sectors)
    n_fat = 1
    while (n_data + n_fat) > n_fat * (_SECTOR // 4):
        n_fat += 1
    if n_fat > 109:
        raise ValueError(".xls writer: workbook too large for header DIFAT")
    fat_start = n_data
    full_fat = fat + [_FATSECT] * n_fat
    full_fat += [_FREE] * (n_fat * (_SECTOR // 4) - len(full_fat))
    fat_bytes = b"".join(struct.pack("<I", e) for e in full_fat)
    for i in range(n_fat):
        sectors.append(fat_bytes[i * _SECTOR:(i + 1) * _SECTOR])

    head = bytearray(512)
    head[0:8] = _OLE_MAGIC
    struct.pack_into("<H", head, 24, 0x003E)      # minor version
    struct.pack_into("<H", head, 26, 0x0003)      # major version (512B)
    struct.pack_into("<H", head, 28, 0xFFFE)      # little-endian
    struct.pack_into("<H", head, 30, 9)           # sector shift
    struct.pack_into("<H", head, 32, 6)           # mini sector shift
    struct.pack_into("<I", head, 44, n_fat)
    struct.pack_into("<I", head, 48, dir_start)
    struct.pack_into("<I", head, 56, _MINI_CUTOFF)
    struct.pack_into("<I", head, 60, minifat_start)
    struct.pack_into("<I", head, 64, n_minifat_sectors)
    struct.pack_into("<I", head, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", head, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", head, 76 + 4 * i, fat_start + i if i < n_fat else _FREE
        )

    with open(path, "wb") as f:
        f.write(bytes(head))
        for s in sectors:
            f.write(s)
