"""Baseline + progressive JPEG codec (ITU-T T.81 / ISO 10918-1),
stdlib + numpy only.

Makes the JPEG path of ``multimodal.codecs`` REAL instead of env-gated:
baseline sequential DCT decoding (SOF0) with arbitrary sampling factors
(4:4:4, 4:2:2, 4:2:0), multiple DQT/DHT segments, and restart markers;
PROGRESSIVE decoding (SOF2, T.81 Annex G: spectral selection +
successive approximation, DC/AC first and refinement scans, EOB runs) —
the most common still-gated variant a crawled corpus actually contains;
plus encoders for both modes (4:4:4 or 4:2:0, standard Annex K
quantization and Huffman tables) used both as legitimate writers and as
the test-fixture generators — the container ships no Pillow to make
fixtures with. Progressive coefficient transport is lossless relative
to baseline (same quantized DCT coefficients, reorganized), so the
round-trip tests pin decode(progressive) == decode(baseline) EXACTLY.

ARITHMETIC-coded JPEG — sequential (SOF9) and progressive (SOF10),
Annex F QM-coder — decodes via ``multimodal.jpeg_arith`` under the
same exactness bar: an arithmetic encode carries the same quantized
coefficients as its Huffman twin, so decode(SOF9/SOF10) ==
decode(SOF0) byte-for-byte (pinned against live libjpeg encodes in
tests/test_jpeg_arith.py). Every DCT-based T.81 process decodes here.

Lossless mode, 12-bit precision, and hierarchical mode remain honestly
gated behind NotImplementedError; swap in Pillow/turbojpeg for those
via the same per-blob function contract.

Performance note: the Huffman entropy loop is Python-level (the DCT/color
math is vectorized numpy). That is fine for the metadata/feature passes
these codecs feed at small sizes; at production scale the same
``mapInPandas`` stage swaps in a native decoder unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3 Huffman table specs: (bits[1..16], values)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8-point DCT-II basis matrix (orthonormal): forward = C @ B @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


# ---------------------------------------------------------------- huffman


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol, canonical Huffman per T.81 C.2."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[vi]
            vi += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length)."""
    return {
        sym: (code, ln)
        for (ln, code), sym in _build_decode_table(bits, values).items()
    }


class _BitReader:
    """Entropy-coded-segment bit reader: un-stuffs 0xFF00, stops at
    markers (restarts are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos + 1 >= len(self.data):
            raise ValueError("jpeg: truncated entropy-coded segment")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: feed 0 bits (T.81 F.2.2.5 padding semantics)
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def align_and_expect_restart(self, n: int) -> None:
        """Drop buffered bits and scan forward to the RSTn marker.

        Leftover pad bits/bytes (and their stuffed 0xFF00 pairs) sit
        between the last consumed bit and the marker; RST markers are
        never stuffed, so scanning for FF D0–D7 is unambiguous."""
        self.acc = 0
        self.nbits = 0
        while True:
            if self.pos + 1 >= len(self.data):
                raise ValueError("jpeg: missing restart marker")
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ----------------------------------------------------------------- decode


def decode_jpeg(blob: bytes) -> np.ndarray:
    """JPEG → (H, W, C) uint8 (C = 1 grayscale or 3 RGB).

    Supports SOF0/SOF1 (baseline/extended sequential), SOF2
    (progressive: spectral selection + successive approximation, DC/AC
    first and refinement scans, EOB runs), and SOF9 (sequential with
    arithmetic coding — see ``multimodal.jpeg_arith``) with any
    sampling factors, multiple DQT/DHT segments, DAC conditioning, and
    DRI/RSTn restarts. Progressive-arithmetic/lossless/hierarchical
    SOFs raise NotImplementedError."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    arith = False
    dc_cond: dict[int, tuple] = {}  # DAC conditioning: tbl -> (L, U)
    ac_cond: dict[int, int] = {}  # tbl -> Kx
    prog: dict | None = None  # coefficient state across progressive scans
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("jpeg: bad marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while blob[pos + 1] == 0xFF and pos + 4 <= len(blob):
            pos += 1
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        seg = blob[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[sp:sp + 64], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                sp += 64
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1:sp + 17])
                nv = sum(bits)
                values = list(seg[sp + 17:sp + 17 + nv])
                if len(bits) < 16 or len(values) < nv:
                    raise ValueError("jpeg: truncated DHT segment")
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_decode_table(
                    bits, values
                )
                sp += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):  # seq/prog ×huf/arith
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF marker 0x{marker:02X} (lossless/hierarchical) "
                "not supported by the built-in codec — use Pillow"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning
            sp = 0
            while sp + 1 < len(seg):
                tc, tb = seg[sp] >> 4, seg[sp] & 0x0F
                cs = seg[sp + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 15, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs  # Kx
                sp += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if progressive:
                if prog is None:
                    prog = _init_prog_state(comps, w, h)
                if arith:
                    pos = _decode_prog_scan_arith(
                        blob, pos + 2 + seglen, seg, comps, prog,
                        restart_interval, dc_cond, ac_cond,
                    )
                else:
                    pos = _decode_prog_scan(
                        blob, pos + 2 + seglen, seg, comps, prog,
                        dc_tabs, ac_tabs, restart_interval,
                    )
                continue
            ns = seg[0]
            if ns != len(comps):
                # a legal baseline variant, but the interleaved-MCU walker
                # below would decode the first scan's geometry wrongly —
                # gate honestly instead of returning garbage pixels
                raise NotImplementedError(
                    "jpeg: non-interleaved multi-scan baseline not "
                    "supported by the built-in codec — use Pillow"
                )
            scan: list[dict] = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append(
                    {**comp, "dc": tdta >> 4, "ac": tdta & 0x0F}
                )
            data_start = pos + 2 + seglen
            if arith:
                return _decode_scan_arith(
                    blob, data_start, w, h, scan, qt, restart_interval,
                    dc_cond, ac_cond,
                )
            return _decode_scan(
                blob, data_start, w, h, scan, qt, dc_tabs, ac_tabs,
                restart_interval,
            )
        pos += 2 + seglen
    if prog is not None:
        return _reconstruct_progressive(comps, prog, qt, w, h)
    raise ValueError("jpeg: no SOS marker found")


def _decode_scan(blob, pos, w, h, scan, qt, dc_tabs, ac_tabs, dri):
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in scan
    ]
    reader = _BitReader(blob, pos)
    preds = [0] * len(scan)
    n_rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            reader.align_and_expect_restart(n_rst)
            n_rst = (n_rst + 1) & 7
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(scan):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.float64)
                    t = reader.decode_symbol(dc_tabs[c["dc"]])
                    diff = _extend(reader.read_bits(t), t)
                    preds[ci] += diff
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tabs[c["ac"]])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        coef[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = coef
                    block = block.reshape(8, 8) * qt[c["tq"]]
                    px = _idct(block) + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = px
    return _finish_image(scan, planes, w, h, hmax, vmax)


def _decode_scan_arith(blob, pos, w, h, scan, qt, dri, dc_cond, ac_cond):
    """Sequential arithmetic-coded scan (SOF9): same MCU geometry and
    reconstruction as _decode_scan, entropy layer from jpeg_arith."""
    from astro_sdk_spark.multimodal.jpeg_arith import ArithEntropy

    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in scan
    ]
    ent = ArithEntropy(blob, pos, len(scan), dc_cond, ac_cond)
    n_rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            mk, resume = _arith_restart_pos(blob, ent)
            if mk != 0xD0 + n_rst:
                raise ValueError(
                    f"jpeg: expected RST{n_rst}, found 0x{mk:02X}"
                )
            n_rst = (n_rst + 1) & 7
            ent.restart(resume)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(scan):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.float64)
                    coef[0] = ent.decode_dc(ci, c["dc"])
                    ent.decode_ac(c["ac"], coef)
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = coef
                    block = block.reshape(8, 8) * qt[c["tq"]]
                    px = _idct(block) + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = px
    return _finish_image(scan, planes, w, h, hmax, vmax)


def _arith_restart_pos(blob, ent):
    """Locate the restart marker at an interval boundary. The QM
    decoder may already have run into it (recorded marker, bp at the
    marker byte) or may not have consumed that far yet — in the latter
    case skip remaining entropy bytes (0xFF00 pairs included) up to the
    next real marker. Returns (marker, position after it)."""
    dec = ent.dec
    if dec.marker is not None:
        return dec.marker, dec.bp + 1
    i = dec.bp
    while i + 1 < len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        j = i + 1
        while j < len(blob) and blob[j] == 0xFF:
            j += 1
        if j < len(blob) and blob[j] != 0:
            return blob[j], j + 1
        i = j + 1  # 0xFF00 stuffed pair: entropy data, keep scanning
    raise ValueError("jpeg: missing restart marker")


def _finish_image(comps, planes, w, h, hmax, vmax) -> np.ndarray:
    """Upsample chroma to full resolution (nearest), crop, color-convert
    — shared by the baseline and progressive reconstruction paths."""
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ----------------------------------------------- progressive decode (G.2)


def _init_prog_state(comps, w, h) -> dict:
    """Per-component coefficient accumulators, filled in across scans.

    ``coefs[ci]`` is (blocks_y, blocks_x, 64) int32 in ZIGZAG SCAN ORDER
    (coef[k] = k-th zigzag coefficient — the order every scan codes in);
    the array covers the padded MCU grid (interleaved DC scans walk it),
    while non-interleaved scans touch only the component's real block
    region (T.81 A.2.4 — padding blocks beyond it are never coded)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []
    nblocks = []  # (blocks_high, blocks_wide) of the REAL region per comp
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        nblocks.append((-(-ch // 8), -(-cw // 8)))
        coefs.append(
            np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        )
    return {
        "coefs": coefs, "nblocks": nblocks,
        "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
    }


def _decode_prog_scan(blob, data_start, seg, comps, prog,
                      dc_tabs, ac_tabs, dri) -> int:
    """Decode ONE progressive scan's entropy data into the coefficient
    state; returns the byte offset of the next marker."""
    ns = seg[0]
    members = []  # (comp index, dc table id, ac table id)
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
        ci = next(j for j, c in enumerate(comps) if c["id"] == cs)
        members.append((ci, tdta >> 4, tdta & 0x0F))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah_al = seg[3 + 2 * ns]
    ah, al = ah_al >> 4, ah_al & 0x0F
    reader = _BitReader(blob, data_start)
    # validate table references up front so a corrupt scan header keeps
    # the uniform corrupt-data contract (ValueError, never a raw
    # KeyError from the dict lookup — multimodal.ops classifies decode
    # failures by exception type)
    for _ci, _td, _ta in members:
        if ss == 0 and ah == 0 and _td not in dc_tabs:
            raise ValueError(
                f"jpeg: scan references undefined DC Huffman table {_td}"
            )
        if ss != 0 and _ta not in ac_tabs:
            raise ValueError(
                f"jpeg: scan references undefined AC Huffman table {_ta}"
            )
    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("jpeg: DC scan with Se != 0")
        _decode_prog_dc(reader, comps, prog, members, ah, al, dc_tabs, dri)
    else:  # AC scan: exactly one component (T.81 G.1.1.1.1)
        if ns != 1:
            raise ValueError("jpeg: progressive AC scan must be 1-component")
        _decode_prog_ac(
            reader, prog, members[0], ss, se, ah, al, ac_tabs, dri
        )
    # skip pad bits / stray restarts up to the next true marker
    p = reader.pos
    while p + 1 < len(blob):
        b2 = blob[p + 1]
        if blob[p] == 0xFF and b2 != 0x00 and not (0xD0 <= b2 <= 0xD7):
            return p
        p += 1
    return p


def _decode_prog_scan_arith(blob, data_start, seg, comps, prog, dri,
                            dc_cond, ac_cond) -> int:
    """One progressive arithmetic-coded scan (SOF10, T.81 §G with Annex
    F entropy): DC first/refinement over the interleaved MCU grid, AC
    first/refinement over one component's blocks. Statistics and
    decoder registers reset per scan and at every restart marker."""
    from astro_sdk_spark.multimodal.jpeg_arith import ArithEntropy

    ns = seg[0]
    members = []
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
        ci = next(j for j, c in enumerate(comps) if c["id"] == cs)
        members.append((ci, tdta >> 4, tdta & 0x0F))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
    ent = ArithEntropy(blob, data_start, len(comps), dc_cond, ac_cond)
    mcux, mcuy = prog["mcux"], prog["mcuy"]
    n_rst = 0

    def handle_restart(m):
        nonlocal n_rst
        if dri and m and m % dri == 0:
            mk, resume = _arith_restart_pos(blob, ent)
            if mk != 0xD0 + n_rst:
                raise ValueError(
                    f"jpeg: expected RST{n_rst}, found 0x{mk:02X}"
                )
            n_rst = (n_rst + 1) & 7
            ent.restart(resume)

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("jpeg: DC scan with Se != 0")
        interleaved = len(members) > 1
        if interleaved:
            units = mcux * mcuy
        else:
            bh, bw_ = prog["nblocks"][members[0][0]]
            units = bh * bw_
        for m in range(units):
            handle_restart(m)
            for (ci, td, _ta) in members:
                c = comps[ci]
                if interleaved:
                    my, mx = divmod(m, mcux)
                    blocks = [(my * c["v"] + by, mx * c["h"] + bx)
                              for by in range(c["v"]) for bx in range(c["h"])]
                else:
                    blocks = [divmod(m, prog["nblocks"][ci][1])]
                for (y, x) in blocks:
                    coef = prog["coefs"][ci][y, x]
                    if ah == 0:
                        coef[0] = ent.decode_dc(ci, td) << al
                    elif ent.decode_dc_refine():
                        coef[0] |= 1 << al
    else:  # AC scan: one component
        if ns != 1:
            raise ValueError("jpeg: progressive AC scan must be 1-component")
        ci, _td, ta = members[0]
        bh, bw_ = prog["nblocks"][ci]
        arr = prog["coefs"][ci]
        for m in range(bh * bw_):
            handle_restart(m)
            by, bx = divmod(m, bw_)
            if ah == 0:
                ent.decode_ac_first(ta, arr[by, bx], ss, se, al)
            else:
                ent.decode_ac_refine(ta, arr[by, bx], ss, se, al)

    # position of the next true marker after this scan's data
    dec = ent.dec
    if dec.marker is not None and not (0xD0 <= dec.marker <= 0xD7):
        return dec.bp - 1
    p = dec.bp
    while p + 1 < len(blob):
        b2 = blob[p + 1]
        if blob[p] == 0xFF and b2 != 0x00 and not (0xD0 <= b2 <= 0xD7):
            return p
        p += 1
    return p


def _decode_prog_dc(reader, comps, prog, members, ah, al, dc_tabs, dri):
    mcux, mcuy = prog["mcux"], prog["mcuy"]
    interleaved = len(members) > 1
    preds = [0] * len(members)
    n_rst = 0
    if interleaved:
        units = mcux * mcuy
    else:
        bh, bw_ = prog["nblocks"][members[0][0]]
        units = bh * bw_
    for m in range(units):
        if dri and m and m % dri == 0:
            reader.align_and_expect_restart(n_rst)
            n_rst = (n_rst + 1) & 7
            preds = [0] * len(members)
        for mi, (ci, td, _) in enumerate(members):
            c = comps[ci]
            blocks = []
            if interleaved:
                my, mx = divmod(m, mcux)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blocks.append((my * c["v"] + by, mx * c["h"] + bx))
            else:
                blocks.append(divmod(m, prog["nblocks"][ci][1]))
            for (y, x) in blocks:
                coef = prog["coefs"][ci][y, x]
                if ah == 0:  # first DC scan (G.2.1)
                    t = reader.decode_symbol(dc_tabs[td])
                    preds[mi] += _extend(reader.read_bits(t), t)
                    coef[0] = preds[mi] << al
                else:  # refinement: one bit per block (G.2.2)
                    if reader.read_bit():
                        coef[0] |= 1 << al


def _decode_prog_ac(reader, prog, member, ss, se, ah, al, ac_tabs, dri):
    ci, _, ta = member
    tab = ac_tabs[ta]
    bh, bw_ = prog["nblocks"][ci]
    arr = prog["coefs"][ci]
    eobrun = 0
    n_rst = 0
    for m in range(bh * bw_):
        if dri and m and m % dri == 0:
            reader.align_and_expect_restart(n_rst)
            n_rst = (n_rst + 1) & 7
            eobrun = 0
        by, bx = divmod(m, bw_)
        block = arr[by, bx]
        if ah == 0:
            eobrun = _ac_first_block(reader, tab, block, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_block(reader, tab, block, ss, se, al, eobrun)


def _ac_first_block(reader, tab, block, ss, se, al, eobrun) -> int:
    """First AC scan for one block (T.81 G.2.3 / figure G.3)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(tab)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("jpeg: AC index overflow")
            block[k] = _extend(reader.read_bits(s), s) << al
        else:
            if r != 15:  # EOBn: run of 2^r + appended-bits end-of-bands
                eobrun = (1 << r) - 1  # this block is a member
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += 15  # ZRL skips 16 zeros with the k += 1 below
        k += 1
    return eobrun


def _ac_refine_block(reader, tab, block, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3 / figure G.7): already-nonzero coefficients receive one
    correction bit each as the decoder advances; newly-significant
    coefficients arrive as ±1<<Al after a coded zero-run. The
    ``coef & p1`` set-bit test relies on two's-complement semantics for
    negatives — numpy int32 bitwise ops provide exactly that."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(tab)
            r, s = rs >> 4, rs & 0x0F
            sval = 0
            if s:
                if s != 1:
                    raise ValueError("jpeg: bad refinement magnitude")
                sval = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15 (ZRL): sval stays 0, skip 16 zero-history coefs
            while k <= se:
                if block[k] != 0:
                    if reader.read_bit():
                        if (int(block[k]) & p1) == 0:
                            block[k] += p1 if block[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                    # a zero coefficient consumed by the run
                k += 1
            if sval and k <= se:
                block[k] = sval
            k += 1
    if eobrun > 0:
        # end-of-band: remaining nonzero coefs still get correction bits
        while k <= se:
            if block[k] != 0:
                if reader.read_bit():
                    if (int(block[k]) & p1) == 0:
                        block[k] += p1 if block[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(comps, prog, qt, w, h) -> np.ndarray:
    """Dequantize + inverse DCT the accumulated coefficients (vectorized
    over all blocks of each component), then assemble like baseline."""
    planes = []
    for ci, c in enumerate(comps):
        cf = prog["coefs"][ci]
        by, bx = cf.shape[:2]
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[..., ZIGZAG] = cf  # zigzag scan order → natural order
        nat = nat.reshape(by, bx, 8, 8) * qt[c["tq"]][None, None]
        px = np.einsum("ij,abjk,kl->abil", _C.T, nat, _C) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    hmax = prog["hmax"]
    vmax = prog["vmax"]
    return _finish_image(comps, planes, w, h, hmax, vmax)


# ----------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, ln: int) -> None:
        self.acc = (self.acc << ln) | code
        self.nbits += ln
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary

    def marker(self, b: int) -> None:
        """Byte-align and emit a raw (unstuffed) marker — RSTn."""
        self.flush()
        self.out += bytes([0xFF, b])


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, block, qtab, dc_tab, ac_tab, pred) -> int:
    q = np.round(_fdct(block - 128.0) / qtab).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]  # natural order → zigzag scan order
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    t = int(diff).bit_length() if diff != 0 else 0
    mag = diff if diff >= 0 else diff + (1 << t) - 1
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(mag & ((1 << t) - 1), t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k] != 0:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        mag = v if v >= 0 else v + (1 << s) - 1
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(mag & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return pred


def _plane_setup(arr: np.ndarray, quality: int, subsample: bool):
    """Color-convert, subsample, MCU-pad — shared by both encoders.

    Returns ``(planes, hv, ql, qc, h, w, mcux, mcuy)``."""
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError(f"jpeg encoder needs 1 or 3 channels, got {nc}")
    ql = _scale_qt(QT_LUMA, quality)
    qc = _scale_qt(QT_CHROMA, quality)
    a = arr.astype(np.float64)
    if nc == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        chans = [y, cb, cr]
    else:
        chans = [a[..., 0]]
        subsample = False

    hv = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(x for x, _ in hv[:len(chans)])
    vmax = max(v for _, v in hv[:len(chans)])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = []
    for ci, ch in enumerate(chans):
        fh, fv = hv[ci]
        if (fh, fv) != (hmax, vmax):
            # box-filter downsample to the component resolution
            ry, rx = vmax // fv, hmax // fh
            ph = -(-h // ry) * ry
            pw = -(-w // rx) * rx
            pad = np.pad(ch, ((0, ph - h), (0, pw - w)), mode="edge")
            ch = pad.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th = mcuy * 8 * fv
        tw = mcux * 8 * fh
        planes.append(
            np.pad(ch, ((0, th - ch.shape[0]), (0, tw - ch.shape[1])),
                   mode="edge")
        )
    return planes, hv, ql, qc, h, w, mcux, mcuy


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 1|3) uint8 → baseline JPEG bytes. ``subsample=True`` writes
    4:2:0 chroma (exercises the decoder's upsampling path); default is
    4:4:4. ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every N MCUs (DC predictors reset). Standard Annex K quantization
    (quality-scaled) and Huffman tables."""
    planes, hv, ql, qc, h, w, mcux, mcuy = _plane_setup(
        arr, quality, subsample
    )
    chans = planes

    dc_l = _build_encode_table(*DC_LUMA_SPEC)
    ac_l = _build_encode_table(*AC_LUMA_SPEC)
    dc_c = _build_encode_table(*DC_CHROMA_SPEC)
    ac_c = _build_encode_table(*AC_CHROMA_SPEC)

    bw = _BitWriter()
    preds = [0] * len(chans)
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.marker(0xD0 | n_rst)
            n_rst = (n_rst + 1) & 7
            preds = [0] * len(chans)
        my, mx = divmod(m, mcux)
        for ci in range(len(chans)):
            fh, fv = hv[ci]
            qtab = ql if ci == 0 else qc
            dct = dc_l if ci == 0 else dc_c
            act = ac_l if ci == 0 else ac_c
            for by in range(fv):
                for bx in range(fh):
                    y0 = (my * fv + by) * 8
                    x0 = (mx * fh + bx) * 8
                    block = planes[ci][y0:y0 + 8, x0:x0 + 8]
                    preds[ci] = _encode_block(
                        bw, block, qtab, dct, act, preds[ci]
                    )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(
            0xDB,
            bytes([tq]) + bytes(int(x) for x in tbl.reshape(64)[ZIGZAG]),
        )

    def dht(tc: int, th: int, spec) -> bytes:
        bits, values = spec
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(values))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql)
    if len(chans) == 3:
        out += dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(chans)])
    for ci in range(len(chans)):
        fh, fv = hv[ci]
        sof += bytes([ci + 1, fh << 4 | fv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    out += dht(0, 0, DC_LUMA_SPEC)
    out += dht(1, 0, AC_LUMA_SPEC)
    if len(chans) == 3:
        out += dht(0, 1, DC_CHROMA_SPEC)
        out += dht(1, 1, AC_CHROMA_SPEC)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(chans)])
    for ci in range(len(chans)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------ progressive encode (G.1)


def _quantized_blocks(planes, hv, ql, qc):
    """Quantized DCT coefficients per component, zigzag scan order —
    computed block-by-block with the SAME arithmetic as the baseline
    encoder (``_encode_block``), so the progressive transport carries
    bit-identical coefficients and decode(prog) == decode(baseline)."""
    coefs = []
    for ci, plane in enumerate(planes):
        qtab = ql if ci == 0 else qc
        by, bx = plane.shape[0] // 8, plane.shape[1] // 8
        out = np.zeros((by, bx, 64), dtype=np.int32)
        for y in range(by):
            for x in range(bx):
                block = plane[y * 8:y * 8 + 8, x * 8:x * 8 + 8]
                q = np.round(_fdct(block - 128.0) / qtab).astype(np.int64)
                out[y, x] = q.reshape(64)[ZIGZAG]
        coefs.append(out)
    return coefs


# The Annex K.3 AC tables define only EOB0 (0x00) and ZRL (0xF0) among
# the s==0 symbols; progressive scans also emit EOBn run codes
# ((r<<4)|0, r=1..14), which baseline tables have no codes for. Real
# encoders build per-scan optimal tables; this fixture-grade writer uses
# a FLAT spec instead — every possible RS byte at 9 bits (255 of them)
# plus one at 10 — trivially canonical, never the all-ones code, and a
# few percent larger output, which is irrelevant for a correctness
# transport (the decoder handles any legal DHT either way).
FLAT_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


class _AcScanState:
    """Cross-block entropy state for one AC scan: the pending end-of-band
    run and the correction bits buffered with it (refinement scans)."""

    def __init__(self, bw: _BitWriter, ac_tab: dict) -> None:
        self.bw = bw
        self.ac_tab = ac_tab
        self.eobrun = 0
        self.be_bits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nb = self.eobrun.bit_length() - 1
            code, ln = self.ac_tab[nb << 4]
            self.bw.write(code, ln)
            if nb:
                self.bw.write(self.eobrun & ((1 << nb) - 1), nb)
            self.eobrun = 0
            for b in self.be_bits:
                self.bw.write(b, 1)
            self.be_bits = []


def _enc_ac_first_block(st: _AcScanState, block, ss, se, al) -> None:
    """First AC scan for one block (T.81 G.1.2.2): magnitudes are
    point-transformed (|v| >> Al), zero runs and EOB runs coded."""
    bw, ac_tab = st.bw, st.ac_tab
    r = 0
    for k in range(ss, se + 1):
        v = int(block[k])
        t = (-v if v < 0 else v) >> al
        if t == 0:
            r += 1
            continue
        st.flush_eobrun()
        while r > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            r -= 16
        s = t.bit_length()
        t2 = t if v >= 0 else ~t  # one's complement carries the sign
        code, ln = ac_tab[(r << 4) | s]
        bw.write(code, ln)
        bw.write(t2 & ((1 << s) - 1), s)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _enc_ac_refine_block(st: _AcScanState, block, ss, se, al) -> None:
    """AC refinement scan for one block (T.81 G.1.2.3 / figure G.7,
    the IJG buffered-correction-bits organization): coefficients already
    significant at coarser precision emit one correction bit (buffered
    until the next Huffman symbol so decoder and encoder interleave
    identically); newly-significant ones emit (run, 1) + a sign bit."""
    bw, ac_tab = st.bw, st.ac_tab
    absv = [0] * (se + 1)
    eob_k = ss - 1  # index of last NEWLY-significant coefficient
    for k in range(ss, se + 1):
        v = int(block[k])
        absv[k] = (-v if v < 0 else v) >> al
        if absv[k] == 1:
            eob_k = k
    r = 0
    br: list[int] = []  # this block's pending correction bits
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        # ZRLs that can't fold into the EOB must be emitted now, each
        # carrying the correction bits buffered so far
        while r > 15 and k <= eob_k:
            st.flush_eobrun()
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if t > 1:  # previously significant: one buffered correction bit
            br.append(t & 1)
            continue
        # newly significant (t == 1)
        st.flush_eobrun()
        code, ln = ac_tab[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(block[k]) >= 0 else 0, 1)
        for b in br:
            bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.be_bits.extend(br)
        if st.eobrun == 0x7FFF or len(st.be_bits) > 937:
            st.flush_eobrun()


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """(H, W, 1|3) uint8 → progressive JPEG bytes (SOF2).

    Scan script mirrors the common cjpeg default: an interleaved DC
    first scan at Al=1, per-component AC first scans at Al=1 (luma
    spectrally split 1-5 / 6-63), then DC and AC refinement passes down
    to Al=0 — so a decoder must exercise spectral selection, successive
    approximation, EOB runs, AND both refinement paths to read the
    output. Coefficient transport is lossless vs the baseline encoder at
    the same quality (pinned by the round-trip tests)."""
    planes, hv, ql, qc, h, w, mcux, mcuy = _plane_setup(
        arr, quality, subsample
    )
    nchan = len(planes)
    coefs = _quantized_blocks(planes, hv, ql, qc)
    hmax = max(x for x, _ in hv[:nchan])
    vmax = max(v for _, v in hv[:nchan])
    # real (non-MCU-padded) block regions, walked by non-interleaved scans
    nblocks = []
    for ci in range(nchan):
        fh, fv = hv[ci]
        cw = -(-w * fh // hmax)
        ch = -(-h * fv // vmax)
        nblocks.append((-(-ch // 8), -(-cw // 8)))

    dc_tabs = [
        _build_encode_table(*(DC_LUMA_SPEC if ci == 0 else DC_CHROMA_SPEC))
        for ci in range(nchan)
    ]
    flat_ac = _build_encode_table(*FLAT_AC_SPEC)
    ac_tabs = [flat_ac for _ in range(nchan)]

    def dc_first_scan(bw, al):
        preds = [0] * nchan
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci in range(nchan):
                fh, fv = hv[ci]
                tab = dc_tabs[ci]
                for by in range(fv):
                    for bx in range(fh):
                        v = int(coefs[ci][my * fv + by, mx * fh + bx, 0]) >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        t = diff.bit_length() if diff != 0 else 0
                        mag = diff if diff >= 0 else diff + (1 << t) - 1
                        code, ln = tab[t]
                        bw.write(code, ln)
                        if t:
                            bw.write(mag & ((1 << t) - 1), t)

    def dc_refine_scan(bw, al):
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci in range(nchan):
                fh, fv = hv[ci]
                for by in range(fv):
                    for bx in range(fh):
                        v = int(coefs[ci][my * fv + by, mx * fh + bx, 0])
                        bw.write((v >> al) & 1, 1)

    def ac_scan(bw, ci, ss, se, ah, al):
        st = _AcScanState(bw, ac_tabs[ci])
        bh, bw_blocks = nblocks[ci]
        enc = _enc_ac_first_block if ah == 0 else _enc_ac_refine_block
        for m in range(bh * bw_blocks):
            by, bx = divmod(m, bw_blocks)
            enc(st, coefs[ci][by, bx], ss, se, al)
        st.flush_eobrun()

    # (members, Ss, Se, Ah, Al); members = component indices
    script: list[tuple[list[int], int, int, int, int]] = [
        (list(range(nchan)), 0, 0, 0, 1),  # DC first, Al=1
    ]
    if nchan == 1:
        script += [([0], 1, 63, 0, 1), ([0], 1, 63, 1, 0)]
    else:
        script += [
            ([0], 1, 5, 0, 1),    # luma low band first
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 1),   # luma high band first
            ([0], 1, 63, 1, 0),   # luma refinement
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
        ]
    script.append((list(range(nchan)), 0, 0, 1, 0))  # DC refinement

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(
            0xDB,
            bytes([tq]) + bytes(int(x) for x in tbl.reshape(64)[ZIGZAG]),
        )

    def dht(tc: int, th: int, spec) -> bytes:
        bits, values = spec
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(values))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql)
    if nchan == 3:
        out += dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nchan])
    for ci in range(nchan):
        fh, fv = hv[ci]
        sof += bytes([ci + 1, fh << 4 | fv, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)  # SOF2: progressive DCT, Huffman
    out += dht(0, 0, DC_LUMA_SPEC)
    out += dht(1, 0, FLAT_AC_SPEC)  # shared by every AC scan
    if nchan == 3:
        out += dht(0, 1, DC_CHROMA_SPEC)

    for members, ss, se, ah, al in script:
        sos = bytes([len(members)])
        for ci in members:
            td = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        bw = _BitWriter()
        if ss == 0 and ah == 0:
            dc_first_scan(bw, al)
        elif ss == 0:
            dc_refine_scan(bw, al)
        else:
            ac_scan(bw, members[0], ss, se, ah, al)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
