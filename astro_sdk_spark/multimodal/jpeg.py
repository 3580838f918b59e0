"""Baseline JPEG codec (ITU-T T.81 / ISO 10918-1), stdlib + numpy only.

Makes the JPEG path of ``multimodal.codecs`` REAL instead of env-gated:
baseline sequential DCT decoding (SOF0) with arbitrary sampling factors
(4:4:4, 4:2:2, 4:2:0), multiple DQT/DHT segments, and restart markers;
plus an encoder (4:4:4 or 4:2:0, standard Annex K quantization and
Huffman tables) used both as a legitimate writer and as the test-fixture
generator — the container ships no Pillow to make fixtures with.

Progressive (SOF2), arithmetic coding, and 12-bit precision remain
honestly gated behind NotImplementedError — baseline covers the
overwhelming majority of training-corpus JPEGs; swap in Pillow/turbojpeg
for the rest via the same per-blob function contract.

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
    """Baseline JPEG → (H, W, C) uint8 (C = 1 grayscale or 3 RGB).

    Supports SOF0 (baseline sequential) with any sampling factors,
    multiple DQT/DHT segments, and DRI/RSTn restarts. SOF2 (progressive)
    and friends raise NotImplementedError."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF marker 0x{marker:02X} (progressive/arithmetic/"
                "lossless) not supported by the baseline codec — use Pillow"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
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
            return _decode_scan(
                blob, data_start, w, h, scan, qt, dc_tabs, ac_tabs,
                restart_interval,
            )
        pos += 2 + seglen
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
    # upsample chroma to full resolution (nearest), crop, color-convert
    full = []
    for c, p in zip(scan, planes):
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
