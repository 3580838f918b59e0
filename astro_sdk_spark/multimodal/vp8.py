"""Lossy WebP (VP8 intra-frame) decoder — pure python + numpy, stdlib only.

Implements RFC 6386 keyframe decoding end-to-end: the boolean
arithmetic decoder, frame/segmentation/filter/quantizer headers,
keyframe intra-mode parsing, DCT token decoding, dequantization,
inverse WHT/DCT, all 4 16x16 / 4 chroma / 10 subblock intra predictors,
the in-loop deblocking filter (normal + simple), and libwebp-compatible
fancy chroma upsampling + fixed-point YUV→RGB for the final image.

Constant tables (default coefficient probabilities, update
probabilities, keyframe B-mode probabilities, dequant lookups) are the
published RFC 6386 values, regenerated and cross-validated by
tools/extract_vp8_tables.py.

Correctness contract: decoded Y/U/V planes are asserted BIT-EXACT
against libwebp's own ``WebPDecodeYUV`` on real lossy fixtures in
tests/test_vp8_lossy.py (oracle gated on the system library being
present; committed fixtures + stored hashes keep the test meaningful
without it).

Scale: one image decodes in one Python call — the Spark integration
(multimodal/ops.py) fans decodes out per-file via mapInPandas, so a
100 TB corpus parallelizes across executors; per-image latency is the
pure-python tradeoff, same stance as the JPEG/PNG/GIF codecs here.

Reference parity: the reference SDK delegates image IO to Pillow
(``astro/files/types/image.py``); this module supplies the lossy-WebP
share of that surface without native dependencies.

Only intra frames (which is all a still WebP contains) are supported.
"""

from __future__ import annotations

import numpy as np

from astro_sdk_spark.multimodal._vp8_tables import (
    AC_QUANT,
    COEF_PROBS,
    COEF_UPDATE,
    DC_QUANT,
    KF_BMODE_PROBS,
)

# ---------------------------------------------------------------------------
# boolean decoder (RFC 6386 §7)
# ---------------------------------------------------------------------------


class _Bool:
    """RFC 6386 boolean arithmetic decoder over one partition."""

    __slots__ = ("d", "n", "pos", "value", "range", "bits")

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data)
        self.pos = 2
        self.value = ((data[0] << 8) | data[1]) if self.n >= 2 else (
            (data[0] << 8) if self.n == 1 else 0
        )
        self.range = 255
        self.bits = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                if self.pos < self.n:
                    self.value |= self.d[self.pos]
                self.pos += 1
        return ret

    def flag(self) -> int:
        return self.get(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, t: tuple, p, start: int = 0) -> int:
        """Token-tree read: ``t`` holds child indexes, leaves stored as
        -(value + 1); ``p`` is indexed by node>>1."""
        i = start
        while True:
            i = t[i + self.get(p[i >> 1])]
            if i < 0:
                return -i - 1


# ---------------------------------------------------------------------------
# trees & small constants (RFC 6386 §8.2, §11, §13)
# ---------------------------------------------------------------------------

# luma 16x16 modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
# subblock modes
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)


def _L(v: int) -> int:
    return -(v + 1)


# keyframe ymode tree, probs {145, 156, 163, 128}
_KF_YMODE_TREE = (_L(B_PRED), 2, 4, 6, _L(DC_PRED), _L(V_PRED),
                  _L(H_PRED), _L(TM_PRED))
_KF_YMODE_PROBS = (145, 156, 163, 128)

# chroma mode tree, keyframe probs {142, 114, 183}
_UVMODE_TREE = (_L(DC_PRED), 2, _L(V_PRED), 4, _L(H_PRED), _L(TM_PRED))
_KF_UVMODE_PROBS = (142, 114, 183)

# subblock mode tree (10 leaves, 9 probs per context)
_BMODE_TREE = (_L(B_DC), 2, _L(B_TM), 4, _L(B_VE), 6, 8, 12,
               _L(B_HE), 10, _L(B_RD), _L(B_VR),
               _L(B_LD), 14, _L(B_VL), 16, _L(B_HD), _L(B_HU))

# 16x16 mode → implied subblock mode, for B-mode contexts (§11.3)
_YMODE_TO_B = (B_DC, B_VE, B_HE, B_TM)

# DCT token tree: EOB, 0, 1, 2, 3, 4, cat1..cat6
_T_EOB, _T_0, _T_1, _T_2, _T_3, _T_4 = range(6)
_T_CAT1, _T_CAT2, _T_CAT3, _T_CAT4, _T_CAT5, _T_CAT6 = range(6, 12)
_COEF_TREE = (_L(_T_EOB), 2, _L(_T_0), 4, _L(_T_1), 6, 8, 12,
              _L(_T_2), 10, _L(_T_3), _L(_T_4),
              14, 16, _L(_T_CAT1), _L(_T_CAT2),
              18, 20, _L(_T_CAT3), _L(_T_CAT4), _L(_T_CAT5), _L(_T_CAT6))

# category extra-bit probabilities and base values (§13.2)
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)

_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)


def _clip127(v: int, lo: int = 0, hi: int = 127) -> int:
    return lo if v < lo else (hi if v > hi else v)


def _reshape_probs(flat) -> list:
    """[4][8][3][11] nested lists from the flattened table."""
    it = iter(flat)
    return [[[[next(it) for _ in range(11)] for _ in range(3)]
             for _ in range(8)] for _ in range(4)]


_COEF_DEFAULT = _reshape_probs(COEF_PROBS)
_COEF_UPDATE = _reshape_probs(COEF_UPDATE)
# the extracted table is indexed in libwebp's B-mode enum order
# (…, RD=4, VR=5, LD=6, …), while this module numbers modes per RFC 6386
# (…, LD=4, RD=5, VR=6, …); permute rows/columns into RFC order
_BMODE_TO_LIBWEBP = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)
_KF_BMODE = [
    [[KF_BMODE_PROBS[(_BMODE_TO_LIBWEBP[a] * 10 + _BMODE_TO_LIBWEBP[l]) * 9
                     + i] for i in range(9)]
     for l in range(10)] for a in range(10)
]


# ---------------------------------------------------------------------------
# header parsing (RFC 6386 §9)
# ---------------------------------------------------------------------------


class _Frame:
    """Parsed frame state: headers, per-MB modes, coefficients."""


def _parse_uncompressed_header(data: bytes):
    if len(data) < 10:
        raise ValueError("vp8: truncated frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("vp8: not a keyframe (still WebP is intra-only)")
    version = (tag >> 1) & 7
    if version > 3:
        raise ValueError(f"vp8: bad version {version}")
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("vp8: bad keyframe start code")
    w = (data[6] | (data[7] << 8)) & 0x3FFF
    h = (data[8] | (data[9] << 8)) & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("vp8: zero dimension")
    return w, h, first_part_size, version


def _parse_header(bd: _Bool, f: _Frame) -> None:
    """First-partition header after the uncompressed part (§9.2–§9.11)."""
    if bd.get(128):  # color space: must be 0 for defined behavior
        raise ValueError("vp8: reserved color space")
    bd.flag()  # clamping type hint; decode clamps either way

    f.segmentation = bd.flag()
    f.seg_abs = 0
    f.seg_quant = [0, 0, 0, 0]
    f.seg_lf = [0, 0, 0, 0]
    f.seg_tree = [255, 255, 255]
    f.update_map = 0
    if f.segmentation:
        f.update_map = bd.flag()
        update_data = bd.flag()
        if update_data:
            f.seg_abs = bd.flag()
            for i in range(4):
                if bd.flag():
                    f.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.flag():
                    f.seg_lf[i] = bd.signed_literal(6)
        if f.update_map:
            for i in range(3):
                if bd.flag():
                    f.seg_tree[i] = bd.literal(8)

    f.filter_simple = bd.flag()
    f.filter_level = bd.literal(6)
    f.sharpness = bd.literal(3)
    f.lf_delta = bd.flag()
    f.ref_lf_delta = [0, 0, 0, 0]
    f.mode_lf_delta = [0, 0, 0, 0]
    if f.lf_delta:
        if bd.flag():  # deltas updated this frame
            for i in range(4):
                if bd.flag():
                    f.ref_lf_delta[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.flag():
                    f.mode_lf_delta[i] = bd.signed_literal(6)

    f.num_parts = 1 << bd.literal(2)

    f.y_ac_qi = bd.literal(7)
    f.y_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    f.y2_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    f.y2_ac_delta = bd.signed_literal(4) if bd.flag() else 0
    f.uv_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    f.uv_ac_delta = bd.signed_literal(4) if bd.flag() else 0

    bd.flag()  # refresh entropy probs — single-frame decode ignores it

    # token probability updates
    probs = [[[row[:] for row in ctx] for ctx in band]
             for band in _COEF_DEFAULT]
    upd = _COEF_UPDATE
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for ll in range(11):
                    if bd.get(upd[i][j][k][ll]):
                        probs[i][j][k][ll] = bd.literal(8)
    f.coef_probs = probs

    f.mb_no_skip = bd.flag()
    f.skip_prob = bd.literal(8) if f.mb_no_skip else 0


def _quant_factors(f: _Frame, segment: int):
    """Per-segment (y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac)."""
    if f.segmentation:
        base = f.seg_quant[segment] if f.seg_abs else (
            f.y_ac_qi + f.seg_quant[segment]
        )
    else:
        base = f.y_ac_qi
    q = _clip127(base)
    y1_dc = DC_QUANT[_clip127(q + f.y_dc_delta)]
    y1_ac = AC_QUANT[q]
    y2_dc = DC_QUANT[_clip127(q + f.y2_dc_delta)] * 2
    y2_ac = AC_QUANT[_clip127(q + f.y2_ac_delta)] * 155 // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = DC_QUANT[_clip127(q + f.uv_dc_delta, hi=117)]
    uv_ac = AC_QUANT[_clip127(q + f.uv_ac_delta)]
    return (y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac)


# ---------------------------------------------------------------------------
# mode parsing (keyframe, §11.2–§11.5)
# ---------------------------------------------------------------------------


def _parse_modes(bd: _Bool, f: _Frame) -> None:
    mw, mh = f.mb_w, f.mb_h
    f.seg_ids = [0] * (mw * mh)
    f.skips = [0] * (mw * mh)
    f.ymodes = [0] * (mw * mh)
    f.uvmodes = [0] * (mw * mh)
    f.bmodes = [None] * (mw * mh)

    above_sub = [[B_DC] * 4 for _ in range(mw)]
    for my in range(mh):
        left_sub = [B_DC] * 4
        for mx in range(mw):
            i = my * mw + mx
            if f.update_map:
                p = f.seg_tree
                if bd.get(p[0]):
                    f.seg_ids[i] = 2 + bd.get(p[2])
                else:
                    f.seg_ids[i] = bd.get(p[1])
            if f.mb_no_skip:
                f.skips[i] = bd.get(f.skip_prob)
            ymode = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            f.ymodes[i] = ymode
            if ymode == B_PRED:
                sub = [0] * 16
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    above = above_sub[mx][c] if r == 0 else sub[sb - 4]
                    left = left_sub[r] if c == 0 else sub[sb - 1]
                    sub[sb] = bd.tree(_BMODE_TREE, _KF_BMODE[above][left])
                f.bmodes[i] = sub
                above_sub[mx] = sub[12:16]
                left_sub = [sub[3], sub[7], sub[11], sub[15]]
            else:
                b = _YMODE_TO_B[ymode]
                above_sub[mx] = [b] * 4
                left_sub = [b] * 4
            f.uvmodes[i] = bd.tree(_UVMODE_TREE, _KF_UVMODE_PROBS)


# ---------------------------------------------------------------------------
# residual (token) parsing (§13)
# ---------------------------------------------------------------------------


def _decode_block(bd: _Bool, probs, plane_type: int, first: int, ctx: int,
                  dq_dc: int, dq_ac: int, out: list) -> int:
    """Decode one 4x4 block's tokens into ``out`` (natural order,
    dequantized). Returns 1 if any coefficient is nonzero."""
    tp = probs[plane_type]
    p = tp[_BANDS[first]][ctx]
    n = first
    nonzero = 0
    skip_eob = 0  # after a zero token EOB cannot follow: start at node 2
    while n < 16:
        token = bd.tree(_COEF_TREE, p, start=skip_eob)
        if token == _T_EOB:
            break
        if token == _T_0:
            n += 1
            if n == 16:
                break
            p = tp[_BANDS[n]][0]
            skip_eob = 2
            continue
        skip_eob = 0
        if token <= _T_4:
            v = token - _T_0  # DCT_1..DCT_4 carry their value
        else:
            cat = token - _T_CAT1
            v = _CAT_BASE[cat]
            extra = 0
            for pr in _CAT_PROBS[cat]:
                extra = (extra << 1) | bd.get(pr)
            v += extra
        if bd.flag():
            v = -v
        out[_ZIGZAG[n]] = v * (dq_dc if n == 0 else dq_ac)
        nonzero = 1
        n += 1
        if n == 16:
            break
        nc = 2 if (v > 1 or v < -1) else 1
        p = tp[_BANDS[n]][nc]
    return nonzero


def _parse_residuals(bd: _Bool, f: _Frame, mx: int, my: int,
                     above_nz, left_nz):
    """All coefficient blocks for one MB. Returns (y_coeffs, u_coeffs,
    v_coeffs, mb_has_coeffs): y is a list of 16 lists of 16 ints."""
    i = my * f.mb_w + mx
    i4x4 = f.ymodes[i] == B_PRED
    dq = f.dq[f.seg_ids[i]]
    a = above_nz[mx]
    le = left_nz

    if f.skips[i]:
        # skipped MB: zero coefficients; contexts reset (Y2 context only
        # when this MB actually has a Y2 block — §13.1)
        for k in range(8):
            a[k] = le[k] = 0
        if not i4x4:
            a[8] = le[8] = 0
        zero16 = [0] * 16
        return ([zero16] * 16, [zero16] * 4, [zero16] * 4, 0)

    y = [[0] * 16 for _ in range(16)]
    u = [[0] * 16 for _ in range(4)]
    v = [[0] * 16 for _ in range(4)]
    mb_nz = 0

    if not i4x4:
        y2 = [0] * 16
        ctx = a[8] + le[8]
        nz = _decode_block(bd, f.coef_probs, 1, 0, ctx, dq[2], dq[3], y2)
        a[8] = le[8] = nz
        mb_nz |= nz
        _inv_wht(y2, y)
        first = 1
        ytype = 0
    else:
        first = 0
        ytype = 3

    for sb in range(16):
        r, c = divmod(sb, 4)
        ctx = a[c] + le[r]
        nz = _decode_block(bd, f.coef_probs, ytype, first, ctx,
                           dq[0], dq[1], y[sb])
        a[c] = le[r] = nz
        mb_nz |= nz
    for pi, plane in ((0, u), (1, v)):
        for sb in range(4):
            r, c = divmod(sb, 2)
            ai = 4 + pi * 2 + c
            li = 4 + pi * 2 + r
            ctx = a[ai] + le[li]
            nz = _decode_block(bd, f.coef_probs, 2, 0, ctx,
                               dq[4], dq[5], plane[sb])
            a[ai] = le[li] = nz
            mb_nz |= nz
    return (y, u, v, mb_nz)


# ---------------------------------------------------------------------------
# inverse transforms (§14.3–§14.4)
# ---------------------------------------------------------------------------


def _inv_wht(y2: list, y_blocks: list) -> None:
    """Inverse Walsh-Hadamard on the Y2 block; results become the DC
    (position 0) of each of the 16 luma blocks."""
    tmp = [0] * 16
    for i in range(4):
        a0 = y2[i] + y2[12 + i]
        a1 = y2[4 + i] + y2[8 + i]
        a2 = y2[4 + i] - y2[8 + i]
        a3 = y2[i] - y2[12 + i]
        tmp[i] = a0 + a1
        tmp[8 + i] = a0 - a1
        tmp[4 + i] = a3 + a2
        tmp[12 + i] = a3 - a2
    for i in range(4):
        dc = tmp[i * 4] + 3
        a0 = dc + tmp[i * 4 + 3]
        a1 = tmp[i * 4 + 1] + tmp[i * 4 + 2]
        a2 = tmp[i * 4 + 1] - tmp[i * 4 + 2]
        a3 = dc - tmp[i * 4 + 3]
        y_blocks[i * 4 + 0][0] = (a0 + a1) >> 3
        y_blocks[i * 4 + 1][0] = (a3 + a2) >> 3
        y_blocks[i * 4 + 2][0] = (a0 - a1) >> 3
        y_blocks[i * 4 + 3][0] = (a3 - a2) >> 3


def _idct4x4(block: list) -> list:
    """RFC 6386 §14.4 integer inverse DCT; returns 16 residuals."""
    # DC-only shortcut is bit-exact with the full transform
    if not any(block[1:]):
        v = (block[0] + 4) >> 3
        return [v] * 16
    c1, c2 = 20091, 35468
    tmp = [0] * 16
    for i in range(4):
        ip0, ip4, ip8, ip12 = block[i], block[i + 4], block[i + 8], block[i + 12]
        a1 = ip0 + ip8
        b1 = ip0 - ip8
        t1 = (ip4 * c2) >> 16
        t2 = ip12 + ((ip12 * c1) >> 16)
        cc1 = t1 - t2
        t1 = ip4 + ((ip4 * c1) >> 16)
        t2 = (ip12 * c2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + cc1
        tmp[i + 8] = b1 - cc1
    out = [0] * 16
    for i in range(4):
        ip0, ip1, ip2, ip3 = tmp[i * 4:i * 4 + 4]
        a1 = ip0 + ip2
        b1 = ip0 - ip2
        t1 = (ip1 * c2) >> 16
        t2 = ip3 + ((ip3 * c1) >> 16)
        cc1 = t1 - t2
        t1 = ip1 + ((ip1 * c1) >> 16)
        t2 = (ip3 * c2) >> 16
        d1 = t1 + t2
        out[i * 4] = (a1 + d1 + 4) >> 3
        out[i * 4 + 3] = (a1 - d1 + 4) >> 3
        out[i * 4 + 1] = (b1 + cc1 + 4) >> 3
        out[i * 4 + 2] = (b1 - cc1 + 4) >> 3
    return out


# ---------------------------------------------------------------------------
# intra prediction (§12)
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred_full(canvas, x0, y0, size, mode):
    """Whole-block DC/V/H/TM prediction for 16x16 luma or 8x8 chroma.
    Outside-frame conventions: above row = 127, left column = 129,
    top-left = 127 on the top row else 129 on the left edge (§12.2)."""
    have_above = y0 > 0
    have_left = x0 > 0
    if have_above:
        above = canvas[y0 - 1, x0:x0 + size].astype(np.int32)
    else:
        above = np.full(size, 127, np.int32)
    if have_left:
        left = canvas[y0:y0 + size, x0 - 1].astype(np.int32)
    else:
        left = np.full(size, 129, np.int32)
    if mode == DC_PRED:
        if have_above and have_left:
            shift = 5 if size == 16 else 4
            dc = (int(above.sum()) + int(left.sum()) + size) >> shift
        elif have_above:
            shift = 4 if size == 16 else 3
            dc = (int(above.sum()) + (size >> 1)) >> shift
        elif have_left:
            shift = 4 if size == 16 else 3
            dc = (int(left.sum()) + (size >> 1)) >> shift
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    # TM_PRED; top-left follows the same edge conventions as the row
    # and column it joins: 127 above the frame, 129 left of it
    if not have_above:
        tl = 127
    elif not have_left:
        tl = 129
    else:
        tl = int(canvas[y0 - 1, x0 - 1])
    pred = left[:, None] + above[None, :] - tl
    return np.clip(pred, 0, 255)


def _sub_neighbors(canvas, x, y, w_px, ar_src):
    """Neighbor pixels for one 4x4 subblock at canvas position (x, y).
    Returns (above[4], above_right[4], left[4], top_left) as ints with
    the VP8 edge conventions. ``ar_src`` supplies the above-right pixels
    for right-column subblocks (the above-MB-row rule, §12.3)."""
    if y > 0:
        a = [int(v) for v in canvas[y - 1, x:x + 4]]
    else:
        a = [127, 127, 127, 127]
    if ar_src is not None:
        ar = ar_src
    elif y > 0:
        if x + 8 <= w_px:
            ar = [int(v) for v in canvas[y - 1, x + 4:x + 8]]
        else:
            ar = [int(canvas[y - 1, w_px - 1])] * 4
    else:
        ar = [127, 127, 127, 127]
    if x > 0:
        le = [int(v) for v in canvas[y:y + 4, x - 1]]
    else:
        le = [129, 129, 129, 129]
    if y == 0:
        tl = 127
    elif x == 0:
        tl = 129
    else:
        tl = int(canvas[y - 1, x - 1])
    return a, ar, le, tl


def _pred4(mode, a, ar, le, tl):
    """One 4x4 subblock predictor (§12.3). Returns a 4x4 list grid
    indexed [row][col]."""
    A, B, C, D = a
    E, F, G, H = ar
    I, J, K, L = le
    X = tl
    g = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        dc = (A + B + C + D + I + J + K + L + 4) >> 3
        for r in range(4):
            for c in range(4):
                g[r][c] = dc
    elif mode == B_TM:
        for r in range(4):
            base = le[r] - X
            for c in range(4):
                v = base + a[c]
                g[r][c] = 0 if v < 0 else (255 if v > 255 else v)
    elif mode == B_VE:
        row = (_avg3(X, A, B), _avg3(A, B, C), _avg3(B, C, D), _avg3(C, D, E))
        for r in range(4):
            g[r] = list(row)
    elif mode == B_HE:
        col = (_avg3(X, I, J), _avg3(I, J, K), _avg3(J, K, L), _avg3(K, L, L))
        for r in range(4):
            for c in range(4):
                g[r][c] = col[r]
    elif mode == B_LD:
        e = (A, B, C, D, E, F, G, H)
        for r in range(4):
            for c in range(4):
                i = r + c
                g[r][c] = _avg3(e[i], e[i + 1], e[i + 2]) if i < 6 else \
                    _avg3(G, H, H)
    elif mode == B_RD:
        e = (L, K, J, I, X, A, B, C, D)
        for r in range(4):
            for c in range(4):
                i = c - r + 4  # diagonal index into the edge walk
                g[r][c] = _avg3(e[i - 1], e[i], e[i + 1])
    elif mode == B_VR:
        g[0][0] = g[2][1] = _avg2(X, A)
        g[0][1] = g[2][2] = _avg2(A, B)
        g[0][2] = g[2][3] = _avg2(B, C)
        g[0][3] = _avg2(C, D)
        g[3][0] = _avg3(K, J, I)
        g[2][0] = _avg3(J, I, X)
        g[1][0] = g[3][1] = _avg3(I, X, A)
        g[1][1] = g[3][2] = _avg3(X, A, B)
        g[1][2] = g[3][3] = _avg3(A, B, C)
        g[1][3] = _avg3(B, C, D)
    elif mode == B_VL:
        g[0][0] = _avg2(A, B)
        g[0][1] = g[2][0] = _avg2(B, C)
        g[0][2] = g[2][1] = _avg2(C, D)
        g[0][3] = g[2][2] = _avg2(D, E)
        g[1][0] = _avg3(A, B, C)
        g[1][1] = g[3][0] = _avg3(B, C, D)
        g[1][2] = g[3][1] = _avg3(C, D, E)
        g[1][3] = g[3][2] = _avg3(D, E, F)
        g[2][3] = _avg3(E, F, G)
        g[3][3] = _avg3(F, G, H)
    elif mode == B_HD:
        g[0][0] = g[1][2] = _avg2(I, X)
        g[1][0] = g[2][2] = _avg2(J, I)
        g[2][0] = g[3][2] = _avg2(K, J)
        g[3][0] = _avg2(L, K)
        g[0][3] = _avg3(A, B, C)
        g[0][2] = _avg3(X, A, B)
        g[0][1] = g[1][3] = _avg3(I, X, A)
        g[1][1] = g[2][3] = _avg3(X, I, J)
        g[2][1] = g[3][3] = _avg3(I, J, K)
        g[3][1] = _avg3(J, K, L)
    elif mode == B_HU:
        g[0][0] = _avg2(I, J)
        g[0][2] = g[1][0] = _avg2(J, K)
        g[1][2] = g[2][0] = _avg2(K, L)
        g[0][1] = _avg3(I, J, K)
        g[0][3] = g[1][1] = _avg3(J, K, L)
        g[1][3] = g[2][1] = _avg3(K, L, L)
        g[2][2] = g[2][3] = g[3][0] = g[3][1] = g[3][2] = g[3][3] = L
    else:
        raise ValueError(f"vp8: bad subblock mode {mode}")
    return g


# ---------------------------------------------------------------------------
# reconstruction (§14.5)
# ---------------------------------------------------------------------------


def _reconstruct_mb(f, Y, U, V, mx, my, yb, ub, vb) -> None:
    i = my * f.mb_w + mx
    x0, y0 = mx * 16, my * 16
    w_px = f.mb_w * 16
    ymode = f.ymodes[i]
    if ymode != B_PRED:
        pred = _pred_full(Y, x0, y0, 16, ymode)
        for sb in range(16):
            r, c = divmod(sb, 4)
            res = np.array(_idct4x4(yb[sb]), np.int32).reshape(4, 4)
            blk = pred[r * 4:r * 4 + 4, c * 4:c * 4 + 4] + res
            Y[y0 + r * 4:y0 + r * 4 + 4, x0 + c * 4:x0 + c * 4 + 4] = (
                np.clip(blk, 0, 255).astype(np.uint8)
            )
    else:
        # above-right for right-column subblocks always comes from the
        # row above the MACROBLOCK (stale for rows 1-3 — §12.3 quirk)
        if my == 0:
            ar_mb = [127, 127, 127, 127]
        elif mx == f.mb_w - 1:
            ar_mb = [int(Y[y0 - 1, w_px - 1])] * 4
        else:
            ar_mb = [int(v) for v in Y[y0 - 1, x0 + 16:x0 + 20]]
        bmodes = f.bmodes[i]
        for sb in range(16):
            r, c = divmod(sb, 4)
            x, y = x0 + c * 4, y0 + r * 4
            a, ar, le, tl = _sub_neighbors(
                Y, x, y, w_px, ar_mb if c == 3 else None
            )
            g = _pred4(bmodes[sb], a, ar, le, tl)
            res = _idct4x4(yb[sb])
            for rr in range(4):
                row = Y[y + rr]
                gr = g[rr]
                base = rr * 4
                for cc in range(4):
                    v = gr[cc] + res[base + cc]
                    row[x + cc] = 0 if v < 0 else (255 if v > 255 else v)
    uv_mode = f.uvmodes[i]
    cx, cy = mx * 8, my * 8
    for plane, blocks in ((U, ub), (V, vb)):
        pred = _pred_full(plane, cx, cy, 8, uv_mode)
        for sb in range(4):
            r, c = divmod(sb, 2)
            res = np.array(_idct4x4(blocks[sb]), np.int32).reshape(4, 4)
            blk = pred[r * 4:r * 4 + 4, c * 4:c * 4 + 4] + res
            plane[cy + r * 4:cy + r * 4 + 4, cx + c * 4:cx + c * 4 + 4] = (
                np.clip(blk, 0, 255).astype(np.uint8)
            )


# ---------------------------------------------------------------------------
# in-loop deblocking filter (§15)
# ---------------------------------------------------------------------------


def _c128(v: int) -> int:
    return -128 if v < -128 else (127 if v > 127 else v)


def _normal_line(seq, interior, edge_limit, hev_t, mb_edge):
    """One 8-pixel line across an edge: seq = [p3..q3] ints. Returns the
    modified line or None if the filter mask rejects it."""
    p3, p2, p1, p0, q0, q1, q2, q3 = seq
    if not (abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
            and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
            and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior
            and abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit):
        return None
    hev = abs(p1 - p0) > hev_t or abs(q1 - q0) > hev_t
    ps2, ps1, ps0 = p2 - 128, p1 - 128, p0 - 128
    qs0, qs1, qs2 = q0 - 128, q1 - 128, q2 - 128
    if not mb_edge:
        a = _c128(ps1 - qs1) if hev else 0
        a = _c128(a + 3 * (qs0 - ps0))
        f1 = _c128(a + 4) >> 3
        f2 = _c128(a + 3) >> 3
        q0 = _c128(qs0 - f1) + 128
        p0 = _c128(ps0 + f2) + 128
        if not hev:
            a2 = (f1 + 1) >> 1
            q1 = _c128(qs1 - a2) + 128
            p1 = _c128(ps1 + a2) + 128
        return (p3, p2, p1, p0, q0, q1, q2, q3)
    # macroblock-edge 6-tap filter
    filt = _c128(_c128(ps1 - qs1) + 3 * (qs0 - ps0))
    if hev:
        f1 = _c128(filt + 4) >> 3
        f2 = _c128(filt + 3) >> 3
        q0 = _c128(qs0 - f1) + 128
        p0 = _c128(ps0 + f2) + 128
        return (p3, p2, p1, p0, q0, q1, q2, q3)
    u = _c128((27 * filt + 63) >> 7)
    q0 = _c128(qs0 - u) + 128
    p0 = _c128(ps0 + u) + 128
    u = _c128((18 * filt + 63) >> 7)
    q1 = _c128(qs1 - u) + 128
    p1 = _c128(ps1 + u) + 128
    u = _c128((9 * filt + 63) >> 7)
    q2 = _c128(qs2 - u) + 128
    p2 = _c128(ps2 + u) + 128
    return (p3, p2, p1, p0, q0, q1, q2, q3)


def _simple_line(seq, edge_limit):
    p1, p0, q0, q1 = seq[2], seq[3], seq[4], seq[5]
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 > edge_limit:
        return None
    ps1, ps0, qs0, qs1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _c128(_c128(ps1 - qs1) + 3 * (qs0 - ps0))
    f1 = _c128(a + 4) >> 3
    f2 = _c128(a + 3) >> 3
    return (seq[0], seq[1], p1, _c128(ps0 + f2) + 128,
            _c128(qs0 - f1) + 128, q1, seq[6], seq[7])


def _c128v(v):
    # np.minimum/np.maximum directly: ~3x cheaper than np.clip's
    # wrapper dispatch on the tiny per-edge arrays this path works on
    return np.maximum(np.minimum(v, 127), -128)


def _filter_lines_vec(seq, interior, edge_limit, hev_t, mb_edge, simple):
    """Vectorized line filter: seq is (N, 8) int32 [p3..q3] per line.
    Returns the filtered (N, 8) array — same arithmetic as the scalar
    spec transcription, all branches folded into masks."""
    p3, p2, p1, p0 = seq[:, 0], seq[:, 1], seq[:, 2], seq[:, 3]
    q0, q1, q2, q3 = seq[:, 4], seq[:, 5], seq[:, 6], seq[:, 7]
    if simple:
        mask = (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2) <= edge_limit
        ps1, ps0, qs0, qs1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
        a = _c128v(_c128v(ps1 - qs1) + 3 * (qs0 - ps0))
        f1 = _c128v(a + 4) >> 3
        f2 = _c128v(a + 3) >> 3
        out = seq.copy()
        out[:, 3] = np.where(mask, _c128v(ps0 + f2) + 128, p0)
        out[:, 4] = np.where(mask, _c128v(qs0 - f1) + 128, q0)
        return out
    mask = ((np.abs(p3 - p2) <= interior) & (np.abs(p2 - p1) <= interior)
            & (np.abs(p1 - p0) <= interior) & (np.abs(q1 - q0) <= interior)
            & (np.abs(q2 - q1) <= interior) & (np.abs(q3 - q2) <= interior)
            & ((np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2) <= edge_limit))
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    ps2, ps1, ps0 = p2 - 128, p1 - 128, p0 - 128
    qs0, qs1, qs2 = q0 - 128, q1 - 128, q2 - 128
    out = seq.copy()
    if not mb_edge:
        a = _c128v(np.where(hev, _c128v(ps1 - qs1), 0) + 3 * (qs0 - ps0))
        f1 = _c128v(a + 4) >> 3
        f2 = _c128v(a + 3) >> 3
        n_q0 = _c128v(qs0 - f1) + 128
        n_p0 = _c128v(ps0 + f2) + 128
        a2 = (f1 + 1) >> 1
        n_q1 = np.where(hev, q1, _c128v(qs1 - a2) + 128)
        n_p1 = np.where(hev, p1, _c128v(ps1 + a2) + 128)
        out[:, 2] = np.where(mask, n_p1, p1)
        out[:, 3] = np.where(mask, n_p0, p0)
        out[:, 4] = np.where(mask, n_q0, q0)
        out[:, 5] = np.where(mask, n_q1, q1)
        return out
    filt = _c128v(_c128v(ps1 - qs1) + 3 * (qs0 - ps0))
    w = np.where(hev, filt, 0)
    f1 = _c128v(w + 4) >> 3
    f2 = _c128v(w + 3) >> 3
    hev_q0 = _c128v(qs0 - f1) + 128
    hev_p0 = _c128v(ps0 + f2) + 128
    fn = np.where(hev, 0, filt)
    u27 = _c128v((27 * fn + 63) >> 7)
    u18 = _c128v((18 * fn + 63) >> 7)
    u9 = _c128v((9 * fn + 63) >> 7)
    n_q0 = np.where(hev, hev_q0, _c128v(qs0 - u27) + 128)
    n_p0 = np.where(hev, hev_p0, _c128v(ps0 + u27) + 128)
    n_q1 = np.where(hev, q1, _c128v(qs1 - u18) + 128)
    n_p1 = np.where(hev, p1, _c128v(ps1 + u18) + 128)
    n_q2 = np.where(hev, q2, _c128v(qs2 - u9) + 128)
    n_p2 = np.where(hev, p2, _c128v(ps2 + u9) + 128)
    out[:, 1] = np.where(mask, n_p2, p2)
    out[:, 2] = np.where(mask, n_p1, p1)
    out[:, 3] = np.where(mask, n_p0, p0)
    out[:, 4] = np.where(mask, n_q0, q0)
    out[:, 5] = np.where(mask, n_q1, q1)
    out[:, 6] = np.where(mask, n_q2, q2)
    return out


def _filter_edge(plane, x, y, length, vertical, interior, edge_limit,
                 hev_t, mb_edge, simple):
    """Filter one edge of ``length`` lines (vectorized across lines).
    vertical=True means the edge runs vertically at column x (lines are
    horizontal pixel runs)."""
    if vertical:
        seq = plane[y:y + length, x - 4:x + 4].astype(np.int32)
    else:
        seq = plane[y - 4:y + 4, x:x + length].T.astype(np.int32)
    out = _filter_lines_vec(seq, interior, edge_limit, hev_t, mb_edge,
                            simple)
    if vertical:
        plane[y:y + length, x - 4:x + 4] = out.astype(np.uint8)
    else:
        plane[y - 4:y + 4, x:x + length] = out.T.astype(np.uint8)


def _mb_filter_level(f, i: int) -> int:
    seg = f.seg_ids[i]
    if f.segmentation:
        level = f.seg_lf[seg] if f.seg_abs else f.filter_level + f.seg_lf[seg]
    else:
        level = f.filter_level
    if f.lf_delta:
        level += f.ref_lf_delta[0]  # intra frame
        if f.ymodes[i] == B_PRED:
            level += f.mode_lf_delta[0]
    return 0 if level < 0 else (63 if level > 63 else level)


def _loop_filter(f, Y, U, V) -> None:
    if f.filter_level == 0 and not (f.segmentation or f.lf_delta):
        return
    simple = bool(f.filter_simple)
    for my in range(f.mb_h):
        for mx in range(f.mb_w):
            i = my * f.mb_w + mx
            level = f.mb_filter_levels[i]
            if level == 0:
                continue
            interior = level
            if f.sharpness:
                interior >>= 2 if f.sharpness > 4 else 1
                if interior > 9 - f.sharpness:
                    interior = 9 - f.sharpness
            if interior < 1:
                interior = 1
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_lim = (level + 2) * 2 + interior
            sub_lim = level * 2 + interior
            inner = f.mb_has_coeffs[i] or f.ymodes[i] == B_PRED
            x0, y0 = mx * 16, my * 16
            cx, cy = mx * 8, my * 8
            # vertical edges (left MB edge, then interior columns)
            if mx > 0:
                _filter_edge(Y, x0, y0, 16, True, interior, mb_lim,
                             hev_t, True, simple)
                if not simple:
                    _filter_edge(U, cx, cy, 8, True, interior, mb_lim,
                                 hev_t, True, False)
                    _filter_edge(V, cx, cy, 8, True, interior, mb_lim,
                                 hev_t, True, False)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge(Y, x0 + dx, y0, 16, True, interior,
                                 sub_lim, hev_t, False, simple)
                if not simple:
                    _filter_edge(U, cx + 4, cy, 8, True, interior,
                                 sub_lim, hev_t, False, False)
                    _filter_edge(V, cx + 4, cy, 8, True, interior,
                                 sub_lim, hev_t, False, False)
            # horizontal edges (top MB edge, then interior rows)
            if my > 0:
                _filter_edge(Y, x0, y0, 16, False, interior, mb_lim,
                             hev_t, True, simple)
                if not simple:
                    _filter_edge(U, cx, cy, 8, False, interior, mb_lim,
                                 hev_t, True, False)
                    _filter_edge(V, cx, cy, 8, False, interior, mb_lim,
                                 hev_t, True, False)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge(Y, x0, y0 + dy, 16, False, interior,
                                 sub_lim, hev_t, False, simple)
                if not simple:
                    _filter_edge(U, cx, cy + 4, 8, False, interior,
                                 sub_lim, hev_t, False, False)
                    _filter_edge(V, cx, cy + 4, 8, False, interior,
                                 sub_lim, hev_t, False, False)


# ---------------------------------------------------------------------------
# frame decode driver
# ---------------------------------------------------------------------------


def decode_vp8_frame(data: bytes):
    """VP8 keyframe payload → (Y, U, V) uint8 planes, cropped to the
    visible frame (Y: h×w; U/V: ceil-half dimensions)."""
    data = bytes(data)
    w, h, first_size, _version = _parse_uncompressed_header(data)
    if 10 + first_size > len(data):
        raise ValueError("vp8: first partition overruns frame")
    f = _Frame()
    f.w, f.h = w, h
    f.mb_w, f.mb_h = (w + 15) // 16, (h + 15) // 16
    bd = _Bool(data[10:10 + first_size])
    _parse_header(bd, f)
    f.dq = [_quant_factors(f, s) for s in range(4)]
    _parse_modes(bd, f)

    off = 10 + first_size
    sizes = []
    for _ in range(f.num_parts - 1):
        if off + 3 > len(data):
            raise ValueError("vp8: truncated partition table")
        sizes.append(data[off] | (data[off + 1] << 8) | (data[off + 2] << 16))
        off += 3
    parts = []
    for k in range(f.num_parts):
        if k < f.num_parts - 1:
            end = off + sizes[k]
            if end > len(data):
                raise ValueError("vp8: truncated token partition")
            parts.append(_Bool(data[off:end]))
            off = end
        else:
            parts.append(_Bool(data[off:]))

    w16, h16 = f.mb_w * 16, f.mb_h * 16
    Y = np.empty((h16, w16), np.uint8)
    U = np.empty((h16 // 2, w16 // 2), np.uint8)
    V = np.empty((h16 // 2, w16 // 2), np.uint8)

    above_nz = [[0] * 9 for _ in range(f.mb_w)]
    f.mb_has_coeffs = [0] * (f.mb_w * f.mb_h)
    f.mb_filter_levels = [0] * (f.mb_w * f.mb_h)
    for my in range(f.mb_h):
        tbd = parts[my % f.num_parts]
        left_nz = [0] * 9
        for mx in range(f.mb_w):
            i = my * f.mb_w + mx
            yb, ub, vb, mb_nz = _parse_residuals(tbd, f, mx, my,
                                                 above_nz, left_nz)
            f.mb_has_coeffs[i] = mb_nz
            f.mb_filter_levels[i] = _mb_filter_level(f, i)
            _reconstruct_mb(f, Y, U, V, mx, my, yb, ub, vb)

    _loop_filter(f, Y, U, V)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return Y[:h, :w].copy(), U[:ch, :cw].copy(), V[:ch, :cw].copy()


# ---------------------------------------------------------------------------
# output conversion: fancy chroma upsampling + fixed-point YUV→RGB
# ---------------------------------------------------------------------------


def _upsample_plane(C: np.ndarray, H: int, W: int) -> np.ndarray:
    """2x chroma upsampling with libwebp's 'fancy' two-stage rounded
    bilinear kernel (9-3-3-1 via diag intermediates). Bit-exact with
    the reference upsampler."""
    Hc, Wc = C.shape
    rt = np.empty(H, np.intp)
    rb = np.empty(H, np.intp)
    kind = np.empty(H, np.intp)  # 0 = "top" line formulas, 1 = "bottom"
    rt[0] = rb[0] = 0
    kind[0] = 0
    for j in range(1, H):
        if j & 1:
            k = (j + 1) >> 1
            if k >= Hc:  # trailing odd row (even H): replicate last row
                rt[j] = rb[j] = Hc - 1
                kind[j] = 0
            else:
                rt[j], rb[j], kind[j] = k - 1, k, 0
        else:
            k = j >> 1
            rt[j], rb[j], kind[j] = k - 1, k, 1
    T = C[rt].astype(np.int32)
    B = C[rb].astype(np.int32)
    out = np.empty((H, W), np.int32)
    k0 = kind == 0
    out[:, 0] = np.where(k0, (3 * T[:, 0] + B[:, 0] + 2) >> 2,
                         (3 * B[:, 0] + T[:, 0] + 2) >> 2)
    lpp = (W - 1) >> 1
    if lpp >= 1:
        x = np.arange(1, lpp + 1)
        a = T[:, x - 1]
        b = T[:, x]
        c = B[:, x - 1]
        d = B[:, x]
        diag12 = (a + 3 * b + 3 * c + d + 8) >> 3
        diag03 = (3 * a + b + c + 3 * d + 8) >> 3
        k0c = k0[:, None]
        out[:, 2 * x - 1] = np.where(k0c, (diag12 + a) >> 1, (diag03 + c) >> 1)
        out[:, 2 * x] = np.where(k0c, (diag03 + b) >> 1, (diag12 + d) >> 1)
    if W >= 2 and W % 2 == 0:
        out[:, W - 1] = np.where(k0, (3 * T[:, Wc - 1] + B[:, Wc - 1] + 2) >> 2,
                                 (3 * B[:, Wc - 1] + T[:, Wc - 1] + 2) >> 2)
    return out


def _yuv_to_rgb(Y: np.ndarray, Uf: np.ndarray, Vf: np.ndarray) -> np.ndarray:
    """libwebp's fixed-point BT.601 conversion (values are full planes)."""
    y = (Y.astype(np.int32) * 19077) >> 8
    u = Uf
    v = Vf
    r = y + ((v * 26149) >> 8) - 14234
    g = y - ((u * 6419) >> 8) - ((v * 13320) >> 8) + 8708
    b = y + ((u * 33050) >> 8) - 17685
    out = np.empty(Y.shape + (3,), np.uint8)
    out[..., 0] = np.clip(r >> 6, 0, 255)
    out[..., 1] = np.clip(g >> 6, 0, 255)
    out[..., 2] = np.clip(b >> 6, 0, 255)
    return out


def decode_vp8(data: bytes) -> np.ndarray:
    """VP8 keyframe payload → (H, W, 3) uint8 RGB, matching libwebp's
    default fancy-upsampling decode byte-for-byte."""
    Y, U, V = decode_vp8_frame(data)
    h, w = Y.shape
    return _yuv_to_rgb(Y, _upsample_plane(U, h, w), _upsample_plane(V, h, w))
