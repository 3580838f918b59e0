"""Arithmetic-coded JPEG entropy decoding (ITU-T T.81 Annex F, QM-coder).

Sequential (SOF9) and progressive (SOF10) DCT with arithmetic coding:
the binary QM arithmetic decoder (conditional exchange,
renormalization, 0xFF00 unstuffing, zero-feed past markers), the
adaptive probability state machine of Table D.3, the DC/AC statistics
models of §F.1.4.4 (context bins conditioned on the previous DC
difference category and the zigzag index, DAC-marker conditioning
bounds L/U/Kx), and the §G progressive variants (DC/AC first and
successive-approximation refinement scans).

The state table below is T.81 Table D.3 — (Qe, NMPS, SWITCH, NLPS) per
index — transcribed from a system libjpeg's exported ``jpeg_aritab``
(the packed spec values, cross-checked against the published table's
first/last rows) rather than hand-typed.

Verified bit-exact against libjpeg's own arithmetic decoder on real
SOF9 encodes in tests/test_codecs.py (live ctypes oracle when the
library is present + committed certified fixtures).

Reference parity: the reference SDK reads JPEG via Pillow
(``astro/files/types/image.py``); arithmetic JPEG is part of that
surface.  multimodal/jpeg.py dispatches SOF9 scans here.
"""

from __future__ import annotations

_QM_STATES = (
    (0x5a1d, 1, 1, 1), (0x2586, 2, 0, 14), (0x1114, 3, 0, 16), (0x080b, 4, 0, 18),
    (0x03d8, 5, 0, 20), (0x01da, 6, 0, 23), (0x00e5, 7, 0, 25), (0x006f, 8, 0, 28),
    (0x0036, 9, 0, 30), (0x001a, 10, 0, 33), (0x000d, 11, 0, 35), (0x0006, 12, 0, 9),
    (0x0003, 13, 0, 10), (0x0001, 13, 0, 12), (0x5a7f, 15, 1, 15), (0x3f25, 16, 0, 36),
    (0x2cf2, 17, 0, 38), (0x207c, 18, 0, 39), (0x17b9, 19, 0, 40), (0x1182, 20, 0, 42),
    (0x0cef, 21, 0, 43), (0x09a1, 22, 0, 45), (0x072f, 23, 0, 46), (0x055c, 24, 0, 48),
    (0x0406, 25, 0, 49), (0x0303, 26, 0, 51), (0x0240, 27, 0, 52), (0x01b1, 28, 0, 54),
    (0x0144, 29, 0, 56), (0x00f5, 30, 0, 57), (0x00b7, 31, 0, 59), (0x008a, 32, 0, 60),
    (0x0068, 33, 0, 62), (0x004e, 34, 0, 63), (0x003b, 35, 0, 32), (0x002c, 9, 0, 33),
    (0x5ae1, 37, 1, 37), (0x484c, 38, 0, 64), (0x3a0d, 39, 0, 65), (0x2ef1, 40, 0, 67),
    (0x261f, 41, 0, 68), (0x1f33, 42, 0, 69), (0x19a8, 43, 0, 70), (0x1518, 44, 0, 72),
    (0x1177, 45, 0, 73), (0x0e74, 46, 0, 74), (0x0bfb, 47, 0, 75), (0x09f8, 48, 0, 77),
    (0x0861, 49, 0, 78), (0x0706, 50, 0, 79), (0x05cd, 51, 0, 48), (0x04de, 52, 0, 50),
    (0x040f, 53, 0, 50), (0x0363, 54, 0, 51), (0x02d4, 55, 0, 52), (0x025c, 56, 0, 53),
    (0x01f8, 57, 0, 54), (0x01a4, 58, 0, 55), (0x0160, 59, 0, 56), (0x0125, 60, 0, 57),
    (0x00f6, 61, 0, 58), (0x00cb, 62, 0, 59), (0x00ab, 63, 0, 61), (0x008f, 32, 0, 61),
    (0x5b12, 65, 1, 65), (0x4d04, 66, 0, 80), (0x412c, 67, 0, 81), (0x37d8, 68, 0, 82),
    (0x2fe8, 69, 0, 83), (0x293c, 70, 0, 84), (0x2379, 71, 0, 86), (0x1edf, 72, 0, 87),
    (0x1aa9, 73, 0, 87), (0x174e, 74, 0, 72), (0x1424, 75, 0, 72), (0x119c, 76, 0, 74),
    (0x0f6b, 77, 0, 74), (0x0d51, 78, 0, 75), (0x0bb6, 79, 0, 77), (0x0a40, 48, 0, 77),
    (0x5832, 81, 1, 80), (0x4d1c, 82, 0, 88), (0x438e, 83, 0, 89), (0x3bdd, 84, 0, 90),
    (0x34ee, 85, 0, 91), (0x2eae, 86, 0, 92), (0x299a, 87, 0, 93), (0x2516, 71, 0, 86),
    (0x5570, 89, 1, 88), (0x4ca9, 90, 0, 95), (0x44d9, 91, 0, 96), (0x3e22, 92, 0, 97),
    (0x3824, 93, 0, 99), (0x32b4, 94, 0, 99), (0x2e17, 86, 0, 93), (0x56a8, 96, 1, 95),
    (0x4f46, 97, 0, 101), (0x47e5, 98, 0, 102), (0x41cf, 99, 0, 103), (0x3c3d, 100, 0, 104),
    (0x375e, 93, 0, 99), (0x5231, 102, 0, 105), (0x4c0f, 103, 0, 106), (0x4639, 104, 0, 107),
    (0x415e, 99, 0, 103), (0x5627, 106, 1, 105), (0x50e7, 107, 0, 108), (0x4b85, 103, 0, 109),
    (0x5597, 109, 0, 110), (0x504f, 107, 0, 111), (0x5a10, 111, 1, 110), (0x5522, 109, 0, 112),
    (0x59eb, 111, 1, 112), (0x5a1d, 113, 0, 113),
)


class ArithDecoder:
    """T.81 §F.2.2 binary decoder over one entropy-coded segment.

    Bytes are fetched with 0xFF00 unstuffing; any real marker stops
    consumption and zero bytes are fed from then on (§F.2.2.3), with the
    marker left for the caller (restart handling / end of scan)."""

    __slots__ = ("data", "bp", "end", "marker", "c", "a", "ct")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.end = len(data)
        self.restart(pos)

    def restart(self, pos: int) -> None:
        self.bp = pos
        self.marker = None
        # lazy INITDEC: the first decode's renormalization loop loads
        # the two initial bytes and sets A to the full interval
        self.c = 0
        self.a = 0
        self.ct = -32

    def _byte_in(self) -> int:
        if self.marker is not None:
            return 0
        d = self.data
        if self.bp >= self.end:
            self.marker = 0xD9  # ran off the segment: treat as EOI
            return 0
        b = d[self.bp]
        self.bp += 1
        if b != 0xFF:
            return b
        # 0xFF: skip fill bytes, then stuffed-zero vs marker
        while self.bp < self.end and d[self.bp] == 0xFF:
            self.bp += 1
        if self.bp < self.end and d[self.bp] == 0:
            self.bp += 1
            return 0xFF
        self.marker = d[self.bp] if self.bp < self.end else 0xD9
        return 0

    def decode(self, st: bytearray, i: int) -> int:
        """One binary decision against statistics bin st[i].

        Renormalization is LAZY (performed at entry, as in the
        reference decoder): C accumulates raw stream bytes 8 bits at a
        time while A renormalizes one bit at a time, with CT tracking
        the alignment between them; the decision compares C against
        (A − Qe) << CT. Invariant: C < A << CT."""
        a = self.a
        ct = self.ct
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                self.c = (self.c << 8) | self._byte_in()
                ct += 8
                if ct < 0:  # initialization: first byte primes C
                    ct += 9
                    if ct == 0:
                        a = 0x10000
                        break
                    continue
            a <<= 1
        sv = st[i]
        qe, nmps, switch, nlps = _QM_STATES[sv >> 1]
        mps = sv & 1
        a -= qe
        temp = a << ct
        self.ct = ct
        if self.c >= temp:
            # upper subinterval: LPS unless the conditional exchange
            # applies (LPS subinterval grew past the MPS one)
            self.c -= temp
            self.a = qe
            if qe > a:
                st[i] = (nmps << 1) | mps
                return mps
            if switch:
                mps ^= 1
            st[i] = (nlps << 1) | mps
            return (sv & 1) ^ 1
        self.a = a
        if a >= 0x8000:
            return mps
        if qe > a:  # conditional exchange: decode LPS
            if switch:
                mps ^= 1
            st[i] = (nlps << 1) | mps
            return (sv & 1) ^ 1
        st[i] = (nmps << 1) | mps
        return mps


_FIXED = bytearray([113 << 1])  # non-adaptive bin (state 113 self-loops)


class ArithEntropy:
    """Statistics model (§F.1.4.4) over an ArithDecoder: per-table DC and
    AC bins, per-component DC prediction context, restart resets."""

    def __init__(self, data: bytes, pos: int, n_components: int,
                 dc_cond: dict, ac_cond: dict):
        self.n = n_components
        self.dc_cond = dc_cond  # tbl -> (L, U)
        self.ac_cond = ac_cond  # tbl -> Kx
        self.dec = ArithDecoder(data, pos)
        self._reset_stats()

    def _reset_stats(self) -> None:
        self.dc_stats: dict[int, bytearray] = {}
        self.ac_stats: dict[int, bytearray] = {}
        self.dc_ctx = [0] * self.n
        self.last_dc = [0] * self.n

    def restart(self, pos: int) -> None:
        self._reset_stats()
        self.dec.restart(pos)

    def _dc(self, tbl: int) -> bytearray:
        s = self.dc_stats.get(tbl)
        if s is None:
            s = self.dc_stats[tbl] = bytearray(64)
        return s

    def _ac(self, tbl: int) -> bytearray:
        s = self.ac_stats.get(tbl)
        if s is None:
            s = self.ac_stats[tbl] = bytearray(256)
        return s

    def decode_dc(self, ci: int, tbl: int) -> int:
        """DC difference for component ci; returns the new DC value."""
        dec = self.dec
        st = self._dc(tbl)
        base = self.dc_ctx[ci]
        if dec.decode(st, base) == 0:
            self.dc_ctx[ci] = 0
            return self.last_dc[ci]
        sign = dec.decode(st, base + 1)
        m = dec.decode(st, base + 2 + sign)
        i = 20  # X1 (Table F.4)
        if m:
            while dec.decode(st, i):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("jpeg: arith DC magnitude overflow")
                i += 1
        low, up = self.dc_cond.get(tbl, (0, 1))
        if m < ((1 << low) >> 1):
            self.dc_ctx[ci] = 0
        elif m > ((1 << up) >> 1):
            self.dc_ctx[ci] = 12 + (sign << 2)
        else:
            self.dc_ctx[ci] = 4 + (sign << 2)
        v = m
        i += 14  # mantissa bins follow the Xi bins (Table F.4)
        while m > 1:
            m >>= 1
            if dec.decode(st, i):
                v |= m
        v += 1
        if sign:
            v = -v
        self.last_dc[ci] += v
        return self.last_dc[ci]

    def decode_ac(self, tbl: int, coef) -> None:
        """AC coefficients into coef[1..63] (zigzag order)."""
        dec = self.dec
        st = self._ac(tbl)
        kx = self.ac_cond.get(tbl, 5)
        k = 1
        while k <= 63:
            i = 3 * (k - 1)
            if dec.decode(st, i):  # EOB
                return
            while dec.decode(st, i + 1) == 0:
                i += 3
                k += 1
                if k > 63:
                    raise ValueError("jpeg: arith AC run overflow")
            sign = dec.decode(_FIXED, 0)
            i += 2
            m = dec.decode(st, i)
            if m and dec.decode(st, i):
                m = 2
                i = 189 if k <= kx else 217
                while dec.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("jpeg: arith AC magnitude overflow")
                    i += 1
            v = m
            i += 14
            while m > 1:
                m >>= 1
                if dec.decode(st, i):
                    v |= m
            v += 1
            coef[k] = -v if sign else v
            k += 1

    # ---------------------------------------------------- progressive (G)

    def decode_dc_refine(self) -> int:
        """DC successive-approximation refinement: one fixed-probability
        bit per block (§G.? / jdarith decode_mcu_DC_refine)."""
        return self.dec.decode(_FIXED, 0)

    def decode_ac_first(self, tbl: int, block, ss: int, se: int,
                        al: int) -> None:
        """First AC scan of a spectral band: the sequential AC model
        restricted to k in [Ss, Se], values scaled by 2^Al. ``block``
        holds zigzag-order coefficients."""
        dec = self.dec
        st = self._ac(tbl)
        kx = self.ac_cond.get(tbl, 5)
        k = ss
        while k <= se:
            i = 3 * (k - 1)
            if dec.decode(st, i):  # EOB
                return
            while dec.decode(st, i + 1) == 0:
                i += 3
                k += 1
                if k > se:
                    raise ValueError("jpeg: arith AC run overflow")
            sign = dec.decode(_FIXED, 0)
            i += 2
            m = dec.decode(st, i)
            if m and dec.decode(st, i):
                m = 2
                i = 189 if k <= kx else 217
                while dec.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("jpeg: arith AC magnitude overflow")
                    i += 1
            v = m
            i += 14
            while m > 1:
                m >>= 1
                if dec.decode(st, i):
                    v |= m
            v += 1
            block[k] = (-v if sign else v) << al
            k += 1

    def decode_ac_refine(self, tbl: int, block, ss: int, se: int,
                         al: int) -> None:
        """AC refinement scan (§G.1.3.3): correction bits for
        previously-nonzero coefficients, ±2^Al for newly-significant
        ones; the EOB decision only arises beyond the previous scan's
        end-of-band position."""
        dec = self.dec
        st = self._ac(tbl)
        p1 = 1 << al
        m1 = -(1 << al)
        kex = se
        while kex > 0 and block[kex] == 0:
            kex -= 1
        k = ss
        while k <= se:
            i = 3 * (k - 1)
            if k > kex and dec.decode(st, i):
                break  # EOB
            while True:
                if block[k]:
                    if dec.decode(st, i + 2):
                        block[k] += m1 if block[k] < 0 else p1
                    break
                if dec.decode(st, i + 1):
                    block[k] = m1 if dec.decode(_FIXED, 0) else p1
                    break
                i += 3
                k += 1
                if k > se:
                    raise ValueError("jpeg: arith AC refine overflow")
            k += 1
