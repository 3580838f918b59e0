"""Arithmetic-coded JPEG (SOF9) decoder tests.

The entropy layer's correctness bar is exact: an arithmetic encode and
a Huffman encode of the same image at the same settings carry
IDENTICAL quantized coefficients, so decoding both through this codec
must yield byte-identical pixels. A live libjpeg oracle (ctypes, gated
on availability) exercises that property on fresh encodes; committed
fixtures pin it without the library.
"""

from __future__ import annotations

import ctypes
import hashlib
from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"

# (shape, sha256 of decode_jpeg output) — each fixture was certified at
# generation time by decode(arith) == decode(huffman-twin) byte equality
ARITH_FIXTURES = {
    "arith_photo_q80.jpg": (
        (64, 96, 3),
        "6f43d5d1c683fa15c9d55f496db4434c652e96ffebe82cd13a3389b0d84714e5"),
    "arith_odd_restart_q60.jpg": (
        (37, 53, 3),
        "ef30ab6c2bdf0b4ea45e730deef3225b38fbbdc7d4a2fe54b0bc89c97f84d231"),
    "arith_gray_q85.jpg": (
        (64, 96, 1),
        "6c4a94f7a93fc24f48b270f40a2122580271178bb67fbcac36adf2cec30f3242"),
    # SOF10: progressive + arithmetic (simple_progression scan script)
    "arith_prog_q75.jpg": (
        (64, 96, 3),
        "79a440b0781d001c728668fb237dc827397ce2d7e169ec41997ace8f42456a01"),
}


def _load_libjpeg():
    try:
        return ctypes.CDLL("libjpeg.so.62")
    except OSError:
        return None


_LJ = _load_libjpeg()
needs_libjpeg = pytest.mark.skipif(
    _LJ is None, reason="system libjpeg not available for the live oracle"
)

# empirically-derived v6b ABI facts (probed, not assumed — see
# tools/extract_vp8_tables.py for the discipline): struct sizes from
# jpeg_CreateCompress's own error message, field offsets validated by
# round-tripping known dimensions
_CSIZE = 520
_OFF_W, _OFF_H, _OFF_NCOMP, _OFF_CSPACE = 48, 52, 56, 60
_OFF_ARITH, _OFF_RESTART = 260, 280
_JCS_GRAY, _JCS_RGB = 1, 2


def _oracle_encode(img, quality=75, arith=False, restart=0,
                   progressive=False):
    lj = _LJ
    lj.jpeg_std_error.restype = ctypes.c_void_p
    lj.jpeg_mem_dest.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_ulong),
    ]
    h, w, ch = img.shape
    err = ctypes.create_string_buffer(1024)
    cinfo = ctypes.create_string_buffer(_CSIZE)
    e = lj.jpeg_std_error(err)
    ctypes.memmove(cinfo, ctypes.c_void_p(e).value.to_bytes(8, "little"), 8)
    lj.jpeg_CreateCompress(cinfo, 62, _CSIZE)

    def poke(off, val):
        ctypes.memmove(ctypes.addressof(cinfo) + off,
                       int(val).to_bytes(4, "little"), 4)

    outbuf = ctypes.POINTER(ctypes.c_uint8)()
    outsize = ctypes.c_ulong(0)
    lj.jpeg_mem_dest(cinfo, ctypes.byref(outbuf), ctypes.byref(outsize))
    poke(_OFF_W, w)
    poke(_OFF_H, h)
    poke(_OFF_NCOMP, ch)
    poke(_OFF_CSPACE, _JCS_RGB if ch == 3 else _JCS_GRAY)
    lj.jpeg_set_defaults(cinfo)
    lj.jpeg_set_quality(cinfo, quality, 1)
    if progressive:
        lj.jpeg_simple_progression(cinfo)
    if arith:
        poke(_OFF_ARITH, 1)
    if restart:
        poke(_OFF_RESTART, restart)
    lj.jpeg_start_compress(cinfo, 1)
    data = np.ascontiguousarray(img).tobytes()
    stride = w * ch
    for y in range(h):
        row = ctypes.create_string_buffer(data[y * stride:(y + 1) * stride],
                                          stride)
        ptr = ctypes.cast(
            ctypes.pointer(ctypes.cast(row, ctypes.c_void_p)), ctypes.c_void_p
        )
        lj.jpeg_write_scanlines(cinfo, ptr, 1)
    lj.jpeg_finish_compress(cinfo)
    blob = bytes(bytearray(outbuf[:outsize.value]))
    lj.jpeg_destroy_compress(cinfo)
    return blob


def _grad(h, w):
    base = (np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5) % 256
    return np.stack([base, (base * 2 + 40) % 256, (255 - base) % 256],
                    -1).astype(np.uint8)


def test_arith_fixtures_decode_to_certified_pixels():
    """Committed SOF9 encodes decode to the certified digests —
    4:2:0 color, odd dims with restart markers, grayscale."""
    from astro_sdk_spark.multimodal.jpeg import decode_jpeg

    for name, (shape, digest) in ARITH_FIXTURES.items():
        blob = (DATA / name).read_bytes()
        assert (b"\xff\xc9" in blob or b"\xff\xca" in blob) and (
            b"\xff\xcc" in blob), name
        out = decode_jpeg(blob)
        assert out.shape == shape, name
        assert hashlib.sha256(out.tobytes()).hexdigest() == digest, name


def test_arith_gates_and_errors():
    from astro_sdk_spark.multimodal.jpeg import decode_jpeg

    # corrupted restart sequence fails loudly
    blob = bytearray((DATA / "arith_odd_restart_q60.jpg").read_bytes())
    j = next(k for k in range(len(blob) - 1)
             if blob[k] == 0xFF and 0xD0 <= blob[k + 1] <= 0xD7)
    blob[j + 1] = 0xD7 if blob[j + 1] != 0xD7 else 0xD6
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(bytes(blob))


@needs_libjpeg
def test_arith_entropy_layer_is_lossless_vs_huffman_twin():
    """Fresh libjpeg encodes: the arithmetic and Huffman encodes of one
    image carry identical coefficients, so this codec must decode them
    to byte-identical pixels — across qualities, sampling, restart
    intervals, and grayscale."""
    from astro_sdk_spark.multimodal.jpeg import decode_jpeg

    rng = np.random.default_rng(41)
    photo = (_grad(64, 96).astype(int)
             + rng.integers(-30, 30, (64, 96, 3))).clip(0, 255).astype(
                 np.uint8)
    cases = [
        (np.full((8, 8, 3), 120, np.uint8), dict(quality=95)),
        (_grad(16, 16), dict(quality=90)),
        (_grad(37, 53), dict(quality=75)),
        (rng.integers(0, 256, (24, 24, 3)).astype(np.uint8),
         dict(quality=50)),
        (photo, dict(quality=85)),
        (photo, dict(quality=15)),
        (photo, dict(quality=80, restart=1)),
        (photo, dict(quality=80, restart=2)),
        (photo, dict(quality=80, restart=5)),
        (photo[..., :1].copy(), dict(quality=80)),
    ]
    for img, kw in cases:
        ab = _oracle_encode(img, arith=True, **kw)
        hb = _oracle_encode(img, arith=False, **kw)
        assert b"\xff\xc9" in ab
        pa = decode_jpeg(ab)
        ph = decode_jpeg(hb)
        assert np.array_equal(pa, ph), (img.shape, kw)


@needs_libjpeg
def test_prog_arith_decodes_identically_to_sequential_huffman():
    """SOF10 (progressive + arithmetic): progressive transport is
    coefficient-lossless and the QM layer is exact, so decode(SOF10)
    must equal decode(sequential Huffman) byte-for-byte."""
    from astro_sdk_spark.multimodal.jpeg import decode_jpeg

    rng = np.random.default_rng(43)
    photo = (_grad(64, 96).astype(int)
             + rng.integers(-30, 30, (64, 96, 3))).clip(0, 255).astype(
                 np.uint8)
    cases = [
        (photo, dict(quality=85)),
        (photo, dict(quality=50)),
        (_grad(37, 53), dict(quality=70)),
        (photo[..., :1].copy(), dict(quality=80)),
        (photo, dict(quality=75, restart=3)),
    ]
    for img, kw in cases:
        pab = _oracle_encode(img, arith=True, progressive=True, **kw)
        hb = _oracle_encode(img, arith=False, **kw)
        assert b"\xff\xca" in pab
        assert np.array_equal(decode_jpeg(pab), decode_jpeg(hb)), (
            img.shape, kw)
