"""multimodal/codecs.py: real PNG/BMP/WAV codecs (stdlib+numpy).

The PNG unfilter is verified against an independent, naive per-pixel
implementation of the PNG spec's filter recovery (not by round-tripping
through our own encoder alone), on IDAT streams crafted with every filter
type."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from astro_sdk_spark.multimodal.codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_png,
    resize_nearest,
    sniff_image,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png_from_scanlines(w, h, ctype, scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def _naive_unfilter(raw: bytes, w, h, ch) -> np.ndarray:
    """Independent reference: PNG filter recovery straight from the spec,
    pure Python, one byte at a time."""
    stride, bpp = w * ch, ch
    out = []
    prev = [0] * stride
    p = 0
    for _y in range(h):
        f = raw[p]
        line = list(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        cur = [0] * stride
        for i in range(stride):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            x = line[i]
            if f == 0:
                v = x
            elif f == 1:
                v = x + a
            elif f == 2:
                v = x + b
            elif f == 3:
                v = x + (a + b) // 2
            elif f == 4:
                pr = a + b - c
                pa, pb, pc = abs(pr - a), abs(pr - b), abs(pr - c)
                v = x + (a if pa <= pb and pa <= pc else (b if pb <= pc else c))
            cur[i] = v % 256
        out.append(cur)
        prev = cur
    return np.array(out, dtype=np.uint8).reshape(h, w, ch)


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (6, 4)])
def test_png_all_filters_match_spec_reference(ctype, ch):
    rng = np.random.RandomState(7)
    w, h = 5, 5
    stride = w * ch
    # one scanline per filter type 0..4
    raw = b"".join(
        bytes([f]) + rng.randint(0, 256, stride, dtype=np.uint8).tobytes()
        for f in range(5)
    )
    blob = _png_from_scanlines(w, h, ctype, raw)
    got = decode_png(blob)
    expect = _naive_unfilter(raw, w, h, ch)
    assert np.array_equal(got, expect)


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_gray_2d_input():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_png(encode_png(img))
    assert out.shape == (3, 4, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"notapng")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    blob = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(blob)


def _bmp_24(w, h, pixels_rgb: np.ndarray) -> bytes:
    """Hand-build a bottom-up 24-bit BI_RGB BMP."""
    row_bytes = ((w * 3 + 3) // 4) * 4
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = b""
        for x in range(w):
            r, g, b = pixels_rgb[y, x]
            row += bytes([b, g, r])
        body += row + b"\x00" * (row_bytes - len(row))
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + dib + body


def test_bmp_decode_pixels_and_orientation():
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    got = decode_bmp(_bmp_24(2, 2, px))
    assert got.shape == (2, 2, 3)
    assert np.array_equal(got, px)


def test_wav_decode_stdlib():
    import io
    import wave

    buf = io.BytesIO()
    samples = (np.sin(np.linspace(0, 20, 800)) * 30000).astype(np.int16)
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(np.repeat(samples, 2).tobytes())
    sr, arr = decode_wav(buf.getvalue())
    assert sr == 16000
    assert arr.shape == (800, 2)
    assert np.array_equal(arr[:, 0], samples)


def test_resize_nearest_quadrants():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = [255, 0, 0]
    img[:2, 2:] = [0, 255, 0]
    img[2:, :2] = [0, 0, 255]
    img[2:, 2:] = [255, 255, 0]
    out = resize_nearest(img, 2, 2)
    assert np.array_equal(
        out,
        np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]],
            dtype=np.uint8,
        ),
    )
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[0, 0], [255, 0, 0]) and np.array_equal(up[7, 7], [255, 255, 0])


def test_sniff():
    assert sniff_image(PNG_SIG + b"x") == "png"
    assert sniff_image(b"BMxxxx") == "bmp"
    assert sniff_image(b"\xff\xd8\xff") == "jpeg"
    assert sniff_image(b"GIF89a") == "gif"
    assert sniff_image(b"\x00\x01\x02\x03") is None


# ------------------------------------------------------------------- jpeg


def _gradient(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_round_trip_444_quality():
    import numpy as np

    from astro_sdk_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _gradient(48, 64)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == (48, 64, 3)
    assert np.abs(dec.astype(float) - img).mean() < 3.0


def test_jpeg_round_trip_420_subsampled_and_odd_dims():
    import numpy as np

    from astro_sdk_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _gradient(41, 53)  # not multiples of 8 or 16
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert dec.shape == (41, 53, 3)
    assert np.abs(dec.astype(float) - img).mean() < 5.0


def test_jpeg_grayscale_and_flat_exactness():
    import numpy as np

    from astro_sdk_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    g = _gradient(32, 32)[..., 0]
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (32, 32, 1)
    assert np.abs(dec[..., 0].astype(float) - g).mean() < 2.0
    flat = np.full((16, 24, 3), 77, np.uint8)
    assert np.abs(
        decode_jpeg(encode_jpeg(flat, 95)).astype(int) - 77
    ).max() == 0


def test_jpeg_restart_markers():
    import numpy as np

    from astro_sdk_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _gradient(48, 64)
    for ri in (1, 3):
        dec = decode_jpeg(encode_jpeg(img, 90, restart_interval=ri))
        assert np.abs(dec.astype(float) - img).mean() < 3.0
    dec = decode_jpeg(
        encode_jpeg(img, 90, subsample=True, restart_interval=2)
    )
    assert np.abs(dec.astype(float) - img).mean() < 5.0


def test_jpeg_noise_stress_high_quality():
    """Dense AC coefficients + ZRL runs: noise at q=95 must survive with
    small quantization error."""
    import numpy as np

    from astro_sdk_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(noise, 95))
    assert np.abs(dec.astype(float) - noise).mean() < 6.0


def test_jpeg_progressive_matches_baseline_exactly():
    """Progressive transport is a lossless reorganization of the same
    quantized coefficients, so decode(SOF2 file) must equal decode(SOF0
    file of the same image/quality) BYTE-FOR-BYTE — this pins spectral
    selection, successive approximation (DC and AC first + refinement
    scans), and EOB-run decoding all at once."""
    import numpy as np

    from astro_sdk_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    cases = [
        ((16, 16, 1), False, 85),   # grayscale
        ((24, 17, 3), False, 85),   # color, non-multiple-of-8 width
        ((24, 17, 3), True, 85),    # 4:2:0 subsampling
        ((40, 33, 3), True, 70),    # subsampled + odd dims + lower q
        ((64, 48, 3), False, 50),   # denser AC coefficients
    ]
    for shape, sub, q in cases:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, q, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, q, subsample=sub))
        assert np.array_equal(base, prog), (shape, sub, q)
    # smooth gradients produce the LONG EOB runs real photos have
    yy, xx = np.mgrid[0:48, 0:64]
    grad = np.stack(
        [(yy * 2) % 256, (xx * 3) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(grad, 85)),
        decode_jpeg(encode_jpeg_progressive(grad, 85)),
    )


def test_jpeg_progressive_corrupt_blobs_fail_loudly():
    import numpy as np
    import pytest

    from astro_sdk_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    blob = encode_jpeg_progressive(img, 85)
    # truncation mid-scan must raise, not return garbage silently
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(blob[: len(blob) // 2])
    # scan-less progressive frame: header only, no SOS
    import struct

    sof2 = struct.pack(">BBHBHHB", 0xFF, 0xC2, 11, 8, 1, 1, 1) + bytes(
        [1, 0x11, 0]
    )
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg(b"\xff\xd8" + sof2 + b"\xff\xd9")


def test_jpeg_progressive_undefined_huffman_table_is_valueerror():
    """A scan header naming a Huffman table that no DHT defined must
    surface as ValueError (the uniform corrupt-data contract
    multimodal.ops classifies on), not a raw KeyError from the table
    dict lookup."""
    import numpy as np
    import pytest

    from astro_sdk_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    blob = bytearray(encode_jpeg_progressive(img, 85))
    # locate every SOS; classify DC vs AC by its Ss byte
    sos = [
        i
        for i in range(len(blob) - 1)
        if blob[i] == 0xFF and blob[i + 1] == 0xDA
    ]
    assert sos, "encoder emitted no SOS"

    def scan_info(i):
        ns = blob[i + 4]
        ss = blob[i + 5 + 2 * ns]
        return ns, ss

    dc = next(i for i in sos if scan_info(i)[1] == 0)
    ac = next(i for i in sos if scan_info(i)[1] != 0)
    for off, nibble, msg in (
        (dc, 0x70, "undefined DC Huffman table"),
        (ac, 0x07, "undefined AC Huffman table"),
    ):
        bad = bytearray(blob)
        bad[off + 6] |= nibble  # first component's Td/Ta byte
        with pytest.raises(ValueError, match=msg):
            decode_jpeg(bytes(bad))


def test_jpeg_lossless_still_gated():
    """Both arithmetic DCT processes (SOF9/SOF10) decode now
    (test_jpeg_arith.py); lossless (SOF3) and hierarchical stay
    gated."""
    import struct

    import pytest

    from astro_sdk_spark.multimodal.jpeg import decode_jpeg

    sof3 = struct.pack(">BBHBHHB", 0xFF, 0xC3, 11, 8, 1, 1, 1) + bytes(
        [1, 0x11, 0]
    )
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(b"\xff\xd8" + sof3 + b"\xff\xd9")


def test_jpeg_sniff_and_batch_decode(spark, tmp_path):
    """decode_image_batch reports REAL dimensions for baseline JPEGs."""
    from astro_sdk_spark.multimodal.jpeg import encode_jpeg
    from astro_sdk_spark.multimodal.ops import (
        decode_image_batch,
        media_table_from_files,
    )

    (tmp_path / "x.jpg").write_bytes(encode_jpeg(_gradient(24, 36), 85))
    mt = media_table_from_files(spark, str(tmp_path) + "/*.jpg")
    row = decode_image_batch(mt).collect()[0]
    assert (row.width, row.height, row.channels) == (36, 24, 3)


# -------------------------------------------------------------------- gif


def _gif_bytes(idx, palette, interlace=False, transparent=None, version=b"89a"):
    """Hand-assembled GIF using the classic 'uncompressed LZW' trick:
    every index is emitted as a literal code with a clear code before
    the dictionary could grow past the initial width."""
    import struct as _struct

    import numpy as np

    idx = np.asarray(idx)
    h, w = idx.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length() - 1)  # GCT size exponent - 1
    while (2 << size_field) < n:
        size_field += 1
    out = bytearray(b"GIF" + version)
    out += _struct.pack("<HH", w, h)
    out += bytes([0x80 | size_field, 0, 0])
    for r, g, b in palette:
        out += bytes([r, g, b])
    out += b"\x00" * 3 * ((2 << size_field) - n)
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += b"\x2C" + _struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    min_code = max(2, size_field + 1)
    clear, width = 1 << min_code, min_code + 1
    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx[order]
    codes = []
    for v in rows.reshape(-1):
        codes += [clear, int(v)]
    codes.append(clear + 1)  # end
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


def test_gif_decode_palette_image():
    import numpy as np

    from astro_sdk_spark.multimodal.codecs import decode_gif

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]])
    arr = decode_gif(_gif_bytes(idx, pal))
    assert arr.shape == (3, 4, 3)
    for y in range(3):
        for x in range(4):
            assert tuple(arr[y, x]) == pal[idx[y, x]]


def test_gif_interlaced_and_transparent():
    import numpy as np

    from astro_sdk_spark.multimodal.codecs import decode_gif

    pal = [(0, 0, 0), (255, 255, 255), (128, 0, 128), (0, 128, 0)]
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 4, (9, 5))
    arr = decode_gif(_gif_bytes(idx, pal, interlace=True))
    for y in range(9):
        for x in range(5):
            assert tuple(arr[y, x]) == pal[idx[y, x]], (y, x)
    # transparency adds an alpha channel: 0 where idx == transparent
    arr = decode_gif(_gif_bytes(idx, pal, transparent=2))
    assert arr.shape == (9, 5, 4)
    assert ((arr[..., 3] == 0) == (idx == 2)).all()


def test_gif_real_lzw_dictionary_growth():
    """A repetitive image makes real LZW emit dictionary codes — decode
    must still be exact (this exercises the prev+entry[0] growth path,
    not just literals)."""
    import numpy as np

    from astro_sdk_spark.multimodal.codecs import _lzw_decode, decode_gif

    # hand-build a real LZW stream: abababab... over a 2-symbol alphabet
    # min_code=2: clear=4, end=5; encode 'ababab ab' naively:
    # we just verify _lzw_decode against a known-compressible sequence
    # produced by the reference algorithm below.
    def lzw_encode(seq, min_code):
        clear, end = 1 << min_code, (1 << min_code) + 1
        dict_ = {(i,): i for i in range(clear)}
        next_code = end + 1
        width = min_code + 1
        codes = [clear]
        wseq = ()
        for s in seq:
            if wseq + (s,) in dict_:
                wseq = wseq + (s,)
                continue
            codes.append(dict_[wseq])
            dict_[wseq + (s,)] = next_code
            next_code += 1
            wseq = (s,)
        if wseq:
            codes.append(dict_[wseq])
        codes.append(end)
        # pack with the GIF variable-width rule (width grows when the
        # NEXT code would not fit)
        out = bytearray()
        acc = nbits = 0
        width = min_code + 1
        ncode = end + 1
        for i, c in enumerate(codes):
            acc |= c << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
            if i == 0:
                continue  # clear code
            if c != clear and c != end:
                pass
            # emitted one code; decoder adds a dict entry per code after
            # the first — mirror its width bump
            if i >= 1 and c not in (clear, end):
                if ncode == (1 << width) and width < 12:
                    width += 1
                if c != end:
                    ncode += 1
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    seq = [0, 1] * 40 + [2, 3] * 10 + [0] * 20
    encoded = lzw_encode(seq, 2)
    assert _lzw_decode(encoded, 2, len(seq)) == seq


def test_gif_batch_decode_and_resize(spark, tmp_path):
    import numpy as np

    from astro_sdk_spark.multimodal.codecs import decode_png
    from astro_sdk_spark.multimodal.ops import (
        decode_image_batch,
        media_table_from_files,
        resize_images,
    )

    pal = [(i * 16, 0, 255 - i * 16) for i in range(16)]
    idx = np.arange(64).reshape(8, 8) % 16
    (tmp_path / "p.gif").write_bytes(_gif_bytes(idx, pal))
    mt = media_table_from_files(spark, str(tmp_path) + "/*.gif")
    row = decode_image_batch(mt).collect()[0]
    assert (row.width, row.height, row.channels) == (8, 8, 3)
    rrow = resize_images(mt, 4, 4).collect()[0]
    assert decode_png(bytes(rrow.content)).shape == (4, 4, 3)


def test_jpeg_fill_bytes_before_marker_tolerated():
    """T.81 B.1.1.2 permits 0xFF fill bytes before any marker."""
    import numpy as np

    from astro_sdk_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _gradient(16, 16)
    blob = encode_jpeg(img, 90)
    # inject fill bytes before the first DQT marker (FF DB)
    i = blob.index(b"\xff\xdb")
    padded = blob[:i] + b"\xff\xff\xff" + blob[i:]
    dec = decode_jpeg(padded)
    assert np.abs(dec.astype(float) - img).mean() < 3.0


def test_jpeg_multi_scan_gated():
    """Non-interleaved multi-scan baseline is legal JPEG but would decode
    with wrong geometry — must gate, not return garbage."""
    import struct

    import pytest

    from astro_sdk_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
    import numpy as np

    blob = bytearray(encode_jpeg(_gradient(16, 16), 90))
    # rewrite the SOS header from 3 components to 1 (Ns=1) in place
    i = bytes(blob).index(b"\xff\xda")
    (seglen,) = struct.unpack(">H", blob[i + 2:i + 4])
    # SOS payload: ns, (cs, tdta)*ns, ss, se, ah_al
    new_payload = bytes([1, blob[i + 5], blob[i + 6], 0, 63, 0])
    blob[i + 2:i + 2 + seglen] = struct.pack(">H", len(new_payload) + 2) + new_payload
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(bytes(blob))


# ------------------------------------------------------------------- webp


def _rt_webp(img, **kw):
    import numpy as np

    from astro_sdk_spark.multimodal.vp8l import (
        decode_webp,
        encode_webp_lossless,
    )

    out = decode_webp(encode_webp_lossless(img, **kw))
    assert out.shape == img.shape
    assert (out == img).all()


def test_webp_lossless_roundtrip_literals_cache_lz77_transforms():
    """VP8L round-trips byte-exact through every encoder-reachable
    bitstream feature: plain literals, color cache, distance-1 LZ77
    copies, the subtract-green transform, and their combination."""
    import numpy as np

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (23, 31, 3)).astype(np.uint8)
    for kw in (
        {},
        {"cache_bits": 6},
        {"rle": True},
        {"subtract_green": True},
        {"cache_bits": 4, "rle": True, "subtract_green": True},
    ):
        _rt_webp(img, **kw)
    # alpha channel survives and sets the header hint
    img4 = rng.integers(0, 256, (9, 17, 4)).astype(np.uint8)
    _rt_webp(img4, cache_bits=5, rle=True)


def test_webp_lossless_lz77_and_cache_paths_actually_fire():
    """The flag variants must EXERCISE their decode paths, not just
    produce valid streams: a runs-heavy image compresses through the
    backward-reference path, a few-colors image through the cache."""
    import numpy as np

    from astro_sdk_spark.multimodal.vp8l import (
        _join,
        _tokenize,
        encode_webp_lossless,
    )

    img = np.zeros((16, 64, 3), np.uint8)
    img[:, 20:40] = [5, 9, 250]
    img[8:, :] = [1, 2, 3]
    pix = [
        _join(255, int(img[y, x, 0]), int(img[y, x, 1]), int(img[y, x, 2]))
        for y in range(16)
        for x in range(64)
    ]
    toks, _ = _tokenize(pix, 0, True)
    assert any(t[0] == "copy" for t in toks)
    assert len(encode_webp_lossless(img, rle=True)) < len(
        encode_webp_lossless(img)
    )
    _rt_webp(img, rle=True)

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    imgc = pal[rng.integers(0, 8, (32, 32))]
    pixc = [
        _join(255, int(p[0]), int(p[1]), int(p[2]))
        for row in imgc
        for p in row
    ]
    toks, _ = _tokenize(pixc, 7, False)
    assert sum(1 for t in toks if t[0] == "cache") > len(toks) // 2
    _rt_webp(imgc, cache_bits=7)


def test_webp_lossless_palette_roundtrip_packed_and_unpacked():
    """Color-indexing transform: ≤16 colors packs several indices per
    green byte (the width-reduction path); >16 colors stays unpacked."""
    import numpy as np

    rng = np.random.default_rng(5)
    pal3 = np.array([[10, 20, 30], [200, 100, 0], [0, 0, 0]], np.uint8)
    _rt_webp(pal3[rng.integers(0, 3, (13, 29))], use_palette=True)
    pal2 = np.array([[255, 255, 255], [0, 0, 0]], np.uint8)  # 8 px/byte
    _rt_webp(pal2[rng.integers(0, 2, (7, 19))], use_palette=True)
    big = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    _rt_webp(big[rng.integers(0, 200, (11, 13))], use_palette=True)


def test_webp_predictor_transform_all_modes_roundtrip():
    """Spatial PREDICTOR transform: every one of the 14 modes decodes
    back byte-exact as a fixed per-image mode, and a per-tile mode
    cycle exercises the tile-lookup path of _inv_predictor."""
    import numpy as np

    rng = np.random.default_rng(17)
    base = (np.arange(37)[None, :] * 3 + np.arange(23)[:, None] * 5) % 256
    img = np.stack(
        [base, (base * 2 + 17) % 256, (255 - base) % 256], axis=-1
    ).astype(np.uint8)
    img = ((img.astype(int) + rng.integers(0, 9, img.shape)) % 256).astype(
        np.uint8
    )
    for mode in range(14):
        _rt_webp(img, predictor_bits=2, predictor_mode=mode)
    _rt_webp(img, predictor_bits=2)  # per-tile: cycles all 14 modes
    _rt_webp(img, predictor_bits=4)  # coarser tiles, rows span tiles
    # alpha flows through the per-channel prediction arithmetic too
    img4 = np.dstack([img, ((base * 7 + 1) % 256).astype(np.uint8)])
    _rt_webp(img4, predictor_bits=2)
    # the transform must be load-bearing: the coded stream differs from
    # the untransformed one, yet both decode to the same pixels
    from astro_sdk_spark.multimodal.vp8l import encode_webp_lossless

    assert encode_webp_lossless(img, predictor_bits=2) != (
        encode_webp_lossless(img)
    )


def test_webp_cross_color_transform_roundtrip():
    """CROSS-COLOR transform: fixed and per-tile (g2r, g2b, r2b)
    deltas — including negative and extreme values — invert exactly,
    alone and stacked with subtract-green + predictor."""
    import numpy as np

    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (21, 33, 3)).astype(np.uint8)
    _rt_webp(img, cross_color_bits=2)  # per-tile delta cycle
    _rt_webp(img, cross_color_bits=3, cross_color=(-45, 33, -77))
    _rt_webp(img, cross_color_bits=2, cross_color=(127, -128, 127))
    # full stack: subtract-green → predictor → cross-color, then the
    # decoder inverts all three in reverse order
    _rt_webp(img, subtract_green=True, predictor_bits=2, cross_color_bits=2)


def test_webp_meta_prefix_groups_roundtrip():
    """META-PREFIX image: ≥2 prefix-code groups selected per tile. The
    two checkerboard groups see disjoint palettes, so their code tables
    genuinely differ; decode re-selects the group on every tile change
    (including mid-row at coarse widths)."""
    import numpy as np

    from astro_sdk_spark.multimodal.vp8l import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(23)
    # left/right halves from disjoint value ranges → per-group tables
    img = np.empty((16, 24, 3), np.uint8)
    img[:, :12] = rng.integers(0, 32, (16, 12, 3))
    img[:, 12:] = rng.integers(224, 256, (16, 12, 3))
    for kw in ({"meta_bits": 2}, {"meta_bits": 3},
               {"meta_bits": 2, "predictor_bits": 2},
               {"meta_bits": 2, "subtract_green": True}):
        _rt_webp(img, **kw)
    # literal-only restriction is enforced loudly
    import pytest

    with pytest.raises(ValueError):
        encode_webp_lossless(img, meta_bits=2, rle=True)
    with pytest.raises(ValueError):
        encode_webp_lossless(img, meta_bits=2, cache_bits=4)
    # 1×1 tile grid degenerates to a single group and still decodes
    assert (decode_webp(encode_webp_lossless(img[:4, :4], meta_bits=9))
            == img[:4, :4]).all()


def test_webp_corrupt_fails_loudly():
    """Lossy VP8 and animation now decode (multimodal.vp8,
    decode_webp_frames; see test_vp8_lossy.py); corrupt containers,
    bare/truncated ANMF chunks, and truncated lossy payloads raise
    ValueError."""
    import struct

    import numpy as np
    import pytest

    from astro_sdk_spark.multimodal.vp8l import (
        decode_webp,
        encode_webp_lossless,
    )

    # an ANMF chunk without the VP8X/ANIM preamble is malformed
    anim = b"ANMF" + struct.pack("<I", 4) + b"\x00" * 4
    riff = b"WEBP" + anim
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(ValueError):
        decode_webp(blob)

    # truncated lossy payload fails loudly, not silently
    lossy = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    riff = b"WEBP" + lossy
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(ValueError):
        decode_webp(blob)

    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WEBPJUNK")
    good = encode_webp_lossless(
        np.arange(96, dtype=np.uint8).reshape(4, 8, 3)
    )
    with pytest.raises((ValueError, IndexError)):
        decode_webp(good[: len(good) // 2])


def test_webp_sniff_and_batch_decode(spark, tmp_path):
    """The .webp extension flows through media_table_from_files /
    decode_image_batch like the other built-in codecs."""
    import numpy as np

    from astro_sdk_spark.multimodal.ops import (
        decode_image_batch,
        media_table_from_files,
    )
    from astro_sdk_spark.multimodal.vp8l import encode_webp_lossless

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 36, 3)).astype(np.uint8)
    (tmp_path / "x.webp").write_bytes(encode_webp_lossless(img, rle=True))
    mt = media_table_from_files(spark, str(tmp_path) + "/*.webp")
    row = decode_image_batch(mt).collect()[0]
    assert (row.width, row.height, row.channels) == (36, 24, 3)


def _gif_anim_bytes(sw, sh, palette, frames):
    """Multi-frame GIF89a: frames = [(ix, iy, idx2d, transparent,
    delay_cs, disposal), ...] — same uncompressed-LZW trick as
    _gif_bytes, plus graphic-control extensions."""
    import struct as _struct

    import numpy as np

    n = len(palette)
    size_field = max(1, (n - 1).bit_length() - 1)
    while (2 << size_field) < n:
        size_field += 1
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HH", sw, sh)
    out += bytes([0x80 | size_field, 0, 0])
    for r, g, b in palette:
        out += bytes([r, g, b])
    out += b"\x00" * 3 * ((2 << size_field) - n)
    min_code = max(2, size_field + 1)
    clear, width = 1 << min_code, min_code + 1
    for (ix, iy, idx, transparent, delay, disposal) in frames:
        idx = np.asarray(idx)
        h, w = idx.shape
        flags = (disposal << 2) | (0x01 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, flags, delay & 0xFF, delay >> 8,
                      transparent or 0, 0])
        out += b"\x2C" + _struct.pack("<HHHH", ix, iy, w, h) + b"\x00"
        codes = []
        for v in idx.reshape(-1):
            codes += [clear, int(v)]
        codes.append(clear + 1)
        acc = nbits = 0
        data = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += width
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            data.append(acc & 0xFF)
        out += bytes([min_code])
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def test_gif_animation_frames_composite():
    """decode_gif_frames composites per GIF89a: transparent pixels keep
    the canvas, disposal 2 clears the frame rect, disposal 3 restores
    the pre-frame canvas; delays convert centiseconds → ms."""
    import numpy as np

    from astro_sdk_spark.multimodal.codecs import decode_gif_frames

    pal = [(250, 10, 10), (10, 250, 10), (10, 10, 250), (0, 0, 0)]
    full = np.zeros((8, 8), int)              # all red
    patch = np.full((4, 4), 1, int)           # green patch
    patch_t = np.array([[1, 3], [3, 1]])      # green + transparent(3)
    frames, delays = decode_gif_frames(_gif_anim_bytes(8, 8, pal, [
        (0, 0, full, None, 5, 0),
        (2, 2, patch, None, 10, 3),           # restore-previous after
        (0, 0, patch, None, 15, 2),           # clear own rect after
        (4, 4, patch_t, 3, 20, 0),            # transparency keeps canvas
    ]))
    assert delays == [50, 100, 150, 200]
    assert (frames[0][..., :3] == (250, 10, 10)).all()
    assert (frames[0][..., 3] == 255).all()
    # frame 1: green patch at (2,2) over red
    assert (frames[1][2:6, 2:6, :3] == (10, 250, 10)).all()
    assert (frames[1][0, 0, :3] == (250, 10, 10)).all()
    # frame 2: disposal-3 restored frame 0 before drawing at (0,0)
    assert (frames[2][0:4, 0:4, :3] == (10, 250, 10)).all()
    assert (frames[2][2:6, 4:6, :3] == (250, 10, 10)).all()
    # frame 3: frame 2's rect was cleared to transparent; the
    # transparent-index pixels at (4,4) keep whatever the canvas held
    assert (frames[3][0:4, 0:4, 3] == 0).all()
    assert frames[3][4, 4, :3].tolist() == [10, 250, 10]
    assert frames[3][4, 5].tolist() == list(frames[2][4, 5])


def test_gif_animation_frame_sampling(spark, tmp_path):
    """Animated .gif flows through frame_sample_video as composited
    PNG frames, same contract as animated WebP and AVI."""
    import numpy as np

    from astro_sdk_spark.multimodal.codecs import (
        decode_gif_frames,
        decode_png,
    )
    from astro_sdk_spark.multimodal.ops import (
        frame_sample_video,
        media_table_from_files,
    )

    pal = [(i * 60 % 256, 255 - i * 60 % 256, 30) for i in range(4)]
    frames = [(0, 0, np.full((8, 8), k, int), None, 10, 0) for k in range(4)]
    blob = _gif_anim_bytes(8, 8, pal, frames)
    (tmp_path / "anim.gif").write_bytes(blob)
    mt = media_table_from_files(spark, str(tmp_path) + "/*.gif")
    rows = sorted(frame_sample_video(mt, every_n=2, max_frames=8).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 2]
    ref, _d = decode_gif_frames(blob)
    for r in rows:
        assert np.array_equal(decode_png(bytes(r.frame)), ref[r.frame_idx])
