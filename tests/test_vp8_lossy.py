"""Lossy-WebP (VP8 intra frame) decoder tests.

Two layers of verification:

1. Committed real fixtures (tests/data/lossy_*.webp, produced by
   libwebp's encoder) decode to RGB whose sha256 must match digests
   that were certified bit-exact against ``WebPDecodeRGB`` at
   generation time.  Runs everywhere, no native library needed.
2. A live differential oracle (gated on a system libwebp being
   loadable via ctypes): fresh encodes across qualities/configs are
   decoded by BOTH libwebp and astro_sdk_spark.multimodal.vp8, and the
   Y/U/V planes plus the final RGB must match byte-for-byte.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import hashlib
import struct
from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"

# (shape, sha256-of-RGB-bytes); digests certified against libwebp's
# WebPDecodeRGB output when the fixtures were generated
FIXTURES = {
    "lossy_grad_q75.webp": (
        (48, 64, 3),
        "656513931bfbdccb9f5f228ee2fe932a45b3f1dddb2bff9e138705af8c372a59"),
    "lossy_photo_q90_seg.webp": (
        (64, 64, 3),
        "820cafacc92120db95aa8beda28ecef444668531cfd326760e0da8ea05352d35"),
    "lossy_noise_q35.webp": (
        (32, 48, 3),
        "2991b4712aaf274de1ece25468d83a28c067ab782f0ac45caabc220823b78b32"),
    "lossy_odd_q60.webp": (
        (37, 53, 3),
        "ae796ace10f629bfc7e45af0d815c26617597063ab899842fd6c502c15092940"),
    "lossy_simplefilter_q40.webp": (
        (48, 48, 3),
        "c5a3efc2d43cae158cf251a7194a07854bd012ebd4ac92b3f83306231d026c7b"),
    "lossy_parts4_q55.webp": (
        (64, 80, 3),
        "3eac4800a79fe4ba4ee67eb4c75086dfc8d2a72bfabd7cc4b788eda6f3bfd139"),
    "lossy_alpha_q70.webp": (
        (48, 64, 4),
        "2bce5c18b5567ca61bc58657ded73358c43b87dd3ea3aad0ac7444b60c3f101d"),
    # mb_no_coeff_skip stream: 29/36 MBs skipped (exercises the skip
    # bits + the Y2 context-preservation rule for adjacent B_PRED MBs)
    "lossy_skip_q40.webp": (
        (96, 96, 3),
        "54d45dfcd2472b4e846605614e122e60a1ae924e991ff4659ad553e18f174ef9"),
}


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.7.dylib", "webp"):
        try:
            found = ctypes.util.find_library(name) if name == "webp" else name
            if found:
                return ctypes.CDLL(found)
        except OSError:
            continue
    return None


_LW = _load_libwebp()
needs_libwebp = pytest.mark.skipif(
    _LW is None, reason="system libwebp not available for the live oracle"
)


def _vp8_payload(blob: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(blob):
        typ = blob[pos:pos + 4]
        (ln,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        if typ == b"VP8 ":
            return blob[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    raise ValueError("no VP8 chunk")


def _oracle_encode(img: np.ndarray, q: float) -> bytes:
    h, w, _ = img.shape
    _LW.WebPEncodeRGB.restype = ctypes.c_size_t
    _LW.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LW.WebPEncodeRGB(np.ascontiguousarray(img).tobytes(), w, h, w * 3,
                          q, ctypes.byref(out))
    assert n > 0
    blob = bytes(bytearray(out[:n]))
    _LW.WebPFree(out)
    return blob


def _oracle_yuv(blob: bytes):
    _LW.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _LW.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    w, h = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    s, us = ctypes.c_int(), ctypes.c_int()
    yp = _LW.WebPDecodeYUV(blob, len(blob), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(s), ctypes.byref(us))
    W, H, S, US = w.value, h.value, s.value, us.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = np.array([[yp[r * S + c] for c in range(W)] for r in range(H)],
                 np.uint8)
    U = np.array([[up[r * US + c] for c in range(cw)] for r in range(ch)],
                 np.uint8)
    V = np.array([[vp[r * US + c] for c in range(cw)] for r in range(ch)],
                 np.uint8)
    _LW.WebPFree(yp)
    return Y, U, V


def _oracle_rgb(blob: bytes) -> np.ndarray:
    _LW.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    _LW.WebPDecodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    w, h = ctypes.c_int(), ctypes.c_int()
    p = _LW.WebPDecodeRGB(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    out = np.frombuffer(bytearray(p[:w.value * h.value * 3]),
                        np.uint8).reshape(h.value, w.value, 3).copy()
    _LW.WebPFree(p)
    return out


def _grad(h, w):
    base = (np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5) % 256
    return np.stack([base, (base * 2 + 40) % 256, (255 - base) % 256],
                    -1).astype(np.uint8)


# ------------------------------------------------------------- fixtures


def test_lossy_fixtures_decode_to_certified_rgb():
    """Committed real lossy encodes → RGB matching libwebp-certified
    digests. Exercises segmentation, the simple and normal loop
    filters, multiple token partitions, and odd dimensions."""
    from astro_sdk_spark.multimodal.vp8l import decode_webp

    for name, (shape, digest) in FIXTURES.items():
        rgb = decode_webp((DATA / name).read_bytes())
        assert rgb.shape == shape, name
        assert hashlib.sha256(rgb.tobytes()).hexdigest() == digest, name


def test_lossy_gates_and_errors():
    from astro_sdk_spark.multimodal.vp8 import decode_vp8_frame
    from astro_sdk_spark.multimodal.vp8l import decode_webp

    blob = (DATA / "lossy_grad_q75.webp").read_bytes()
    # truncation fails loudly
    with pytest.raises(ValueError):
        decode_webp(blob[:24])
    # interframe flag rejected (still images are keyframes)
    payload = bytearray(_vp8_payload(blob))
    payload[0] |= 1
    with pytest.raises(ValueError, match="keyframe"):
        decode_vp8_frame(bytes(payload))
    # bad start code
    payload = bytearray(_vp8_payload(blob))
    payload[3] = 0
    with pytest.raises(ValueError, match="start code"):
        decode_vp8_frame(bytes(payload))


# ------------------------------------------------------ live differential


@needs_libwebp
def test_lossy_live_oracle_yuv_and_rgb_bit_exact():
    """Fresh libwebp encodes across the quality range decode to
    byte-identical Y/U/V planes and RGB output."""
    from astro_sdk_spark.multimodal.vp8 import decode_vp8, decode_vp8_frame

    rng = np.random.default_rng(31)
    cases = [
        (_grad(32, 32), 90.0),
        (_grad(48, 64), 75.0),
        (rng.integers(0, 256, (32, 32, 3)).astype(np.uint8), 50.0),
        ((_grad(64, 80).astype(int)
          + rng.integers(-20, 20, (64, 80, 3))).clip(0, 255).astype(np.uint8),
         75.0),
        (_grad(37, 53), 80.0),
        (rng.integers(0, 256, (48, 48, 3)).astype(np.uint8), 10.0),
        (_grad(16, 144), 70.0),
        (_grad(144, 16), 70.0),
        (_grad(24, 24), 0.0),
        (_grad(24, 24), 100.0),
        (_grad(1, 17), 70.0),
        (_grad(17, 1), 70.0),
    ]
    for img, q in cases:
        blob = _oracle_encode(img, q)
        payload = _vp8_payload(blob)
        Y, U, V = decode_vp8_frame(payload)
        Yo, Uo, Vo = _oracle_yuv(blob)
        assert np.array_equal(Y, Yo), (img.shape, q, "Y")
        assert np.array_equal(U, Uo), (img.shape, q, "U")
        assert np.array_equal(V, Vo), (img.shape, q, "V")
        assert np.array_equal(decode_vp8(payload), _oracle_rgb(blob)), (
            img.shape, q, "RGB")


def test_alpha_unfilter_all_modes_roundtrip():
    """Synthesized raw-compression ALPH chunks with each prediction
    filter (none/horizontal/vertical/gradient) invert exactly: the test
    forward-filters a known plane, assembles a container around a real
    lossy frame, and expects the original plane back."""
    from astro_sdk_spark.multimodal.vp8l import decode_webp

    base = (DATA / "lossy_grad_q75.webp").read_bytes()
    vp8 = _vp8_payload(base)
    h, w = 48, 64
    rng = np.random.default_rng(13)
    plane = ((np.arange(h)[:, None] * 5 + np.arange(w)[None, :] * 3) % 256
             ).astype(np.uint8)
    plane = ((plane.astype(int) + rng.integers(0, 7, plane.shape)) % 256
             ).astype(np.uint8)

    def clip(v):
        return 0 if v < 0 else (255 if v > 255 else v)

    def forward(filt):
        out = np.zeros_like(plane)
        for y in range(h):
            for x in range(w):
                if y == 0:
                    pred = 0 if x == 0 else int(plane[0, x - 1])
                elif filt == 0:
                    pred = 0
                elif filt == 1:
                    pred = int(plane[y - 1, 0]) if x == 0 else \
                        int(plane[y, x - 1])
                elif filt == 2:
                    pred = int(plane[y - 1, x])
                else:
                    if x == 0:
                        pred = int(plane[y - 1, 0])
                    else:
                        pred = clip(int(plane[y, x - 1])
                                    + int(plane[y - 1, x])
                                    - int(plane[y - 1, x - 1]))
                out[y, x] = (int(plane[y, x]) - pred) & 0xFF
        return out

    for filt in (0, 1, 2, 3):
        filtered = forward(filt)
        if filt == 0:
            # filter "none" stores the plane verbatim (no row-0 delta)
            payload = bytes([0]) + plane.tobytes()
        else:
            payload = bytes([filt << 2]) + filtered.tobytes()
        chunks = b"ALPH" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunks += b"\x00"
        chunks += b"VP8 " + struct.pack("<I", len(vp8)) + vp8
        if len(vp8) & 1:
            chunks += b"\x00"
        riff = b"WEBP" + chunks
        blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
        rgba = decode_webp(blob)
        assert rgba.shape == (h, w, 4)
        assert np.array_equal(rgba[..., 3], plane), f"filter {filt}"


@needs_libwebp
def test_lossy_alpha_live_oracle_rgba_bit_exact():
    """Fresh RGBA encodes (VP8X + ALPH + VP8) decode bit-exactly,
    covering the headerless-VP8L alpha stream and filtering."""
    from astro_sdk_spark.multimodal.vp8l import decode_webp

    _LW.WebPEncodeRGBA.restype = ctypes.c_size_t
    _LW.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _LW.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LW.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    rng = np.random.default_rng(17)
    cases = [
        np.dstack([_grad(48, 64),
                   ((np.arange(64)[None, :] * 4) % 256
                    * np.ones((48, 1), int)).astype(np.uint8)]),
        np.dstack([_grad(32, 32),
                   rng.integers(0, 256, (32, 32)).astype(np.uint8)]),
        np.dstack([_grad(37, 53),
                   (rng.integers(0, 2, (37, 53)) * 255).astype(np.uint8)]),
    ]
    for img in cases:
        for q in (40.0, 85.0):
            h, w = img.shape[:2]
            out = ctypes.POINTER(ctypes.c_uint8)()
            n = _LW.WebPEncodeRGBA(np.ascontiguousarray(img).tobytes(),
                                   w, h, w * 4, q, ctypes.byref(out))
            assert n > 0
            blob = bytes(bytearray(out[:n]))
            _LW.WebPFree(out)
            ww, hh = ctypes.c_int(), ctypes.c_int()
            p = _LW.WebPDecodeRGBA(blob, n, ctypes.byref(ww),
                                   ctypes.byref(hh))
            ref = np.frombuffer(
                bytearray(p[:ww.value * hh.value * 4]), np.uint8
            ).reshape(hh.value, ww.value, 4).copy()
            _LW.WebPFree(p)
            assert np.array_equal(decode_webp(blob), ref), (img.shape, q)


@needs_libwebp
def test_lossy_fixture_digests_still_match_libwebp():
    """The committed digests stay anchored to the real decoder, not
    just to ourselves: re-derive each from libwebp and compare."""
    _LW.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LW.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    for name, (shape, digest) in FIXTURES.items():
        blob = (DATA / name).read_bytes()
        if shape[2] == 4:
            w, h = ctypes.c_int(), ctypes.c_int()
            p = _LW.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w),
                                   ctypes.byref(h))
            arr = np.frombuffer(
                bytearray(p[:w.value * h.value * 4]), np.uint8
            ).reshape(h.value, w.value, 4).copy()
            _LW.WebPFree(p)
        else:
            arr = _oracle_rgb(blob)
        assert arr.shape == shape, name
        assert hashlib.sha256(arr.tobytes()).hexdigest() == digest, name


# ----------------------------------------------------------- animation


def _chunk(typ: bytes, payload: bytes) -> bytes:
    out = typ + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def _u24(v: int) -> bytes:
    return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])


def _anmf(fx, fy, fw, fh, dur, flags, payload):
    hdr = (_u24(fx // 2) + _u24(fy // 2) + _u24(fw - 1) + _u24(fh - 1)
           + _u24(dur) + bytes([flags]))
    return _chunk(b"ANMF", hdr + payload)


def _container(cw, ch, bg_rgba, frames) -> bytes:
    vp8x = bytes([0x12, 0, 0, 0]) + _u24(cw - 1) + _u24(ch - 1)
    r, g, b, a = bg_rgba
    anim = bytes([b, g, r, a]) + struct.pack("<H", 0)
    body = _chunk(b"VP8X", vp8x) + _chunk(b"ANIM", anim) + b"".join(frames)
    riff = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_animated_webp_composites_blend_overwrite_dispose():
    """A hand-assembled VP8X/ANIM/ANMF animation (frames carry
    oracle-verified VP8L payloads) composites per the container spec:
    full-frame paint, sub-rectangle overwrite, semi-transparent
    alpha-blend, and dispose-to-background between frames."""
    from astro_sdk_spark.multimodal.vp8l import (
        decode_webp,
        decode_webp_frames,
        encode_webp_lossless,
    )

    cw, ch = 32, 24

    def vp8l_chunk(img):
        blob = encode_webp_lossless(img)
        return _chunk(b"VP8L", blob[20:20 + struct.unpack(
            "<I", blob[16:20])[0]])

    base = np.full((ch, cw, 4), (10, 200, 60, 255), np.uint8)
    red_patch = np.full((8, 16, 4), (250, 20, 20, 255), np.uint8)
    half = np.full((8, 16, 4), (0, 0, 250, 128), np.uint8)

    frames = [
        _anmf(0, 0, cw, ch, 40, 0, vp8l_chunk(base)),
        _anmf(8, 4, 16, 8, 50, 2, vp8l_chunk(red_patch)),   # no-blend
        _anmf(8, 12, 16, 8, 60, 0, vp8l_chunk(half)),       # alpha blend
        _anmf(0, 0, 16, 8, 70, 1, vp8l_chunk(red_patch)),   # dispose bg
        _anmf(16, 16, 16, 8, 80, 0, vp8l_chunk(red_patch)),
    ]
    blob = _container(cw, ch, (1, 2, 3, 255), frames)
    out, durs = decode_webp_frames(blob)
    assert durs == [40, 50, 60, 70, 80]
    assert len(out) == 5 and out[0].shape == (ch, cw, 4)
    # frame 0: canvas = base everywhere
    assert (out[0] == base).all()
    # frame 1: red sub-rect overwritten, rest untouched
    assert (out[1][4:12, 8:24] == red_patch).all()
    assert (out[1][0:4] == base[0:4]).all()
    # frame 2: semi-transparent blue over opaque green blends (spec
    # src-over with round-to-nearest): a=255, c=(cs*128*255+cd*255*127)/x
    blend_px = out[2][12, 8]
    assert blend_px[3] == 255
    expect_r = (250 * 0 * 255 + 10 * 255 * 127 + (255 * 255) // 2) // (255 * 255)
    assert abs(int(blend_px[0]) - expect_r) <= 1
    # frame 3 displays the red patch at origin; frame 4's canvas has the
    # dispose-to-background fill where frame 3 painted
    assert (out[3][0:8, 0:16] == red_patch).all()
    assert (out[4][0:8, 0:16] == np.array([1, 2, 3, 255], np.uint8)).all()
    assert (out[4][16:24, 16:32] == red_patch).all()

    # decode_webp on an animation = first composited frame
    assert (decode_webp(blob) == out[0]).all()


def test_animated_webp_lossy_frames_and_errors():
    """ANMF frames can carry lossy VP8 (+ALPH) payloads too; malformed
    rectangles and dimension mismatches fail loudly."""
    import pytest

    from astro_sdk_spark.multimodal.vp8l import decode_webp_frames

    lossy = (DATA / "lossy_grad_q75.webp").read_bytes()  # 64x48 RGB
    vp8 = _chunk(b"VP8 ", _vp8_payload(lossy))
    blob = _container(64, 48, (0, 0, 0, 0),
                      [_anmf(0, 0, 64, 48, 100, 0, vp8)])
    out, durs = decode_webp_frames(blob)
    assert durs == [100] and out[0].shape == (48, 64, 4)
    assert (out[0][..., 3] == 255).all()

    from astro_sdk_spark.multimodal.vp8l import decode_webp as dw
    rgb = dw(lossy)
    assert (out[0][..., :3] == rgb).all()

    # frame rect outside canvas
    with pytest.raises(ValueError, match="outside canvas"):
        decode_webp_frames(_container(32, 32, (0, 0, 0, 0),
                                      [_anmf(0, 0, 64, 48, 1, 0, vp8)]))
    # ANMF header dims disagreeing with the payload
    with pytest.raises(ValueError, match="disagree"):
        decode_webp_frames(_container(64, 48, (0, 0, 0, 0),
                                      [_anmf(0, 0, 62, 48, 1, 0, vp8)]))


def test_still_webp_through_frames_api():
    """decode_webp_frames on a still image returns exactly one frame
    with duration 0, RGBA-shaped."""
    from astro_sdk_spark.multimodal.vp8l import decode_webp_frames

    out, durs = decode_webp_frames((DATA / "lossy_grad_q75.webp").read_bytes())
    assert durs == [0] and len(out) == 1
    assert out[0].shape == (48, 64, 4) and (out[0][..., 3] == 255).all()


def test_animated_webp_frame_sampling_pipeline(spark, tmp_path):
    """Animated .webp flows through frame_sample_video: composited
    frames come back as standalone PNG blobs that decode_image_batch
    consumes like any other image."""
    from astro_sdk_spark.multimodal.codecs import decode_png
    from astro_sdk_spark.multimodal.ops import (
        decode_image_batch,
        frame_sample_video,
        media_table_from_files,
    )
    from astro_sdk_spark.multimodal.vp8l import (
        decode_webp_frames,
        encode_webp_lossless,
    )

    cw, ch = 16, 16

    def vp8l_chunk(img):
        blob = encode_webp_lossless(img)
        return _chunk(b"VP8L", blob[20:20 + struct.unpack(
            "<I", blob[16:20])[0]])

    frames = []
    for k in range(4):
        img = np.full((ch, cw, 4), (k * 60, 255 - k * 60, 30, 255), np.uint8)
        frames.append(_anmf(0, 0, cw, ch, 10 * (k + 1), 2, vp8l_chunk(img)))
    blob = _container(cw, ch, (0, 0, 0, 0), frames)
    (tmp_path / "anim.webp").write_bytes(blob)

    mt = media_table_from_files(spark, str(tmp_path) + "/*.webp")
    sampled = frame_sample_video(mt, every_n=2, max_frames=8)
    rows = sorted(sampled.collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 2]
    ref, _d = decode_webp_frames(blob)
    for r in rows:
        assert np.array_equal(decode_png(bytes(r.frame)), ref[r.frame_idx])
    # sampled frames feed the image batch ops directly
    dec = decode_image_batch(
        sampled.selectExpr("path", "frame as content")
    ).collect()
    assert {(d.width, d.height) for d in dec} == {(cw, ch)}


def test_loop_filter_vectorization_matches_scalar():
    """The vectorized line filter must agree with the scalar spec
    transcription on every line — random and smooth, all three filter
    kinds, multiple limit sets."""
    import astro_sdk_spark.multimodal.vp8 as V

    rng = np.random.default_rng(1)
    for simple in (False, True):
        for mb_edge in (False, True):
            seqs = rng.integers(0, 256, (200, 8)).astype(np.int32)
            seqs[100:] = np.clip(
                seqs[100:, :1] + rng.integers(-6, 6, (100, 8)), 0, 255
            )
            for il, el, t in ((1, 10, 0), (3, 30, 1), (9, 60, 2)):
                vec = V._filter_lines_vec(seqs, il, el, t, mb_edge, simple)
                for i in range(200):
                    seq = [int(v) for v in seqs[i]]
                    ref = (V._simple_line(seq, el) if simple
                           else V._normal_line(seq, il, el, t, mb_edge))
                    exp = list(ref) if ref is not None else seq
                    assert exp == [int(v) for v in vec[i]], (
                        simple, mb_edge, il, el, t, i)
