"""Multimodal plumbing tests (VERDICT r1 #10): binaryFile scan, magic-byte
sniffing, sha256, mapInPandas batch shapes for decode / features / resize /
frame-sample — everything testable without a real decoder."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.multimodal.ops import (
    attach_media_metadata,
    decode_audio_batch,
    decode_image_batch,
    extract_image_features,
    frame_sample_video,
    media_table_from_files,
    resize_images,
)


def _tiny_png() -> bytes:
    """A structurally-valid 1x1 grayscale PNG built by hand."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x00")
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _tiny_wav() -> bytes:
    """Minimal RIFF/WAVE container with a silent sample."""
    data = b"\x00\x00" * 4
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.png").write_bytes(_tiny_png())
    (d / "b.wav").write_bytes(_tiny_wav())
    # lossless-JPEG stub: SOI + SOF3 — the variant the built-in codec
    # legitimately still gates (baseline, progressive, AND arithmetic
    # .jpg now decode for real)
    sof3 = struct.pack(">BBHBHHB", 0xFF, 0xC3, 11, 8, 1, 1, 1) + bytes(
        [1, 0x11, 0]
    )
    (d / "c.jpg").write_bytes(b"\xff\xd8" + sof3 + b"\xff\xd9")
    (d / "d.mp4").write_bytes(b"\x00\x00\x00\x18ftypmp42" + bytes(range(256)))
    return str(d)


def test_media_table_types_and_metadata(spark, media_dir):
    mt = media_table_from_files(spark, media_dir + "/*")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in attach_media_metadata(mt).collect()}
    assert rows["a.png"].media_type == "image"
    assert rows["b.wav"].media_type == "audio"
    assert rows["c.jpg"].media_type == "image"
    assert rows["d.mp4"].media_type == "video"
    assert rows["a.png"].sniffed_format == "png"
    assert rows["b.wav"].sniffed_format == "wav"
    assert rows["c.jpg"].sniffed_format == "jpeg"
    assert rows["d.mp4"].sniffed_format == "unknown"
    # sha256 matches a local hash of the same bytes
    assert rows["a.png"].sha256 == hashlib.sha256(_tiny_png()).hexdigest()
    assert rows["a.png"].n_bytes == len(_tiny_png())


def test_decode_batch_real_png(spark, media_dir):
    mt = media_table_from_files(spark, media_dir + "/*.png")
    out = decode_image_batch(mt)
    assert out.columns == ["path", "width", "height", "channels"]
    row = out.collect()[0]
    # real decode of the 1x1 grayscale PNG
    assert (row.width, row.height, row.channels) == (1, 1, 1)


def test_decode_batch_unsupported_modes(spark, media_dir):
    jpgs = media_table_from_files(spark, media_dir + "/*.jpg")
    with pytest.raises(Exception, match="Pillow|NotImplemented"):
        decode_image_batch(jpgs).collect()
    stubbed = decode_image_batch(jpgs, on_unsupported="stub").collect()
    assert len(stubbed) == 1 and stubbed[0].channels == 3
    assert decode_image_batch(jpgs, on_unsupported="skip").count() == 0


def test_decode_audio_real_wav(spark, media_dir):
    mt = media_table_from_files(spark, media_dir + "/*.wav")
    row = decode_audio_batch(mt).collect()[0]
    assert (row.sample_rate, row.n_channels, row.n_frames) == (8000, 1, 4)
    assert row.duration_s == round(4 / 8000, 6)


def test_extract_features_fixed_dim(spark, media_dir):
    mt = media_table_from_files(spark, media_dir + "/*")
    out = extract_image_features(mt, dim=16).collect()
    assert len(out) == 4
    assert all(len(r.features) == 16 for r in out)
    assert all(0.0 <= x <= 1.0 for r in out for x in r.features)


def test_extract_features_real_pixels(spark, tmp_path):
    import numpy as np

    from astro_sdk_spark.multimodal.codecs import encode_png

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # solid red
    (tmp_path / "red.png").write_bytes(encode_png(img))
    mt = media_table_from_files(spark, str(tmp_path) + "/*.png")
    f = extract_image_features(mt, dim=8).collect()[0].features
    # [Rmean, Rstd, Gmean, Gstd, Bmean, Bstd, hist×2]; gray=85 → low bin
    assert abs(f[0] - 1.0) < 1e-6 and abs(f[1]) < 1e-6
    assert abs(f[2]) < 1e-6 and abs(f[4]) < 1e-6
    assert abs(f[6] - 1.0) < 1e-6 and abs(f[7]) < 1e-6


def test_resize_real_png_reencode(spark, media_dir):
    from astro_sdk_spark.multimodal.codecs import decode_png

    mt = media_table_from_files(spark, media_dir + "/*.png")
    out = resize_images(mt, 32, 32)
    row = out.collect()[0]
    assert (row.width, row.height) == (32, 32)
    # the output blob is a valid PNG of the target size
    arr = decode_png(bytes(row.content))
    assert arr.shape == (32, 32, 1)


def test_resize_passthrough_for_unsupported(spark, media_dir):
    mt = media_table_from_files(spark, media_dir + "/*.jpg")
    row = resize_images(mt, 32, 32, on_unsupported="passthrough").collect()[0]
    # the fixture is the lossless-JPEG stub — gated, passed through
    assert bytes(row.content).startswith(b"\xff\xd8\xff\xc3")


def test_frame_sample_explodes_rows(spark, media_dir):
    mt = media_table_from_files(spark, media_dir + "/*.mp4")
    out = frame_sample_video(mt, every_n=30, max_frames=8).collect()
    assert 1 <= len(out) <= 8
    blob = (b"\x00\x00\x00\x18ftypmp42" + bytes(range(256)))
    for r in out:
        assert bytes(r.frame) == blob[r.frame_idx : r.frame_idx + 30]


def test_resize_real_jpeg(spark, tmp_path):
    """Baseline JPEGs resize for real now: decode → resample → PNG out."""
    import numpy as np

    from astro_sdk_spark.multimodal.codecs import decode_png
    from astro_sdk_spark.multimodal.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [xx * 255 // 55, yy * 255 // 39, np.zeros_like(xx)], axis=-1
    ).astype(np.uint8)
    (tmp_path / "g.jpg").write_bytes(encode_jpeg(img, 90))
    mt = media_table_from_files(spark, str(tmp_path) + "/*.jpg")
    row = resize_images(mt, 28, 20).collect()[0]
    arr = decode_png(bytes(row.content))
    assert arr.shape == (20, 28, 3)
    # gradient direction survives the decode+resize
    assert arr[:, -1, 0].mean() > arr[:, 0, 0].mean() + 100


def _wav_bytes(samples, sr=8000):
    """16-bit mono WAV from a float array in [-1, 1]."""
    import struct as _struct

    import numpy as np

    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = _struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def test_image_phash_stable_across_formats(spark, tmp_path):
    """The same picture saved as PNG and as JPEG must land within a few
    Hamming bits; a structurally different picture must be far."""
    import numpy as np

    from astro_sdk_spark.multimodal.codecs import encode_png
    from astro_sdk_spark.multimodal.jpeg import encode_jpeg
    from astro_sdk_spark.multimodal.ops import image_phash_batch

    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack(
        [
            ((xx // 8 + yy // 8) % 2) * 255,
            xx * 255 // 63,
            yy * 255 // 63,
        ],
        axis=-1,
    ).astype(np.uint8)
    other = img[::-1, ::-1].copy()
    other[..., 0] = 255 - other[..., 0]
    (tmp_path / "a.png").write_bytes(encode_png(img))
    (tmp_path / "a.jpg").write_bytes(encode_jpeg(img, 90))
    (tmp_path / "b.png").write_bytes(encode_png(other))
    mt = media_table_from_files(spark, str(tmp_path) + "/*")
    from astro_sdk_spark.multimodal.ops import phash_near_dup

    hashes = image_phash_batch(mt)
    got = {r.path.rsplit("/", 1)[-1]: r.phash for r in hashes.collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(got["a.png"], got["a.jpg"]) <= 10
    assert ham(got["a.png"], got["b.png"]) > 20
    # 16 blocks -> exhaustive recall for hamming <= 15
    pairs = phash_near_dup(hashes, max_hamming=10, n_blocks=16).collect()
    names = {
        tuple(sorted((p.id_a.rsplit("/", 1)[-1], p.id_b.rsplit("/", 1)[-1])))
        for p in pairs
    }
    assert ("a.jpg", "a.png") in names
    assert not any("b.png" in pair for pair in names)


def test_extract_audio_features_tones(spark, tmp_path):
    """A low tone and a high tone must fingerprint differently, and the
    same tone twice identically (deterministic DSP)."""
    import numpy as np

    from astro_sdk_spark.multimodal.ops import extract_audio_features

    t = np.arange(16000) / 8000.0
    (tmp_path / "low.wav").write_bytes(_wav_bytes(np.sin(2 * np.pi * 100 * t)))
    (tmp_path / "low2.wav").write_bytes(_wav_bytes(np.sin(2 * np.pi * 100 * t)))
    (tmp_path / "high.wav").write_bytes(_wav_bytes(np.sin(2 * np.pi * 3000 * t)))
    mt = media_table_from_files(spark, str(tmp_path) + "/*.wav")
    got = {
        r.path.rsplit("/", 1)[-1]: np.asarray(r.features)
        for r in extract_audio_features(mt).collect()
    }
    assert np.allclose(got["low.wav"], got["low2.wav"])
    cos = float(
        got["low.wav"] @ got["high.wav"]
        / (np.linalg.norm(got["low.wav"]) * np.linalg.norm(got["high.wav"]))
    )
    assert cos < 0.9
    # energy concentrates in different bands
    assert got["low.wav"].argmax() < got["high.wav"].argmax()


def test_corrupt_blob_respects_skip_policy(spark, tmp_path):
    """A truncated JPEG (valid magic, cut entropy data) must be absorbed
    by skip/stub — one bad blob in a scraped corpus must not kill the
    job the caller asked to degrade gracefully."""
    import numpy as np

    from astro_sdk_spark.multimodal.jpeg import encode_jpeg
    from astro_sdk_spark.multimodal.ops import (
        decode_image_batch,
        image_phash_batch,
        resize_images,
    )

    good = encode_jpeg(np.full((16, 16, 3), 80, np.uint8), 85)
    (tmp_path / "ok.jpg").write_bytes(good)
    (tmp_path / "bad.jpg").write_bytes(good[: len(good) // 2])
    mt = media_table_from_files(spark, str(tmp_path) + "/*.jpg")
    assert decode_image_batch(mt, on_unsupported="skip").count() == 1
    assert decode_image_batch(mt, on_unsupported="stub").count() == 2
    assert image_phash_batch(mt, on_unsupported="skip").count() == 1
    assert resize_images(mt, 8, 8, on_unsupported="skip").count() == 1
    with pytest.raises(Exception):
        decode_image_batch(mt).collect()


# ---------------------------------------------------------------------------
# AVI/MJPEG container codec: video frame-sampling is real now


def _gradient_frames(n=5, h=24, w=32):
    import numpy as np

    frames = []
    for i in range(n):
        a = np.zeros((h, w, 3), np.uint8)
        a[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        a[..., 1] = (i * 50) % 256
        frames.append(a)
    return frames


def test_avi_roundtrip_and_metadata():
    from astro_sdk_spark.multimodal.avi import (
        avi_frames,
        avi_metadata,
        write_avi_mjpeg,
    )
    from astro_sdk_spark.multimodal.jpeg import decode_jpeg

    frames = _gradient_frames()
    blob = write_avi_mjpeg(frames, fps=10, quality=90)
    meta = avi_metadata(blob)
    assert (meta["width"], meta["height"]) == (32, 24)
    assert meta["n_frames"] == 5 and meta["fps"] == 10.0
    assert meta["codec"] == "MJPG"
    decoded = [decode_jpeg(f) for f in avi_frames(blob)]
    assert len(decoded) == 5
    for orig, dec in zip(frames, decoded):
        err = abs(dec.astype(float) - orig.astype(float)).mean()
        assert err < 3.0  # q90 baseline JPEG round-trip bound


def test_avi_rejects_non_avi():
    import pytest as _pytest

    from astro_sdk_spark.multimodal.avi import avi_metadata

    with _pytest.raises(ValueError, match="RIFF"):
        avi_metadata(b"\x00" * 64)


def test_frame_sample_real_avi_path(spark, tmp_path):
    from astro_sdk_spark.multimodal.avi import write_avi_mjpeg
    from astro_sdk_spark.multimodal.jpeg import decode_jpeg

    blob = write_avi_mjpeg(_gradient_frames(6), fps=12)
    (tmp_path / "v.avi").write_bytes(blob)
    mt = media_table_from_files(spark, str(tmp_path) + "/*.avi")
    out = frame_sample_video(mt, every_n=2, max_frames=2).collect()
    # every 2nd FRAME, capped at 2: frame numbers 0 and 2
    assert sorted(r.frame_idx for r in out) == [0, 2]
    for r in out:
        arr = decode_jpeg(bytes(r.frame))  # each frame is a standalone JPEG
        assert arr.shape == (24, 32, 3)
        # channel 1 encodes the frame number (i*50) — proves the right
        # frame chunk was sliced, not arbitrary bytes
        assert abs(float(arr[..., 1].mean()) - r.frame_idx * 50) < 6


def test_frame_sample_avi_feeds_phash(spark, tmp_path):
    """Sampled frames compose with the image pipeline: pHash over the
    frame column works because each frame is a real JPEG."""
    from astro_sdk_spark.multimodal.avi import write_avi_mjpeg
    from astro_sdk_spark.multimodal.ops import image_phash_batch

    blob = write_avi_mjpeg(_gradient_frames(3), fps=10)
    (tmp_path / "v.avi").write_bytes(blob)
    mt = media_table_from_files(spark, str(tmp_path) + "/*.avi")
    frames = frame_sample_video(mt, every_n=1, max_frames=3)
    keyed = frames.select(
        F.concat_ws("#", "path", F.col("frame_idx").cast("string")).alias("fid"),
        F.col("frame").alias("content"),
    )
    hashes = image_phash_batch(keyed, content_col="content", id_col="fid").collect()
    assert len(hashes) == 3
    assert all(r.phash is not None for r in hashes)


def test_sniff_distinguishes_avi_from_wav(spark, tmp_path):
    from astro_sdk_spark.multimodal.avi import write_avi_mjpeg

    (tmp_path / "v.avi").write_bytes(write_avi_mjpeg(_gradient_frames(1)))
    (tmp_path / "s.wav").write_bytes(_tiny_wav())
    mt = attach_media_metadata(media_table_from_files(spark, str(tmp_path) + "/*"))
    rows = {r.path.rsplit("/", 1)[-1]: r.sniffed_format for r in mt.collect()}
    assert rows == {"v.avi": "avi", "s.wav": "wav"}


def test_avi_parser_never_crashes_on_corrupt_bytes():
    """Corrupt-blob policy: truncated/garbled AVI bytes must either parse
    or raise ValueError — never struct.error/IndexError (hypothesis over
    random mutations of a valid container)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from astro_sdk_spark.multimodal.avi import (
        avi_frame_offsets,
        avi_metadata,
        write_avi_mjpeg,
    )

    valid = write_avi_mjpeg(_gradient_frames(2), fps=10)

    @settings(max_examples=120, deadline=None)
    @given(
        st.integers(0, len(valid)),
        st.binary(max_size=24),
        st.integers(0, len(valid)),
    )
    def fuzz(cut, junk, splice):
        blob = valid[:cut] + junk + valid[splice:]
        for fn in (avi_metadata, avi_frame_offsets):
            try:
                fn(blob)
            except ValueError:
                pass  # the one allowed failure mode

    fuzz()
