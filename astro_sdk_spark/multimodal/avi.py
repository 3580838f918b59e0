"""Stdlib AVI (RIFF) container codec for MJPEG video — the format pair
that makes the video column REAL with zero native dependencies: each
'00dc' chunk in an MJPEG AVI is a standalone baseline JPEG, which the
pure-numpy codec in ``multimodal.jpeg`` already decodes and encodes.

Container layout per the public AVI RIFF spec (Microsoft "AVI RIFF File
Reference"; OpenDML AVI extensions not required for single-stream MJPEG):

    RIFF('AVI '
      LIST('hdrl'
        avih(<MainAVIHeader>)
        LIST('strl' strh(<AVIStreamHeader>) strf(<BITMAPINFOHEADER>)))
      LIST('movi' 00dc(<jpeg>) 00dc(<jpeg>) ...)
      idx1(<index entries>))

All chunks are word-aligned (odd sizes padded with one zero byte).

Scale shape: this module is pure bytes→frames plumbing used INSIDE the
Arrow-batched mapInPandas stages of ``multimodal.ops`` — blobs never
shuffle, frame extraction is per-row work on the executor holding the
blob, and ``avi_frame_offsets`` lets a sampler slice single frames out
of a large blob without materializing the rest.
"""

from __future__ import annotations

import struct

__all__ = ["avi_metadata", "avi_frames", "avi_frame_offsets", "write_avi_mjpeg", "is_avi"]


def is_avi(blob: bytes) -> bool:
    return len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"AVI "


def _chunks(blob: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for chunks in a span,
    honoring word alignment."""
    pos = start
    while pos + 8 <= end:
        fcc = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError("avi: chunk overruns its parent")
        yield fcc, payload, size
        pos = payload + size + (size & 1)


def avi_metadata(blob: bytes) -> dict:
    """Main-header metadata: width, height, n_frames, us_per_frame, fps,
    codec fourcc (from the video stream header)."""
    if not is_avi(blob):
        raise ValueError("not an AVI (missing RIFF/'AVI ' signature)")
    meta: dict = {}
    for fcc, p, size in _chunks(blob, 12, len(blob)):
        if fcc != b"LIST" or blob[p : p + 4] != b"hdrl":
            continue
        for sfcc, sp, ssize in _chunks(blob, p + 4, p + size):
            if sfcc == b"avih":
                if ssize < 40:
                    raise ValueError("avi: truncated avih header")
                us_pf, _maxbps, _pad, _flags, total, _init, _streams, _buf, w, h = (
                    struct.unpack_from("<10I", blob, sp)
                )
                meta.update(
                    width=w, height=h, n_frames=total, us_per_frame=us_pf,
                    fps=(1_000_000 / us_pf if us_pf else 0.0),
                )
            elif sfcc == b"LIST" and blob[sp : sp + 4] == b"strl":
                for tfcc, tp, _tsize in _chunks(blob, sp + 4, sp + ssize):
                    if tfcc == b"strh" and blob[tp : tp + 4] == b"vids":
                        meta["codec"] = blob[tp + 4 : tp + 8].decode(
                            "ascii", "replace"
                        )
        break
    if "width" not in meta:
        raise ValueError("avi: no hdrl/avih header found")
    return meta


def avi_frame_offsets(blob: bytes) -> list[tuple[int, int]]:
    """(offset, size) of every video frame chunk ('00dc'/'00db') in movi
    order — slice ``blob[off:off+size]`` to pull one frame without
    touching the others."""
    if not is_avi(blob):
        raise ValueError("not an AVI (missing RIFF/'AVI ' signature)")
    out: list[tuple[int, int]] = []
    for fcc, p, size in _chunks(blob, 12, len(blob)):
        if fcc == b"LIST" and blob[p : p + 4] == b"movi":
            for sfcc, sp, ssize in _chunks(blob, p + 4, p + size):
                if sfcc[2:4] in (b"dc", b"db") and sfcc[:2].isdigit():
                    out.append((sp, ssize))
    return out


def avi_frames(blob: bytes) -> list[bytes]:
    """Every video frame payload (for MJPEG: standalone JPEG blobs)."""
    return [blob[o : o + s] for o, s in avi_frame_offsets(blob)]


def write_avi_mjpeg(frames, fps: float = 30.0, quality: int = 90) -> bytes:
    """Encode (H, W, 1|3) uint8 arrays — or pre-encoded JPEG ``bytes`` —
    into a single-stream MJPEG AVI. Deterministic output (fixed header
    fields, Annex-K JPEG tables)."""
    from astro_sdk_spark.multimodal.jpeg import encode_jpeg

    if not frames:
        raise ValueError("write_avi_mjpeg needs at least one frame")
    jpegs = [
        f if isinstance(f, (bytes, bytearray)) else encode_jpeg(f, quality=quality)
        for f in frames
    ]
    from astro_sdk_spark.multimodal.jpeg import decode_jpeg

    first = decode_jpeg(bytes(jpegs[0]))
    h, w = first.shape[0], first.shape[1]
    us_pf = int(round(1_000_000 / float(fps)))

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(four: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four + payload)

    max_size = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<10I16x", us_pf, max_size * int(round(fps)), 0, 0x10,  # AVIF_HASINDEX
        len(jpegs), 0, 1, max_size, w, h,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                        1, int(round(fps)),  # scale, rate
                                        0, len(jpegs), max_size, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", bytes(j)) for j in jpegs)
    movi = lst(b"movi", movi_payload)
    # idx1: offsets relative to the start of the movi list's type fourcc
    idx_entries = []
    off = 4
    for j in jpegs:
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
