"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas UDFs.

The Spark-side machinery (schema, partitioning, mapInPandas batch shape,
binaryFile source) is real and tested; the actual pixel/sample decoding is
STUBBED (Pillow/librosa/av are not available in this container) behind
``_decode_image_stub`` — a deterministic fake that yields stable
"dimensions" from the byte content, with the real implementation's
signature and batch contract. Swapping in a real decoder changes ONE
function, not the pipeline.

Scale notes:
- ``spark.read.format("binaryFile")`` splits per file across executors;
  pair with ``spark.sql.files.maxPartitionBytes`` for many-small-files.
- decode/feature UDFs run on Arrow batches (mapInPandas) — batch size
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of
  large blobs fits executor memory.
- blobs stay opaque bytes end-to-end; only metadata/features shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Typed metadata contract for a media table.
MEDIA_SCHEMA = (
    "path string, modification_time timestamp, length long, content binary, "
    "media_type string"
)

_IMAGE_EXT = {".png", ".jpg", ".jpeg", ".gif", ".bmp", ".webp"}
_AUDIO_EXT = {".wav", ".mp3", ".flac", ".ogg"}
_VIDEO_EXT = {".mp4", ".avi", ".mkv", ".webm"}


def media_table_from_files(
    spark: SparkSession, path_glob: str, media_type: str | None = None
) -> DataFrame:
    """Binary-file scan → media table (path, mtime, length, content bytes,
    media_type inferred from extension unless given)."""
    df = spark.read.format("binaryFile").load(path_glob)
    if media_type is not None:
        mt = F.lit(media_type)
    else:
        ext = F.lower(F.regexp_extract("path", r"(\.[A-Za-z0-9]+)$", 1))
        mt = (
            F.when(ext.isin(*_IMAGE_EXT), "image")
            .when(ext.isin(*_AUDIO_EXT), "audio")
            .when(ext.isin(*_VIDEO_EXT), "video")
            .otherwise("binary")
        )
    return df.withColumn("media_type", mt)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata derivable without decode: byte length, sha256,
    magic-byte sniffing — all built-ins / deterministic."""
    c = F.col(content_col)
    magic = F.hex(F.substring(c, 1, 4))
    return (
        df.withColumn("n_bytes", F.length(c))
        .withColumn("sha256", F.sha2(c, 256))
        .withColumn(
            "sniffed_format",
            F.when(magic.startswith("89504E47"), "png")
            .when(magic.startswith("FFD8"), "jpeg")
            .when(magic.startswith("52494646"), "riff")
            .otherwise("unknown"),
        )
    )


def _decode_image_stub(blob: bytes) -> tuple[int, int, int]:
    """STUB decoder: deterministic fake (width, height, channels) from the
    byte content. Replace with Pillow:  ``img = PIL.Image.open(io.BytesIO(
    blob)); return (*img.size, len(img.getbands()))``."""
    if blob is None or len(blob) == 0:
        raise NotImplementedError("empty blob — real decoder would raise corrupt-image")
    h = hashlib.sha256(blob).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 3)


def decode_image_batch(
    df: DataFrame, content_col: str = "content", id_col: str = "path"
) -> DataFrame:
    """mapInPandas decode: (id, width, height, channels). The UDF sees
    Arrow batches of binary blobs — the real-world shape for GPU/CPU
    decode stages."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_image_stub(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    schema = f"{id_col} string, width int, height int, channels int"
    return df.select(id_col, content_col).mapInPandas(_decode, schema=schema)


def extract_image_features(
    df: DataFrame, content_col: str = "content", id_col: str = "path", dim: int = 16
) -> DataFrame:
    """Feature extraction stub → fixed-dim float vector per blob
    (deterministic bytes→floats; a real model slots into the same
    mapInPandas contract, typically with GPU batching)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[content_col]:
                h = hashlib.sha256(b or b"").digest()
                feats.append([h[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(
        _feat, schema=f"{id_col} string, features array<float>"
    )


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
    id_col: str = "path",
) -> DataFrame:
    """Resize stub: passes blobs through and records the target shape —
    the real version re-encodes bytes in place (same schema: binary out)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": pdf[content_col],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        _resize, schema=f"{id_col} string, content binary, width int, height int"
    )


def frame_sample_video(
    df: DataFrame,
    every_n: int = 30,
    max_frames: int = 8,
    content_col: str = "content",
    id_col: str = "path",
) -> DataFrame:
    """Frame-sampling stub: emits (video, frame_idx, frame_bytes) rows —
    one input row explodes into ≤max_frames output rows, the real shape of
    a video→frames stage (the exploded layout is what downstream image ops
    consume). Frame bytes are deterministic slices of the blob."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for pid, b in zip(pdf[id_col], pdf[content_col]):
                blob = b or b""
                n = min(max_frames, max(1, len(blob) // max(every_n, 1)))
                for i in range(n):
                    ids.append(pid)
                    idxs.append(i * every_n)
                    frames.append(blob[i * every_n : i * every_n + every_n])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, content_col).mapInPandas(
        _sample, schema=f"{id_col} string, frame_idx int, frame binary"
    )
