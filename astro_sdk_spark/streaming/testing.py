"""Deterministic micro-batch scheduling for tests and oracle-gated
streaming queries: Spark's FileStreamSource orders files by modification
time, so staging static frames as one file each with strictly increasing
mtimes turns ``maxFilesPerTrigger=1`` into an exact replay schedule
(frame 0 = micro-batch 0, ...). Harness device only — production streams
get their ordering from the source, not from mtimes."""

from __future__ import annotations

import os


def stage_microbatch_files(frames, path: str) -> str:
    """Write each DataFrame in ``frames`` as ONE parquet file under
    ``path`` and stamp strictly increasing mtimes IN WRITE ORDER. The
    per-frame file set is captured by diffing the directory after each
    write (never by sorting observed mtimes, which tie on coarse-mtime
    filesystems and would scramble the schedule)."""
    seen: set[str] = set()
    frame_files: list[list[str]] = []
    for f in frames:
        f.coalesce(1).write.mode("append").parquet(path)
        now = {p for p in os.listdir(path) if p.endswith(".parquet")}
        frame_files.append(sorted(now - seen))
        seen = now
    base = max(
        os.path.getmtime(os.path.join(path, p)) for p in seen
    ) if seen else 0.0
    tick = 0
    for files in frame_files:
        for p in files:
            os.utime(os.path.join(path, p), (base + tick, base + tick))
        tick += 1
    return path
