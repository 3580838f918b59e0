"""Distributed Bloom filter for exact cross-corpus dedup at scale.

The 100 TB problem: admitting a new batch against a multi-billion-document
accepted corpus with an anti-join shuffles the batch AND the corpus key
set on every ingest tick. A Bloom filter over the corpus keys collapses
that to a broadcast: ~1.2 GB of bitmap summarizes 10⁹ keys at 1% false-
positive rate (n_bits ≈ 9.6 per key for k=7), every executor probes it
in O(1) per row, and only the tiny maybe-duplicate slice (true dups +
~1% FPs) pays a verification join. Negatives are exact — a Bloom filter
has no false negatives — so the final result equals the plain anti-join
bit-for-bit, which is what lets ``q_bloom_dedup`` sit under the hash
oracle gate.

Spark-first layout:

- bit positions are computed JVM-side (``xxhash64`` per hash seed, codegen)
  on both the build and probe sides, so the Python boundary never hashes;
- the build aggregates per-partition bitmaps in a ``mapInPandas`` pass
  (numpy bitset, one row out per partition) and folds the partials with
  an executor-side OR tree (fan-in ``fanin`` per level, hash-keyed
  repartitions) — the driver receives exactly ONE bitmap regardless of
  input partition count, so driver traffic is O(n_bits/8), not
  O(partitions × n_bits/8);
- the probe broadcasts the bitmap inside an Arrow-batched pandas iterator
  (vectorized ``bits[pos >> 3] & mask`` over the whole batch at once).

(Spark's JVM ``DataFrameStatFunctions.bloomFilter`` exists but is not
exposed to PySpark; this implementation also keeps the bitmap portable —
bytes in, bytes out — so it can live in a table next to the minhash
signature store.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bit_positions", "build_bloom", "bloom_might_contain", "bloom_dedup"]


def bit_positions(key_col: str, n_bits: int, n_hashes: int):
    """Column expression: array of ``n_hashes`` bit positions for a key.
    JVM-side (xxhash64 + pmod, whole-stage codegen); identical on build
    and probe sides by construction."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )


def build_bloom(
    df: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 7,
    fanin: int = 16,
) -> bytes:
    """Bloom bitmap (``n_bits/8`` bytes) over ``df[key_col]``.

    One scan, no key shuffle: each partition sets bits into a local numpy
    bitset and emits it once; the per-partition partials are then OR-folded
    in an executor-side tree (``fanin`` partials per fold task, hash-keyed
    repartitions of bitmap rows only), so the driver collects exactly ONE
    final bitmap no matter how many input partitions the scan had. At the
    100 TB setting (~1.2 GB bitmap for 10⁹ keys, thousands of scan
    partitions) the old driver-side OR would have held partitions × 1.2 GB
    on the driver; the tree holds ≤ ``fanin`` partials per *task* instead
    (set ``spark.sql.execution.arrow.maxRecordsPerBatch`` ≈ 1-4 for
    GB-scale bitmaps so Arrow transfer batches stay bounded too).
    Size the filter as ``n_bits ≈ 9.6 × n_keys`` for ~1% FP at k=7
    (``n_bits = -n ln p / (ln 2)²``).
    """
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    if fanin < 2:
        raise ValueError("fanin must be >= 2")
    # null keys carry SQL join semantics (never equal to anything) — they
    # set no bits, mirroring the anti-join they stand in for.
    # (Deliberately NOT spread_small_scan'd like the other sketch builds:
    # the builder emits one n_bits/8-byte partial bitmap PER PARTITION,
    # so spreading a small input multiplies partial-bitmap volume through
    # the OR-fold — measured q_bloom_dedup 1.17 s → 1.72 s. Row-group-
    # bound scan parallelism is the cheaper side of that trade here.)
    pos_df = df.filter(F.col(key_col).isNotNull()).select(
        bit_positions(key_col, n_bits, n_hashes).alias("_pos")
    )
    n_bytes = n_bits // 8
    schema = "_g long, _bitmap binary"

    def to_bitmaps(batches):
        import pandas as pd
        from pyspark import TaskContext

        bits = np.zeros(n_bytes, dtype=np.uint8)
        touched = False
        for pdf in batches:
            if not len(pdf):
                continue
            touched = True
            pos = np.concatenate(pdf["_pos"].to_numpy())
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if touched:
            # group id for the NEXT fold level: fanin consecutive
            # partitions land in one fold task (deterministic — safe
            # under task retry, unlike round-robin repartition)
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame({"_g": [pid // fanin], "_bitmap": [bits.tobytes()]})

    def or_fold(batches):
        import pandas as pd
        from pyspark import TaskContext

        acc = None
        for pdf in batches:
            for buf in pdf["_bitmap"]:
                part = np.frombuffer(buf, dtype=np.uint8)
                acc = part.copy() if acc is None else acc | part
        if acc is not None:
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame({"_g": [pid // fanin], "_bitmap": [acc.tobytes()]})

    folded = pos_df.mapInPandas(to_bitmaps, schema)
    n = max(1, pos_df.rdd.getNumPartitions())
    while n > 1:
        n = -(-n // fanin)  # ceil division; final level has n == 1
        folded = folded.repartition(n, "_g").mapInPandas(or_fold, schema)
    rows = folded.collect()  # ≤ 1 row by construction
    if not rows:
        return bytes(n_bytes)
    return bytes(rows[0]._bitmap)


def bloom_might_contain(
    df: DataFrame,
    bloom: bytes,
    key_col: str,
    n_hashes: int = 7,
    out_col: str = "_maybe_dup",
) -> DataFrame:
    """Annotate ``df`` with a boolean: True iff every bit position of the
    key is set (possible member — needs verification), False iff the key
    is DEFINITELY absent from the set the filter was built over."""
    n_bits = len(bloom) * 8
    pos_expr = bit_positions(key_col, n_bits, n_hashes).alias("_pos")
    cols = df.columns

    def probe(batches):
        bits = np.frombuffer(bloom, dtype=np.uint8)
        for pdf in batches:
            if len(pdf):
                # null key → null positions → definitely-new (SQL null
                # never joins); substitute 0s for the bit test, then mask
                raw = pdf["_pos"].to_numpy()
                null_mask = np.array([p is None for p in raw])
                pos = np.stack(
                    [np.zeros(n_hashes, dtype=np.int64) if p is None else p for p in raw]
                )
                hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
                pdf[out_col] = hit.all(axis=1) & ~null_mask
            else:
                pdf[out_col] = np.array([], dtype=bool)
            yield pdf[[*cols, out_col]]

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{out_col}` boolean"
    return df.select("*", pos_expr).mapInPandas(probe, schema)


def bloom_dedup(
    batch: DataFrame,
    corpus_keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 7,
    bloom: bytes | None = None,
) -> DataFrame:
    """Exact anti-join of ``batch`` against ``corpus_keys`` with a Bloom
    prefilter: rows whose keys definitely aren't in the corpus skip the
    join entirely; only maybe-dup rows (true dups + ~FP-rate of the batch)
    are verified with a real anti-join. Returns exactly the rows of
    ``batch`` whose ``key_col`` does not occur in ``corpus_keys`` — same
    result as ``batch.join(corpus_keys, key_col, "left_anti")``, with the
    corpus-sized shuffle replaced by a broadcast bitmap.

    Pass a prebuilt ``bloom`` (e.g. maintained incrementally next to the
    signature store) to skip the build scan.
    """
    if bloom is None:
        bloom = build_bloom(corpus_keys, key_col, n_bits=n_bits, n_hashes=n_hashes)
    flagged = bloom_might_contain(batch, bloom, key_col, n_hashes=n_hashes)
    definite_new = flagged.filter(~F.col("_maybe_dup")).drop("_maybe_dup")
    maybe = flagged.filter(F.col("_maybe_dup")).drop("_maybe_dup")
    verified_new = maybe.join(
        corpus_keys.select(key_col).distinct(), on=key_col, how="left_anti"
    )
    return definite_new.unionByName(verified_new)
