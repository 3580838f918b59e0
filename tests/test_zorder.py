"""Z-order clustering: interleave correctness and the two-dimension
file-skipping payoff that linear sort cannot give."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.zorder import add_zorder, zorder_col


def test_interleave_bits_exact(spark):
    # a=0b10, b=0b01, 2 bits: z = a0<<0 | b0<<1 | a1<<2 | b1<<3
    #   a0=0, b0=1, a1=1, b1=0 -> 0b0110 = 6
    df = spark.createDataFrame([(2, 1)], "a int, b int")
    z = df.select(
        zorder_col([F.col("a"), F.col("b")], bits=2).alias("z")
    ).collect()[0].z
    assert z == 6


def test_add_zorder_locality(spark):
    """Nearby points in BOTH dimensions get nearby z-values; the extreme
    corner is far from the origin corner."""
    rows = [(i, j) for i in range(16) for j in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    out = {(r.x, r.y): r._zorder for r in add_zorder(df, ["x", "y"], bits=4).collect()}
    assert out[(0, 0)] == 0
    assert out[(15, 15)] == 255
    # z-curve locality: the 2x2 block at origin maps to the 4 smallest values
    block = sorted(out[(i, j)] for i in range(2) for j in range(2))
    assert block == [0, 1, 2, 3]


def test_add_zorder_null_and_constant(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (3, 5.0), (9, 5.0)], "x int, y double"
    )
    out = add_zorder(df, ["x", "y"], bits=4).collect()
    assert all(r._zorder is not None for r in out)
    # y is constant -> contributes bucket 0 everywhere
    zs = {r.x: r._zorder for r in out}
    assert zs[None] == 0  # null x -> bucket 0 too


def test_add_zorder_validates(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError, match="non-empty"):
        add_zorder(df, [])
    with pytest.raises(ValueError, match="63"):
        add_zorder(df, ["a", "b"], bits=40)
    with pytest.raises(ValueError, match="not in frame"):
        add_zorder(df, ["nope"])


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """The payoff: a z-ordered layout lets parquet min/max stats skip
    files for range predicates on EITHER column, where a linear sort
    only serves its own column."""
    n = 20000
    df = spark.range(n).select(
        (F.col("id") % 141).alias("x"),
        ((F.col("id") * 7919) % 149).alias("y"),
    )
    z = add_zorder(df, ["x", "y"], bits=7)

    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zord")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(linear)
    z.repartitionByRange(16, "_zorder").sortWithinPartitions("_zorder").drop(
        "_zorder"
    ).write.parquet(zord)

    def skip_frac(path, col):
        # the same two distinct-file counts engine.file_skip_report runs
        d = spark.read.parquet(path)
        total = d.select(F.input_file_name()).distinct().count()
        hit = (
            d.filter(F.col(col) < 15)
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        return 1.0 - hit / total

    # z-order: BOTH dimensions skip a meaningful fraction of files
    assert skip_frac(zord, "x") > 0.3
    assert skip_frac(zord, "y") > 0.3
    # the contrast the test is named for: a LINEAR x-sort serves x but
    # leaves y scattered across every file
    assert skip_frac(linear, "x") > 0.5
    assert skip_frac(linear, "y") < 0.1


def test_zorder_wide_interleave_no_sign_corruption(spark):
    """bits*cols > 31 must produce correct POSITIVE 64-bit values —
    IntegerType shifts wrap at 32 bits (sign bit) unless the bucket is
    widened first."""
    df = spark.createDataFrame([(65535, 65535), (0, 0)], "a int, b int")
    out = {r.a: r.z for r in df.select(
        F.col("a"),
        zorder_col([F.col("a"), F.col("b")], bits=16).alias("z"),
    ).collect()}
    assert out[65535] == (1 << 32) - 1  # all 32 low bits set, positive
    assert out[0] == 0


def test_add_zorder_rejects_column_collision(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, _zorder int")
    with pytest.raises(ValueError, match="_zorder"):
        add_zorder(df, ["a", "b"])
