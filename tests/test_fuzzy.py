"""edit_distance_join — exactness vs the brute-force cross join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.fuzzy import edit_distance_join


def _brute_self(df, d):
    a = df.select(F.col("id").alias("ia"), F.col("name").alias("na"))
    b = df.select(F.col("id").alias("ib"), F.col("name").alias("nb"))
    return {
        (r.ia, r.ib)
        for r in a.crossJoin(b)
        .filter((F.col("ia") < F.col("ib")) & (F.levenshtein("na", "nb") <= d))
        .collect()
    }


@pytest.fixture(scope="module")
def cust(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") <= 120)
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
        .cache()
    )


@pytest.mark.parametrize("d", [1, 2])
def test_self_join_matches_brute_force(cust, d):
    got = {(r.id_a, r.id_b) for r in edit_distance_join(cust, max_dist=d).collect()}
    assert got == _brute_self(cust, d) and got


def test_adversarial_shapes(spark):
    """Repeated grams, strings at/below the gram floor, empties."""
    rows = [
        (1, "aaaa"), (2, "aaab"), (3, "aaa"), (4, "a"), (5, ""),
        (6, "b"), (7, "ab"), (8, "xyz"), (9, "xzy"), (10, "aaaa"),
        (11, "zzzzzz"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.id_a, r.id_b) for r in edit_distance_join(df, max_dist=1).collect()}
    assert got == _brute_self(df, 1)


def test_two_sided_join(spark):
    a = spark.createDataFrame(
        [(1, "spark"), (2, "shark"), (3, "plonk")], "id long, name string"
    )
    b = spark.createDataFrame(
        [(10, "spork"), (11, "stark"), (12, "plank")], "id long, name string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(a, b, max_dist=1).collect()
    }
    assert got == {(1, 10, 1), (1, 11, 1), (2, 11, 1), (3, 12, 1)}


def test_null_text_never_matches(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "abd")], "id long, name string"
    )
    got = {(r.id_a, r.id_b) for r in edit_distance_join(df, max_dist=1).collect()}
    assert got == {(1, 3)}


def test_dist_column_and_validation(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id long, name string")
    rows = edit_distance_join(df, max_dist=1).collect()
    assert rows[0].dist == 1
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join(df, max_dist=0)
    with pytest.raises(ValueError, match="q must"):
        edit_distance_join(df, q=1)


def test_no_cross_product_above_the_floor(spark, cust):
    """The physical plan's only cartesian node is the empty short-string
    sliver — the main path must be the prefix equi-join."""
    plan = edit_distance_join(cust, max_dist=1)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("CartesianProduct") <= 1

# ---------------------------------------------------------------------------
# jaccard_join — exact n-gram set-similarity join (AllPairs/PPJoin)


def _brute_jaccard(spark, df, threshold, k):
    """Reference result: cross-join + exact Jaccard on shingle sets."""
    from astro_sdk_spark.functions.dedup import shingles_col

    s = df.select(
        F.col("doc_id").alias("i"), shingles_col(F.col("text"), k).alias("s")
    )
    a = s.select(F.col("i").alias("ia"), F.col("s").alias("sa"))
    b = s.select(F.col("i").alias("ib"), F.col("s").alias("sb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "j",
            F.col("inter")
            / (F.size("sa") + F.size("sb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("j") >= threshold)
    )
    return {(r.ia, r.ib): round(r.j, 6) for r in pairs.collect()}


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_jaccard_join_equals_brute_force(spark):
    from astro_sdk_spark.functions.fuzzy import jaccard_join

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox leaps over the lazy dog"),
        (4, "pack my box with five dozen liquor jugs"),
        (5, "pack my box with five dozen liquor jugs"),  # exact dup of 4
        (6, "a completely different sentence entirely here"),
        (7, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        (8, "short text"),
        (9, "short text"),
    ]
    df = _docs(spark, rows)
    for tau in (0.5, 0.7, 0.9):
        got = {
            (r.id_a, r.id_b): round(r.jaccard, 6)
            for r in jaccard_join(df, threshold=tau, shingle_k=3).collect()
        }
        assert got == _brute_jaccard(spark, df, tau, 3), f"tau={tau}"


def test_jaccard_join_exact_dups_score_one(spark):
    from astro_sdk_spark.functions.fuzzy import jaccard_join

    df = _docs(spark, [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")])
    out = jaccard_join(df, threshold=0.99).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in out] == [(1, 2, 1.0)]


def test_jaccard_join_two_sided(spark):
    from astro_sdk_spark.functions.fuzzy import jaccard_join

    a = _docs(spark, [(1, "one two three four five"), (2, "unrelated words here now")])
    b = _docs(spark, [(10, "one two three four five"), (11, "one two three four six")])
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 4)
        for r in jaccard_join(a, b, threshold=0.5).collect()
    }
    # doc1 vs doc10: identical (j=1.0); doc1 vs doc11: trigram sets
    # {one two three, two three four, three four five/six} share 2 of 4.
    assert got == {(1, 10): 1.0, (1, 11): 0.5}


def test_jaccard_join_short_text_fallback(spark):
    # texts with < k tokens collapse to a single whole-text shingle;
    # identical short texts must still pair at j=1.0
    from astro_sdk_spark.functions.fuzzy import jaccard_join

    df = _docs(spark, [(1, "hi"), (2, "hi"), (3, "yo")])
    got = {(r.id_a, r.id_b) for r in jaccard_join(df, threshold=0.9).collect()}
    assert got == {(1, 2)}


def test_jaccard_join_no_cartesian_in_plan(spark):
    from astro_sdk_spark.functions.fuzzy import jaccard_join

    df = _docs(spark, [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(30)])
    plan = jaccard_join(df, threshold=0.8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_jaccard_join_threshold_validation(spark):
    from astro_sdk_spark.functions.fuzzy import jaccard_join

    df = _docs(spark, [(1, "a b c")])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        jaccard_join(df, threshold=0.0)
    with _pytest.raises(ValueError):
        jaccard_join(df, threshold=1.5)


def test_jaccard_join_pre_dedup_equals_brute_force(spark):
    # dup-heavy corpus: groups of identical texts + near-dup neighbors;
    # pre_dedup + expand must reproduce the brute-force answer verbatim
    from astro_sdk_spark.functions.fuzzy import jaccard_join

    rows = (
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
        + [(i, "the quick brown fox jumps over the lazy cat") for i in range(10, 13)]
        + [(20, "entirely unrelated content in this document"),
           (21, "pack my box with five dozen liquor jugs")]
    )
    df = _docs(spark, rows)
    for tau in (0.5, 0.8):
        want = _brute_jaccard(spark, df, tau, 3)
        got = {
            (r.id_a, r.id_b): round(r.jaccard, 6)
            for r in jaccard_join(df, threshold=tau, pre_dedup=True).collect()
        }
        assert got == want, f"tau={tau}"


def test_jaccard_join_pre_dedup_rep_level(spark):
    # expand=False stays at representative (min-id-per-text) level
    from astro_sdk_spark.functions.fuzzy import jaccard_join

    rows = [
        (3, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),
    ]
    df = _docs(spark, rows)
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 4)
        for r in jaccard_join(
            df, threshold=0.4, pre_dedup=True, expand=False
        ).collect()
    }
    # reps are 1 (for the dup pair 1,3) and 2; only the cross pair shows
    assert got == {(1, 2): 0.5}


def test_jaccard_join_pre_dedup_rejects_two_sided(spark):
    from astro_sdk_spark.functions.fuzzy import jaccard_join

    df = _docs(spark, [(1, "a b c")])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        jaccard_join(df, df, pre_dedup=True)


def test_jaccard_join_randomized_equals_brute_force(spark):
    """Randomized (seeded) corpora: prefix-filtered result must equal the
    brute-force cross join on every draw — vocabulary overlap tuned so
    thresholds produce a mix of hits and misses."""
    import random

    from astro_sdk_spark.functions.fuzzy import jaccard_join

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(5):
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(25)
        ]
        df = _docs(spark, rows)
        tau = rng.choice([0.3, 0.5, 0.7, 0.9])
        want = _brute_jaccard(spark, df, tau, 3)
        for pd_flag in (False, True):
            got = {
                (r.id_a, r.id_b): round(r.jaccard, 6)
                for r in jaccard_join(
                    df, threshold=tau, pre_dedup=pd_flag
                ).collect()
            }
            assert got == want, f"trial={trial} tau={tau} pre_dedup={pd_flag}"


def test_jaccard_join_tau_boundary_exact_contract(spark):
    """EXACT contract at awkward thresholds: τ·n that overshoots in binary
    double (0.07·100 = 7.000000000000001) used to shorten the prefix by one
    and — worse — made the size filter reject |B| = τ·|A| boundary pairs.
    The rational-integer arithmetic must keep every pair with
    J ≥ τ EXACTLY, verified against a Fraction-based brute force."""
    from fractions import Fraction

    from astro_sdk_spark.functions.fuzzy import jaccard_join

    def brute(rows, tau_frac, k=1):
        def sh(text):
            ws = text.split()
            if len(ws) < k:
                return frozenset([text])
            return frozenset(" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1))

        sets = {i: sh(t) for i, t in rows}
        out = set()
        ids = sorted(sets)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = sets[ids[x]], sets[ids[y]]
                inter = len(a & b)
                union = len(a | b)
                if union and Fraction(inter, union) >= tau_frac:
                    out.add((ids[x], ids[y]))
        return out

    # size-filter boundary: |A| = 100 words, B = 7 of them (B ⊂ A) →
    # J = 7/100 = τ exactly; the old double filter dropped this pair
    a_words = [f"w{i:03d}" for i in range(100)]
    rows = [
        (1, " ".join(a_words)),
        (2, " ".join(a_words[:7])),
        # prefix-overshoot shape: two 100-gram docs sharing exactly 14 → 14/186 > τ
        (3, " ".join(a_words[:14] + [f"x{i:03d}" for i in range(86)])),
        (4, " ".join(a_words[:14] + [f"y{i:03d}" for i in range(86)])),
        # J exactly τ via inter=7, union=100 across 53/54-gram docs
        (5, " ".join([f"s{i}" for i in range(7)] + [f"p{i}" for i in range(46)])),
        (6, " ".join([f"s{i}" for i in range(7)] + [f"q{i}" for i in range(47)])),
        # clearly below τ: no shared words at all
        (7, " ".join(f"z{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_join(
            df, text_col="text", id_col="doc_id", threshold=0.07, shingle_k=1
        ).collect()
    }
    want = brute(rows, Fraction(7, 100))
    assert (1, 2) in want  # the boundary pair must be part of the contract
    assert got == want

    # long-repr τ: 0.3333333 (7 decimal digits — decimal DIVISION at
    # Spark's scale-6 HALF_UP would round ceil(0.9999999) up to 2 and
    # shorten the 3-shingle doc's prefix; the cross-multiplied rank
    # filter must keep it). A={x,y,z}, B={x}: J = 1/3 ≥ τ, and
    # |B| = 1 sits exactly on the τ·|A| size boundary.
    rows_longtau = [
        (1, "x y z"),
        (2, "x"),
        (3, "p q r s"),
    ]
    df_lt = spark.createDataFrame(rows_longtau, ["doc_id", "text"])
    got_lt = {
        (r.id_a, r.id_b)
        for r in jaccard_join(
            df_lt, text_col="text", id_col="doc_id",
            threshold=0.3333333, shingle_k=1,
        ).collect()
    }
    assert got_lt == brute(rows_longtau, Fraction(3333333, 10**7))
    assert (1, 2) in got_lt

    # second awkward τ: 0.15 (0.15·20 = 3.0000000000000004); J exactly 3/20
    rows2 = [
        (1, " ".join([f"c{i}" for i in range(3)] + [f"d{i}" for i in range(8)])),
        (2, " ".join([f"c{i}" for i in range(3)] + [f"e{i}" for i in range(9)])),
        (3, " ".join(f"f{i}" for i in range(20))),
        (4, " ".join([f"f{i}" for i in range(3)] + [f"g{i}" for i in range(17)])),
    ]
    df2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    got2 = {
        (r.id_a, r.id_b)
        for r in jaccard_join(
            df2, text_col="text", id_col="doc_id", threshold=0.15, shingle_k=1
        ).collect()
    }
    assert got2 == brute(rows2, Fraction(15, 100))
