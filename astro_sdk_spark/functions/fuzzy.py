"""Exact edit-distance similarity join (fuzzy string matching at scale).

The record-linkage workhorse: find all pairs of strings within Levenshtein
distance ``d``. All-pairs is quadratic; the scale path is the q-gram
prefix filter (Gravano et al., VLDB'01; prefix filtering as in Xiao et
al.'s ED-Join, VLDB'08 — both public):

- pad each string and take its ``q``-grams (``n = len + q − 1`` of them);
  one edit operation disturbs at most ``q`` grams, so two strings within
  distance ``d`` share at least ``t = max(n_a, n_b) − q·d`` grams;
- order all grams by GLOBAL frequency (rare first). If two multisets
  overlap in ≥ t elements, their ``(n − t + 1)``-prefixes under any
  consistent total order must intersect — and ``n − t + 1 ≤ q·d + 1``, so
  each string contributes only its ``q·d + 1`` RAREST grams to the join.
  Joining on rare grams is what makes this skew-proof: a boilerplate
  substring may occur a billion times, but it is nobody's prefix gram;
- candidate pairs verify with the built-in ``levenshtein`` (JVM codegen).
  The result EQUALS the cross-join predicate's — which is what lets
  ``q_fuzzy_join`` sit under a DuckDB cross-join oracle.

Strings too short to carry the filter (``n ≤ q·d`` ⇔ ``len ≤ q·d−q+1``;
single characters at the default q=3, d=1) pair through a small cross
join against the ≤ ``short_len + d`` length band (any partner of a short
string is itself nearly short, by the length filter) — a bucket bounded
by the alphabet, not the corpus.

Plan shape: one gram-frequency aggregation, one per-string top-(qd+1)
window, one prefix-gram equi-join, one verify join — no all-pairs stage,
no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["edit_distance_join"]

_PAD = "\x01"  # padding char; assumed absent from real text


def _grams(col, q: int):
    """Padded q-grams of a string column (multiset, as an array)."""
    padded = F.concat(F.lit(_PAD * (q - 1)), col, F.lit(_PAD * (q - 1)))
    n = F.length(padded) - F.lit(q - 1)
    return F.transform(F.sequence(F.lit(1), n), lambda i: padded.substr(i, F.lit(q)))


def edit_distance_join(
    df_a: DataFrame,
    df_b: DataFrame | None = None,
    text_col: str = "name",
    id_col: str = "id",
    max_dist: int = 1,
    q: int = 3,
) -> DataFrame:
    """All (id_a, id_b, dist) pairs with ``levenshtein(a, b) ≤ max_dist``.

    ``df_b=None`` → self-join over ``df_a`` (emitting id_a < id_b once
    per pair). Both inputs use ``id_col``/``text_col`` (rename upstream
    for heterogeneous schemas). Nulls never match (SQL semantics)."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    self_join = df_b is None
    prefix_k = q * max_dist + 1
    short_len = q * max_dist - q + 1  # n = len+q−1 ≤ q·d  ⇔  len ≤ this

    a = df_a.select(
        F.col(id_col).alias("_ida"), F.col(text_col).alias("_ta")
    ).filter(F.col("_ta").isNotNull()).withColumn("_la", F.length("_ta"))
    b = (
        a.select(
            F.col("_ida").alias("_idb"),
            F.col("_ta").alias("_tb"),
            F.col("_la").alias("_lb"),
        )
        if self_join
        else df_b.select(
            F.col(id_col).alias("_idb"), F.col(text_col).alias("_tb")
        ).filter(F.col("_tb").isNotNull()).withColumn("_lb", F.length("_tb"))
    )
    pair_guard = (
        (F.col("_ida") < F.col("_idb")) if self_join else (F.lit(True))
    )

    # ---- prefix-gram candidate generation (strings above the floor) ----
    # occurrence-numbered grams ((gram, k) for the k-th repeat) turn the
    # multiset-overlap bound into plain set overlap, which is what the
    # prefix theorem is stated for — and incidentally split a repeated
    # gram's join key, trimming fanout
    def exploded(df, idc, tc):
        wocc = Window.partitionBy(idc, "_g").orderBy("_pos")
        return (
            df.filter(F.length(tc) > short_len)
            .select(idc, F.posexplode(_grams(F.col(tc), q)).alias("_pos", "_g"))
            .withColumn("_k", F.row_number().over(wocc))
            .select(idc, "_g", "_k")
        )

    ga = exploded(a, "_ida", "_ta")
    # one consistent global order serves both sides: frequency from side A
    # (ties → gram, then occurrence); grams unseen in A rank rarest at 0 —
    # still one total order
    freq = ga.groupBy("_g").agg(F.count(F.lit(1)).alias("_f"))

    def prefixes(grams, idc):
        w = Window.partitionBy(idc).orderBy(F.asc("_f"), F.asc("_g"), F.asc("_k"))
        return (
            grams.join(freq, "_g", "left")
            .withColumn("_f", F.coalesce("_f", F.lit(0)))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= prefix_k)
            .select(idc, "_g", "_k")
        )

    # Spark does not reuse aliased self-join branches (see the LSH notes
    # in README): without persisting, the self-join's pa ⋈ pb would run
    # the explode + freq join + prefix window TWICE. track() registers
    # the persist with the release registry (bench/stream loops drain it).
    from astro_sdk_spark.functions._cache import track

    pa = track(prefixes(ga, "_ida"))
    if self_join:
        pb = pa.select(F.col("_ida").alias("_idb"), "_g", "_k")
    else:
        pb = prefixes(exploded(b, "_idb", "_tb"), "_idb")

    cand = (
        pa.join(pb, ["_g", "_k"]).filter(pair_guard).select("_ida", "_idb").distinct()
    )
    verified = (
        cand.join(a, "_ida")
        .join(b, "_idb")
        .filter(F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        .withColumn("_dist", F.levenshtein("_ta", "_tb"))
        .filter(F.col("_dist") <= max_dist)
    )

    # ---- short-string bucket --------------------------------------------
    # any pair with a side at/below the floor has BOTH sides within
    # short_len + d (length filter), so the whole class is a cross join
    # of two alphabet-bounded slivers; pairs with both sides ABOVE the
    # floor are excluded here — the prefix path owns them
    sa = a.filter(F.col("_la") <= short_len + max_dist)
    sb = b.filter(F.col("_lb") <= short_len + max_dist)
    shorts = (
        sa.crossJoin(sb)
        .filter(pair_guard)
        .filter(
            (F.least("_la", "_lb") <= short_len)
            & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        )
        .withColumn("_dist", F.levenshtein("_ta", "_tb"))
        .filter(F.col("_dist") <= max_dist)
    )

    out = verified.select("_ida", "_idb", "_dist").unionByName(
        shorts.select("_ida", "_idb", "_dist")
    )
    return out.dropDuplicates(["_ida", "_idb"]).select(
        F.col("_ida").alias("id_a"),
        F.col("_idb").alias("id_b"),
        F.col("_dist").alias("dist"),
    )
