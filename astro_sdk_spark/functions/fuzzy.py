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

from astro_sdk_spark.functions._plan import nd_guard as _nd_guard

__all__ = ["edit_distance_join", "jaccard_join"]

_PAD = "\x01"  # padding char; assumed absent from real text


def _volume_partitions(
    df_a: DataFrame,
    df_b: DataFrame | None = None,
    est_bytes_per_partition: int = 8 * 1024 * 1024,
    cap: int = 4096,
) -> int | None:
    """Shuffle width for a set-similarity join's heavy exchanges,
    proportional to the INPUT's Catalyst size estimate
    (``optimizedPlan().stats().sizeInBytes()`` — file size for scans,
    propagated through joins/projections; driver-side analysis only, no
    job runs). A similarity join inflates its input ~30× in-flight: a
    gram per exploded row carrying id + frequency + rank through the
    per-doc prefix window, the prefix-gram join, and the pair-verify
    join. The session's small-query ``spark.sql.shuffle.partitions``
    under-splits exactly when the input is big: the per-task sort
    footprint crosses execution memory and the heavy stages spill.

    The constant is deliberately CONSERVATIVE — 8 MiB of estimated
    input ≈ 256 MiB in-flight per partition, comfortably inside one
    task's execution-memory share under the machine-proportional heap
    (session._default_driver_mem) — because over-widening has its own
    measured cliff: shuffle files fragment into maps × reducers
    segments, and a 764-wide explicit repartition of a 2–4 GiB stage
    turned this box's 30×-volume probe shuffle-WRITE-bound (all 32
    threads in DiskBlockObjectWriter), slower than the spill it
    replaced. Width is the remedy for exceeding memory, not a default.

    Returns ``None`` — leave every plan node untouched, byte-identical
    to the unscaled plan — when the session width already covers the
    volume or no finite estimate is available. Only ever WIDENS: a
    cluster session with a large ``spark.sql.shuffle.partitions`` keeps
    its own floor, and the cap (a local-mode bound on tiny-task
    overhead) never cuts below that floor.
    """
    est = _size_estimate(df_a, df_b)
    if est is None:
        return None
    base = int(df_a.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    need = -(-est // est_bytes_per_partition)
    if need <= base:
        return None
    return int(min(need, max(cap, base)))


def _size_estimate(df_a: DataFrame, df_b: DataFrame | None = None) -> int | None:
    """Catalyst input-size estimate in bytes (optimizedPlan stats —
    driver-side analysis only, no job runs); None when unavailable or
    the unknown-stats sentinel."""
    try:
        est = int(
            df_a._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if df_b is not None:
            est += int(
                df_b._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
    except Exception:  # noqa: BLE001 - estimation is best-effort
        return None
    if est <= 0 or est >= (1 << 60):  # Catalyst's unknown-stats sentinel
        return None
    return est


# Below this input estimate the integer-gram-id verify path costs more
# than it saves: the gid assignment adds two fixed stages (distinct-gram
# id mint + per-doc array rebuild) whose payoff is proportional to the
# candidate-pair volume. 8 MiB of input ≈ one _volume_partitions
# partition's worth ≈ a quarter-GiB in-flight — comfortably inside the
# measured regime where string-array intersects stay cold (the r12 gid
# change cost the sf0.1 x1 leg ~1.4 s it never earns back there).
_GID_MIN_EST_BYTES = 8 << 20


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
        # the candidate join below matches on a 64-bit gram hash instead
        # of the gram text (guide §2.3, narrower shuffle keys): equal
        # grams hash equal, so no candidate is lost; a hash collision can
        # only ADD a candidate pair, which the exact levenshtein verify
        # discards — results are unchanged while the candidate exchange
        # carries 8 bytes per gram instead of a string
        return (
            grams.join(freq, "_g", "left")
            .withColumn("_f", F.coalesce("_f", F.lit(0)))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= prefix_k)
            .select(idc, F.xxhash64("_g").alias("_h"), "_k")
        )

    # Spark does not reuse aliased self-join branches (see the LSH notes
    # in README): without persisting, the self-join's pa ⋈ pb would run
    # the explode + freq join + prefix window TWICE. track() registers
    # the persist with the release registry (bench/stream loops drain it).
    from astro_sdk_spark.functions._cache import track

    pa = track(prefixes(ga, "_ida"))
    if self_join:
        pb = pa.select(F.col("_ida").alias("_idb"), "_h", "_k")
    else:
        pb = prefixes(exploded(b, "_idb", "_tb"), "_idb")

    cand = (
        pa.join(pb, ["_h", "_k"]).filter(pair_guard).select("_ida", "_idb").distinct()
    )
    # the nondeterministic guard keeps the levenshtein verify OUT of the
    # join condition: Catalyst pushes a both-sides filter into the
    # sort-merge join, where the expression evaluates per matched row in
    # interpreted mode — referencing the guarded projection instead
    # keeps it a codegen'd filter on the same rows (see jaccard_join's
    # verify note for why rand()/unused-column barriers don't survive
    # the optimizer)
    verified = (
        cand.join(a, "_ida")
        .join(b, "_idb")
        .filter(F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        .withColumn("_dist", _nd_guard(F.levenshtein("_ta", "_tb")))
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
        .withColumn("_dist", _nd_guard(F.levenshtein("_ta", "_tb")))
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


def jaccard_join(
    df_a: DataFrame,
    df_b: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_k: int = 3,
    pre_dedup: bool = False,
    expand: bool = True,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity join: all (id_a, id_b, jaccard)
    pairs whose word-``shingle_k``-gram SETS satisfy
    ``|A∩B| / |A∪B| ≥ threshold`` — no hashing, no recall argument.

    MinHash+LSH (``dedup.minhash_near_dup``) approximates this predicate
    probabilistically; this is the exact counterpart for when the
    candidate volume allows it (record linkage, gold-set construction,
    auditing an LSH run's recall). The scale path is AllPairs/PPJoin
    prefix filtering (Bayardo et al., WWW'07; Xiao et al., VLDB'08 —
    public):

    - order every shingle by GLOBAL frequency (rare first, ties on the
      shingle then nothing — shingle sets are distinct, so (freq,
      shingle) is already a total order);
    - a set with ``n`` shingles contributes only its ``n − ⌈τ·n⌉ + 1``
      rarest to the join. Why that suffices: J(A,B) ≥ τ forces
      ``|A| ≥ τ·|B|`` (else inter ≤ |A| < τ|B| ≤ τ|A∪B|) and
      ``inter ≥ τ/(1+τ)·(|A|+|B|) ≥ ⌈τ·max(|A|,|B|)⌉``; by the prefix
      theorem two sets overlapping in ≥ t elements have intersecting
      ``(n − t + 1)``-prefixes under any consistent total order. Rare
      grams as prefixes are the skew shield: boilerplate shingles occur
      everywhere but are nobody's prefix;
    - candidates pass the size filter ``τ·|A| ≤ |B| ≤ |A|/τ`` inside the
      prefix join, then verify with JVM ``array_intersect`` on the two
      (semi-join-pruned) shingle arrays. inter/size arithmetic is pure
      integers, so the jaccard double is bit-identical in any engine —
      what lets ``q_jaccard_join`` sit under a brute-force DuckDB oracle
      as an equality, not a recall claim.

    Plan shape: one shingle explode, one frequency aggregation, one
    per-doc prefix window, one prefix equi-join, one verify join — never
    all-pairs. ``df_b=None`` → self-join emitting ``id_a < id_b``.

    ``pre_dedup=True`` (self-join only) is the dup-heavy-corpus scale
    path: byte-identical texts share ALL shingles, so a 5 000-copy flood
    puts 5 000 docs behind every prefix gram and the candidate join goes
    quadratic — exactly the hazard ``minhash_near_dup`` pre-collapses.
    Here the collapse costs NOTHING in exactness: the prefix join runs
    over one representative (min id) per distinct text, then the result
    expands back — intra-group pairs at jaccard 1.0, cross-group pairs
    inheriting the representatives' jaccard (equal texts ⇒ equal shingle
    sets) — reproducing the brute-force answer verbatim. Expansion is
    distributed (explode + equi-joins, never per-row arrays of pairs);
    its output size is the true answer's, which on a flooded corpus is
    itself quadratic — pass ``expand=False`` to stay at representative
    level (the form a 100 TB dedup pipeline actually consumes, as in
    ``dedup_corpus``).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if pre_dedup and df_b is not None:
        raise ValueError("pre_dedup is defined for the self-join form only")
    from fractions import Fraction

    from astro_sdk_spark.functions._cache import track
    from astro_sdk_spark.functions.dedup import shingles_col

    self_join = df_b is None

    # τ as an exact rational (its decimal repr — Fraction('0.07') = 7/100),
    # so the boundary predicates below are integer arithmetic. Double
    # arithmetic overshoots: 0.07·100 = 7.000000000000001 in binary, whose
    # ceil is 8 (one-short prefix) and which the size filter compares as
    # > 7 (boundary pair wrongly rejected). DECIMAL(38) products keep the
    # comparisons overflow-safe for any repr-length τ and corpus-sized n.
    tau = Fraction(str(threshold))

    # Volume-proportional width for the heavy exchanges, sized from the
    # RAW inputs (before the pre_dedup collapse — the explode/window/
    # prefix-join volume tracks the live corpus). None on small inputs:
    # every plan node below stays byte-identical to the unscaled plan,
    # so callers at interactive scale pay nothing. This lives in the
    # OPERATOR, not the caller's session conf: a user running a 30×
    # corpus with session defaults must not hit a spill cliff.
    n_parts = _volume_partitions(df_a, None if df_b is None else df_b)
    # The integer-gram-id verify (below) is the at-volume path; under
    # the estimate floor the small corpus verifies on its shingle-string
    # arrays directly — identical intersection COUNTS either way (the
    # gid map is a bijection), so results are byte-identical; only the
    # two gid stages are skipped. Unknown estimate → assume big (the
    # safe-at-scale default).
    est = _size_estimate(df_a, None if df_b is None else df_b)
    use_gid = est is None or est >= _GID_MIN_EST_BYTES

    def _widen(df, *cols):
        return df.repartition(n_parts, *cols) if n_parts else df

    def _dec(c):
        return c.cast("decimal(38,0)")

    def _prefix_rank_ok(rk_col, n_col):
        # keep ranks with rk ≤ n − ⌈num·n/den⌉ + 1 ⟺ ⌈num·n/den⌉ ≤ n − rk + 1
        # ⟺ num·n ≤ den·(n − rk + 1) — pure DECIMAL(38) cross-multiplication
        # (decimal DIVISION would round HALF_UP at scale 6 and overshoot the
        # ceil for thresholds with ≥7 decimal digits)
        return _dec(n_col) * F.lit(tau.numerator) <= _dec(
            n_col - rk_col + 1
        ) * F.lit(tau.denominator)

    members = None
    if pre_dedup:
        live = df_a.filter(F.col(text_col).isNotNull())
        reps = live.groupBy(text_col).agg(F.min(id_col).alias("_rep"))
        members = track(
            live.select(F.col(id_col).alias("_m"), text_col)
            .join(reps, text_col)
            .select("_m", "_rep")
        )
        df_a = reps.select(F.col("_rep").alias(id_col), text_col)

    def prep(df, suf):
        return df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias(f"_id{suf}"),
            shingles_col(F.col(text_col), shingle_k).alias(f"_s{suf}"),
        ).withColumn(f"_n{suf}", F.size(f"_s{suf}"))

    a = track(prep(df_a, "a"))
    b = (
        a.select(
            F.col("_ida").alias("_idb"),
            F.col("_sa").alias("_sb"),
            F.col("_na").alias("_nb"),
        )
        if self_join
        else track(prep(df_b, "b"))
    )
    pair_guard = (F.col("_ida") < F.col("_idb")) if self_join else F.lit(True)

    exploded_a = a.select("_ida", "_na", F.explode("_sa").alias("_g"))
    # one consistent global order serves both sides: frequency from side
    # A (the corpus side in an A×B join), unseen grams rank rarest at 0.
    # _widen(…, "_g") both sizes the aggregation's exchange AND satisfies
    # its distribution requirement — one exchange, volume-proportional.
    freq = _widen(exploded_a, "_g").groupBy("_g").agg(
        F.count(F.lit(1)).alias("_f")
    )

    def prefixes(df, idc, nc):
        ex = df.select(idc, nc, F.explode(f"_s{idc[-1]}").alias("_g"))
        w = Window.partitionBy(idc).orderBy(F.asc("_f"), F.asc("_g"))
        # the row_number window sorts every exploded gram within its doc
        # partition — the widest sort in the plan; _widen(…, idc) both
        # sizes it and satisfies the window's required distribution.
        # _rk (the gram's rank in the doc's full frequency-ordered set)
        # survives into the output: the candidate join's POSITIONAL
        # filter needs it.
        rkc = f"_rk{idc[-1]}"
        # candidates match on the gram's 64-bit hash, not its text
        # (guide §2.3, narrower shuffle keys): equal shingles hash
        # equal, so no candidate pair is lost; a collision only ADDS a
        # pair, which the exact gram-id array_intersect verify discards
        # — results unchanged, the persisted prefix exchange carries 8
        # bytes per shingle instead of the shingle string
        return (
            _widen(
                ex.join(freq, "_g", "left").withColumn(
                    "_f", F.coalesce("_f", F.lit(0))
                ),
                idc,
            )
            .withColumn(rkc, F.row_number().over(w))
            .filter(_prefix_rank_ok(F.col(rkc), F.col(nc)))
            .select(idc, nc, rkc, F.xxhash64("_g").alias("_h"))
        )

    # widened BY THE JOIN KEY before persist: the cached blocks are
    # already hash-distributed on _h, so the candidate sort-merge join
    # below (and its self-join mirror, which reuses this exchange) sorts
    # volume-proportional partitions instead of session-default ones
    pa = track(_widen(prefixes(a, "_ida", "_na"), "_h"))
    pb = (
        pa.select(
            F.col("_ida").alias("_idb"),
            F.col("_na").alias("_nb"),
            F.col("_rka").alias("_rkb"),
            "_h",
        )
        if self_join
        else _widen(prefixes(b, "_idb", "_nb"), "_h")
    )

    # PPJoin POSITIONAL filter (Xiao et al. §3.2): a shared prefix gram
    # at ranks (i, j) of the two frequency-ordered sets bounds the whole
    # intersection — every shared gram sorts ≥ it, so
    # ``inter ≤ 1 + min(|A|−i, |B|−j)``. The pair survives only if that
    # bound reaches the equivalent-overlap threshold
    # ``t = ⌈τ/(1+τ)·(|A|+|B|)⌉``. No false negatives: if truly
    # J ≥ τ, the FIRST shared gram's ranks are minimal, its bound is
    # ≥ the true intersection ≥ t, and that candidate row passes. The
    # win is on FALSE positives — a random pair meeting on one rare gram
    # deep in both prefixes bounds well under t and never reaches the
    # verify join (measured at 30× bench volume: 9.28 M → far fewer
    # array-carrying verify rows). Integer form: A ≥ ⌈p/q⌉ ⟺ A·q ≥ p,
    # all DECIMAL(38) cross-multiplication like the filters above.
    t_num = F.lit(tau.numerator)  # τ = num/den exactly
    t_den = F.lit(tau.denominator)
    # Pushdown barrier: ``_nag`` is |A| routed through a projection with
    # a nondeterministic no-op guard. Every filter below references it,
    # so Catalyst cannot push them past the projection INTO the
    # sort-merge join's condition — where they would evaluate per raw
    # gram-match row in interpreted mode (BigDecimal tree-walk, the
    # measured hot spot of the candidate stage at volume). Above the
    # barrier they run inside whole-stage codegen on the same rows.
    # Guard mechanics and why rand()/unused-column barriers fail:
    # functions/_plan.py. ``pair_guard`` stays in the join — one
    # primitive long compare.
    nag = F.col("_nag")
    ub = F.lit(1) + F.least(
        nag - F.col("_rka"), F.col("_nb") - F.col("_rkb")
    )
    cand = (
        pa.join(pb, "_h")
        .filter(pair_guard)
        .withColumn("_nag", _nd_guard(F.col("_na")))
        # rational size filter τ·|B| ≤ |A| ∧ τ·|A| ≤ |B|: num·n ≤ den·m in
        # exact integers — the double form wrongly rejected |B| = τ·|A|
        # boundary pairs when τ·n overshot in binary
        .filter(
            (_dec(F.col("_nb")) * F.lit(tau.numerator)
             <= _dec(nag) * F.lit(tau.denominator))
            & (_dec(nag) * F.lit(tau.numerator)
               <= _dec(F.col("_nb")) * F.lit(tau.denominator))
        )
        .filter(
            _dec(ub) * (t_den + t_num)
            >= t_num * _dec(nag + F.col("_nb"))
        )
        .select("_ida", "_idb")
        .transform(lambda d: _widen(d, "_ida", "_idb"))
        .distinct()
    )
    # ---- verify on INTEGER gram ids, not shingle strings -------------
    # ``array_intersect`` over array<string> is the measured hot loop at
    # volume: the interpreted eval builds a hash set of UTF8Strings per
    # candidate row (30× bench corpus: all 32 executor threads sampled
    # inside SQLOpenHashSet/UTF8String), and the pair-carrying
    # intermediate drags ~40 B per shingle through two shuffles. Map
    # each DISTINCT gram to a long id first — bijective, so the
    # intersection COUNT is unchanged and the result stays exact — and
    # intersect array<long> instead: primitive-specialized hashing, no
    # string allocation, ~5× slimmer verify rows. Ids are assigned
    # DISTRIBUTED (partition-id high bits | partition-local row_number —
    # deterministic: hash partitioning on _g fixes the partition, the
    # per-partition sort fixes the rank), never a single-partition
    # global window.
    if use_gid:
        universe = (
            freq.select("_g")
            if self_join
            else freq.select("_g").unionByName(
                b.select(F.explode("_sb").alias("_g"))
            ).distinct()
        )
        gid = universe.withColumn("_pid", F.spark_partition_id()).withColumn(
            "_gid",
            F.col("_pid").cast("long") * F.lit(1 << 40)
            + F.row_number().over(Window.partitionBy("_pid").orderBy("_g")),
        ).select("_g", "_gid")
        gid = track(_widen(gid, "_g"))

        def id_arrays(ex, idc):
            # rebuild each doc's gram set as array<long>; grouping on the
            # doc id reuses _widen's volume-proportional width
            return (
                _widen(ex.join(gid, "_g"), idc)
                .groupBy(idc)
                .agg(F.collect_list("_gid").alias(f"_v{idc[-1]}"))
            )

        va = id_arrays(exploded_a, "_ida")
        vb = (
            va.select(F.col("_ida").alias("_idb"), F.col("_va").alias("_vb"))
            if self_join
            else id_arrays(
                b.select("_idb", F.explode("_sb").alias("_g")), "_idb"
            )
        )
    else:
        # small-corpus fast path: the shingle arrays are already built in
        # prep(); intersect them directly
        va = a.select("_ida", F.col("_sa").alias("_va"))
        vb = (
            va.select(F.col("_ida").alias("_idb"), F.col("_va").alias("_vb"))
            if self_join
            else b.select("_idb", F.col("_sb").alias("_vb"))
        )
    # The nondeterministic no-op guard around the intersect is
    # LOAD-BEARING: the threshold filter below references both join
    # sides, so Catalyst would otherwise push it INTO the sort-merge
    # join as a join condition — where the expression tree (intersect +
    # DECIMAL casts) evaluates in interpreted mode, once in the
    # condition's each side and again in the project. Measured on 3.74 M
    # candidate pairs × 52-element arrays: 1.9 s as a codegen'd project,
    # minutes as a join condition. The always-true
    # ``monotonically_increasing_id() ≥ 0`` pins the intersect into THIS
    # projection (filters cannot cross a nondeterministic project);
    # rand()-based guards do NOT work — the optimizer folds their
    # always-true comparisons away (measured, see the candidate stage).
    verified = (
        cand.join(_widen(va, "_ida"), "_ida")
        .join(_widen(vb, "_idb"), "_idb")
        # |set| survives the bijection: _na == size(_va) by construction
        .withColumn("_na", F.size("_va"))
        .withColumn("_nb", F.size("_vb"))
        .withColumn(
            "_inter",
            _nd_guard(F.size(F.array_intersect("_va", "_vb"))),
        )
        .withColumn(
            "_j",
            F.col("_inter")
            / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
        )
        # exact verify: inter/union ≥ num/den ⟺ inter·den ≥ num·union —
        # integer arithmetic, so J-exactly-τ boundary pairs are kept for
        # ANY threshold, not just ones whose double happens to round down
        .filter(
            _dec(F.col("_inter")) * F.lit(tau.denominator)
            >= F.lit(tau.numerator)
            * _dec(F.col("_na") + F.col("_nb") - F.col("_inter"))
        )
    )
    out = verified.select(
        F.col("_ida").alias("id_a"),
        F.col("_idb").alias("id_b"),
        F.col("_j").alias("jaccard"),
    )
    if members is None or not expand:
        return out

    # ---- expansion back to member level (exactness restored) ----------
    # intra-group: every ordered pair inside an exact-dup group, j = 1.0.
    # Distributed as explode×2 + equi-join on the group key — the output
    # is the true answer's pair set, but no task ever holds a group's
    # quadratic pair array in memory.
    multi = members.groupBy("_rep").agg(F.count(F.lit(1)).alias("_gn")).filter(
        F.col("_gn") > 1
    )
    gm = members.join(multi.select("_rep"), "_rep")
    intra = (
        gm.select("_rep", F.col("_m").alias("_x"))
        .join(gm.select("_rep", F.col("_m").alias("_y")), "_rep")
        .filter(F.col("_x") < F.col("_y"))
        .select(
            F.col("_x").alias("id_a"),
            F.col("_y").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    # cross-group: a representative pair applies to every member combo
    # (identical text ⇒ identical shingle set ⇒ identical jaccard)
    cross = (
        out.join(
            members.select(F.col("_rep").alias("id_a"), F.col("_m").alias("_xa")),
            "id_a",
        )
        .join(
            members.select(F.col("_rep").alias("id_b"), F.col("_m").alias("_xb")),
            "id_b",
        )
        .select(
            F.least("_xa", "_xb").alias("id_a"),
            F.greatest("_xa", "_xb").alias("id_b"),
            "jaccard",
        )
    )
    return intra.unionByName(cross)
