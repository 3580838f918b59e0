"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
near-dup.

No reference counterpart (extensions mandated alongside SURVEY §2). All
signature computation is built-in expressions (shingles via ``slice``/
``transform``, hashing via ``xxhash64``) — JVM-side, codegen, no Python UDF.

Scale design:
- exact dedup = groupBy(hash) keeping min id — one shuffle on a uniform key;
- MinHash LSH: per-band bucket join, so candidate pairs ~ O(n · collisions)
  instead of O(n²); the band/bucket shuffle key is uniform by construction;
- verification joins re-fetch only candidate pair texts (semi-join pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from astro_sdk_spark.functions._cache import track
from astro_sdk_spark.functions._plan import nd_guard as _ndg


def _spread_by_id(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition by the doc id BEFORE per-document heavy expressions
    (shingling, hashing).

    Two wins: (1) a documents table often arrives as few large files, so
    the expensive per-row work would otherwise run on a handful of tasks —
    this spreads it across the cluster; (2) the hash partitioning on the id
    column is exactly what the downstream groupBy(id) requires, so Catalyst
    inserts NO second exchange — the only thing shuffled is the raw
    (id, text) pair, once, before any expression work."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    return df.repartition(n, F.col(id_col))


def exact_dedup(
    df: DataFrame, text_col: str | list[str] = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per exact text; returns
    (doc_id, n_copies) — the kept id and its duplicate count.

    ``text_col`` may be a list for composite-key dedup (e.g. dedup on
    ``["url", "text"]`` so same text from different sources survives):
    one hash shuffle on the key tuple either way."""
    keys = [text_col] if isinstance(text_col, str) else list(text_col)
    return (
        df.groupBy(*keys)
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "n_copies")
    )


def shingles_col(text, k: int = 3, distinct: bool = True):
    """Word k-shingles of a text column, as ONE regex pass (distinct set
    by default).

    Overlapping n-grams are extracted with a zero-width lookahead —
    ``(?=(?:^| )(tok(?: tok){k-1}))`` over the whitespace-normalized
    lowercased text — so the whole shingle set comes out of a single
    ``regexp_extract_all`` that stays inside whole-stage codegen.

    This replaces the obvious higher-order form
    (``transform(sequence(...), i -> concat_ws(' ', slice(toks, i, k)))``):
    Spark evaluates lambda functions interpreted (no codegen) AND
    re-evaluates the captured ``split(...)`` subtree on every lambda call,
    which made shingling ~12× slower at sf0.1 (6.6s → 0.56s for k=2 on the
    5 000-doc corpus). Texts with fewer than k tokens fall back to a single
    whole-text shingle, matching the previous semantics.

    ``distinct=False`` keeps the raw overlapping multiset (every
    occurrence, in order) — required by repetition metrics; the default
    set semantics are what MinHash/Jaccard need."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    pat = "(?=(?:^| )([^ ]+" + "(?: [^ ]+)" * (k - 1) + "))"
    arr = F.regexp_extract_all(norm, F.lit(pat), 1)
    if distinct:
        arr = F.array_distinct(arr)
    return F.when(F.size(arr) > 0, arr).otherwise(F.array(norm))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, minhash array<long>): h_i(doc) = min over shingles of a seeded
    64-bit hash of the shingle.

    Vectorized shape: explode shingles ONCE, hash each shingle string ONCE
    (xxhash64 over the text), then derive the ``num_hashes`` seeded hashes
    from the 8-byte hash (xxhash64(h, i) — 16 bytes in, not the whole
    string) inside a single grouped aggregation with ``num_hashes`` min
    slots. One shuffle on the doc id, map-side partial aggregation, all
    whole-stage codegen. (The naive per-row form — N × array_min(transform)
    lambdas over the shingle array — recomputes the shingle array N times
    because Catalyst does not CSE subexpressions across lambda boundaries;
    measured ~10× slower at sf0.1.)
    """
    exploded = _spread_by_id(df, id_col).select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), shingle_k)).alias("_sh")
    ).select(F.col(id_col), F.xxhash64("_sh").alias("_h"))
    mins = exploded.groupBy(id_col).agg(
        *[F.min(F.xxhash64("_h", F.lit(i))).alias(f"_m{i}") for i in range(num_hashes)]
    )
    return mins.select(
        F.col(id_col), F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("minhash")
    )


def _bucket_pairs(grouped: DataFrame, bucket_cap: int | None) -> DataFrame:
    """Expand per-bucket member lists (column ``_ms``, array<struct>) into
    ordered candidate pairs (_a, _b struct columns), one row per pair.

    This is the skew-safe alternative to a bucket self-join: the expensive
    upstream (signatures) is referenced ONCE — a self-join would evaluate
    the whole signature subtree on both sides, because Spark only reuses
    exchanges for byte-identical subplans, which aliased join branches are
    not. Buckets above ``bucket_cap`` are dropped before pair expansion, so
    the worst case per bucket is cap²/2 pairs (a duplicate-heavy corpus
    otherwise makes this quadratic — pre-dedup exact copies first)."""
    sized = grouped.filter(F.size("_ms") > 1)
    if bucket_cap is not None:
        sized = sized.filter(F.size("_ms") <= bucket_cap)
    ms = F.array_sort("_ms")
    pairs = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + F.lit(2), F.size(ms) - i - 1),
                lambda y: F.struct(x.alias("_a"), y.alias("_b")),
            ),
        )
    )
    return sized.select(F.explode(pairs).alias("_p")).select("_p._a", "_p._b")


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Banded LSH over minhash signatures → candidate near-dup pairs
    (id_a < id_b). Pairs sharing ≥1 band bucket survive. ``bucket_cap``
    drops degenerate mega-buckets (see _bucket_pairs)."""
    rows_per_band = num_hashes // bands
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("minhash", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        ),
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    grouped = banded.groupBy("band", "bucket").agg(
        F.collect_list(F.struct(F.col(id_col).alias("_id"))).alias("_ms")
    )
    return (
        _bucket_pairs(grouped, bucket_cap)
        .select(F.col("_a._id").alias("id_a"), F.col("_b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B| via
    array_intersect/array_union (verification pass after LSH).

    Shingles are computed ONLY for documents that appear in a candidate
    pair: the ids on each side of ``pairs`` are collected into a semi-join
    prune of ``df`` before the (expensive) shingling expression runs.
    Candidates are a vanishing fraction of the corpus, so this turns a
    2×full-corpus shingle pass into a 2×|candidates| one.

    ``pairs`` is persisted first: the verify plan references it three times
    (the join spine + both sides of the id-prune union), and Spark would
    otherwise re-evaluate the whole LSH subtree for each reference. The
    candidate set is small by construction (post-LSH, bucket-capped), so
    memory cost is negligible at any scale; long-running callers release it
    via ``_cache.release_intermediates()`` after consuming the result."""
    pairs = track(pairs)
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .dropDuplicates([id_col])
    )
    pruned = df.join(cand_ids, on=id_col, how="left_semi")
    sh = pruned.select(F.col(id_col), shingles_col(F.col(text_col), shingle_k).alias("_sh"))
    # _ndg keeps the caller's `jaccard >= threshold` filter OUT of
    # the verify join's condition (where the intersect/union would
    # evaluate interpreted per matched row — see _plan.py)
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sa"), on="id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_sb"), on="id_b")
        .select(
            "id_a",
            "id_b",
            _ndg(
                F.size(F.array_intersect("_sa", "_sb"))
                / F.size(F.array_union("_sa", "_sb"))
            ).alias("jaccard"),
        )
    )
    return out


def minhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    shingle_k: int = 3,
    bucket_cap: int | None = 500,
    pre_dedup: bool = False,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Full near-dup pipeline: minhash → banded LSH → exact Jaccard verify.
    Returns (id_a, id_b, jaccard) pairs above threshold.

    100 TB shape: ``pre_dedup=True`` collapses exact-duplicate texts to one
    representative (min id) before LSH — web-crawl corpora are dominated by
    exact dups, which otherwise all land in the same buckets in every band
    and blow up the candidate self-join quadratically. Combine with
    ``exact_dedup`` output to recover the identical groups. ``bucket_cap``
    bounds whatever skew remains.

    ``sigs`` — a precomputed ``(id_col, minhash)`` frame from
    :func:`minhash_signatures` with the same ``num_hashes``/``shingle_k``
    (the ``incremental_near_dup`` contract): signature computation is the
    dominant shared prefix of every dedup pipeline, so a caller running
    several passes over one corpus computes it once and hands it to each.
    Must describe exactly the documents in ``df`` (after ``pre_dedup``,
    if set — combining both is the caller's responsibility)."""
    if pre_dedup:
        reps = df.groupBy(text_col).agg(F.min(id_col).alias(id_col))
        df = reps.select(id_col, text_col)
    if sigs is None:
        sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    cands = minhash_lsh_candidates(sigs, id_col, num_hashes, bands, bucket_cap)
    return jaccard_pairs(df, cands, text_col, id_col, shingle_k).filter(
        F.col("jaccard") >= threshold
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash): SimHash over word shingles.

    Implemented as explode → hash once per shingle → ONE vectorized
    hash-aggregate with per-bit vote sums (Σ of bit ? 1 : -1), then the
    bits are packed. Single shuffle on the doc id; per-bit work stays inside
    whole-stage codegen. (A per-row 64×aggregate-over-array expression is
    ~100× slower — Catalyst does not CSE the shingle array across lambdas.)

    ``hash_fn``: ``xxhash64`` (64-bit, fastest — the production path) or
    ``md5`` (60 bits from the first 15 hex digits of md5 — slower, but
    computable identically in other engines, which is what lets the DuckDB
    correctness oracle replicate the signature bit-for-bit).
    """
    if hash_fn == "xxhash64":
        n_bits, hashed_col = 64, F.xxhash64("_sh")
    elif hash_fn == "md5":
        n_bits = 60
        hashed_col = F.conv(F.substring(F.md5("_sh"), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    exploded = _spread_by_id(df, id_col).select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), shingle_k)).alias("_sh")
    ).select(F.col(id_col), hashed_col.alias("_h"))
    votes = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_v{i}")
            for i in range(n_bits)
        ]
    )
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        # shiftleft instead of a lit(1 << i): 1 << 63 overflows a JVM long
        bit = F.shiftleft(F.lit(1).cast("long"), i)
        out = out + F.when(F.col(f"_v{i}") > 0, bit).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(id_col), out.alias("simhash"))


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_k: int = 2,
    bucket_cap: int | None = 500,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup: block on 4 x 16-bit sub-keys (any pair within
    hamming distance 3 must agree exactly on ≥1 of 4 blocks — pigeonhole),
    verify candidates with exact popcount. For ``max_hamming`` > 3 the
    4-block scheme is a high-recall heuristic, not exhaustive (exhaustive
    needs max_hamming+1 blocks). ``bucket_cap`` drops degenerate blocks
    (see _bucket_pairs)."""
    hashed = simhash_signatures(df, text_col, id_col, shingle_k, hash_fn)
    blocked = hashed.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).cast("long")
                    for b in range(4)
                ]
            )
        ).alias("block", "key"),
    )
    grouped = blocked.groupBy("block", "key").agg(
        F.collect_list(
            F.struct(F.col(id_col).alias("_id"), F.col("simhash").alias("_h"))
        ).alias("_ms")
    )
    cands = (
        _bucket_pairs(grouped, bucket_cap)
        .select(
            F.col("_a._id").alias("id_a"),
            F.col("_b._id").alias("id_b"),
            F.col("_a._h").alias("h_a"),
            F.col("_b._h").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    xor = F.col("h_a").bitwiseXOR(F.col("h_b"))
    hamming = F.bit_count(xor)
    return cands.select("id_a", "id_b", _ndg(hamming).alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def incremental_near_dup(
    new_docs: DataFrame,
    corpus: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    shingle_k: int = 3,
    bucket_cap: int | None = 500,
    corpus_sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup of NEW documents against an EXISTING corpus (the
    production shape: each incoming batch is deduped against everything
    already accepted, not against itself).

    Returns (new_id, corpus_id, jaccard) pairs above threshold.

    ``corpus_sigs`` — a precomputed ``(id_col, minhash)`` frame from
    ``minhash_signatures`` (same num_hashes/shingle_k) — is the 100 TB
    deployment shape: store signatures alongside the corpus and reuse them
    across batches, so each batch pays O(|batch| + collisions) instead of
    re-shingling everything ever accepted. Modes:

    - ``corpus`` given, ``corpus_sigs`` None: signatures computed here,
      candidates verified with EXACT text Jaccard (self-contained form).
    - both given: stored signatures band the join (no corpus re-hash);
      exact text verify still reads only the candidate rows' text.
    - ``corpus_sigs`` only (``corpus=None``): the corpus text is NEVER
      read — candidate pairs are verified with the standard MinHash
      estimate (fraction of agreeing components, the estimator Spark ML's
      approxSimilarityJoin uses). ``jaccard`` is then an estimate with
      ±1/num_hashes granularity.

    Scale shape: banded bucket join NEW × CORPUS (not a self-join), so
    work is O(|new| · collisions), never O(|corpus|²); corpus-side
    mega-buckets are capped."""
    if corpus is None and corpus_sigs is None:
        raise ValueError("provide corpus text, corpus_sigs, or both")
    new_sigs = minhash_signatures(new_docs, text_col, id_col, num_hashes, shingle_k)
    if corpus_sigs is None:
        corpus_sigs = minhash_signatures(corpus, text_col, id_col, num_hashes, shingle_k)

    def banded(sigs: DataFrame, alias: str) -> DataFrame:
        rows_per_band = num_hashes // bands
        return sigs.select(
            F.col(id_col).alias(alias),
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice(
                                        "minhash", b * rows_per_band + 1, rows_per_band
                                    ),
                                    lambda x: x.cast("string"),
                                ),
                            ),
                            F.lit(b),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band", "bucket"),
        )

    nb = banded(new_sigs, "new_id")
    cb = banded(corpus_sigs, "corpus_id")
    if bucket_cap is not None:
        # Window count over (band, bucket) instead of a groupBy + anti-join:
        # the aggregate form evaluates the whole corpus-signature subtree
        # TWICE (once for the sizes, once for the join probe — Spark only
        # reuses exchanges for byte-identical subplans). The window needs a
        # single evaluation, and its partitioning key is exactly the
        # downstream join key, so the same exchange feeds both.
        w = Window.partitionBy("band", "bucket")
        cb = (
            cb.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= bucket_cap)
            .drop("_n")
        )
    pairs = track(
        nb.join(cb, on=["band", "bucket"])
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    if corpus is None:
        # signature-only verify: MinHash estimate over the candidate set
        # (tiny post-LSH, so the interpreted HOF lambda is off the hot path)
        est = F.aggregate(
            F.zip_with("_ma", "_mb", lambda a, b: (a == b).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ) / F.size("_ma")
        return (
            pairs.join(
                new_sigs.select(F.col(id_col).alias("new_id"), F.col("minhash").alias("_ma")),
                on="new_id",
            )
            .join(
                corpus_sigs.select(
                    F.col(id_col).alias("corpus_id"), F.col("minhash").alias("_mb")
                ),
                on="corpus_id",
            )
            .select("new_id", "corpus_id", _ndg(est).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )
    new_sh = new_docs.join(
        pairs.select(F.col("new_id").alias(id_col)).dropDuplicates([id_col]),
        on=id_col, how="left_semi",
    ).select(F.col(id_col).alias("new_id"), shingles_col(F.col(text_col), shingle_k).alias("_sa"))
    corpus_sh = corpus.join(
        pairs.select(F.col("corpus_id").alias(id_col)).dropDuplicates([id_col]),
        on=id_col, how="left_semi",
    ).select(F.col(id_col).alias("corpus_id"), shingles_col(F.col(text_col), shingle_k).alias("_sb"))
    return (
        pairs.join(new_sh, on="new_id")
        .join(corpus_sh, on="corpus_id")
        .select(
            "new_id",
            "corpus_id",
            _ndg(
                F.size(F.array_intersect("_sa", "_sb"))
                / F.size(F.array_union("_sa", "_sb"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "doc_id",
    out_cluster: str = "cluster_id",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id),
    where cluster_id is the smallest doc id in the component. This is the
    step that turns pairwise LSH matches into canonical-document groups
    (keep min id per cluster, drop the rest).

    Alternating large-star/small-star rounds (Kiveris, Lattanzi, Mirrokni,
    Rastogi & Vassilvitskii, "Connected Components in MapReduce and
    Beyond", SOCC'14, Algorithm 2) — the round count is O(log² n)
    guaranteed and ~log n in practice on EVERY graph shape, unlike plain
    min-label propagation whose round count is the component DIAMETER: a
    duplicated-document chain A ≈ B ≈ C ≈ … forces propagation through
    O(n) shuffles, while star-rounds contract such chains geometrically.
    Each round:

    - **large-star**: every node connects its LARGER neighbors to the
      minimum of its closed neighborhood — one groupBy(min) + one join,
      both map-side-combinable, edge count never grows;
    - **small-star**: every node connects its smaller neighbors (and
      itself) to their minimum — same shape over the (child > parent)
      oriented edges.

    Both transforms preserve components (Kiveris §3) and maintain the
    child > parent invariant, so the fixpoint is a star forest whose
    roots are the component minima — detected with one semi-join per
    round ("is any parent still a child?"), which doubles as the label
    extraction: children point at their root, roots label themselves.
    ``localCheckpoint`` truncates the growing lineage so round N's plan
    does not replay rounds 1..N-1. Only ids that appear in ``pairs`` are
    returned (singletons are their own implicit cluster). When ``stats``
    is supplied, ``stats["rounds"]`` records the executed round count
    (the convergence-proof hook used by the chain regression test)."""
    from astro_sdk_spark.functions._cache import checkpoint_rdd_ids, unpersist_rdd_ids

    spark_session = pairs.sparkSession

    # orient every pair (child=_a > parent=_b); drop self-pairs.
    # Checkpoint bookkeeping: each round's (eager) localCheckpoint
    # supersedes the previous round's — once the new blocks exist, the
    # old ones are provably dead, so drop them immediately instead of
    # waiting for driver GC. Without this, an N-round convergence leaves
    # N checkpoint block sets in executor storage, and a long-running
    # caller (benchmark loop, streaming ingest) accumulates eviction
    # pressure that shows up as multi-second noise in UNRELATED queries.
    # Ids come from the checkpointed DataFrame itself (checkpoint_rdd_ids)
    # — a global persistent-set diff would race with concurrent queries'
    # own checkpoints and unpersist them mid-use.
    sm = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("_a"),
            F.least(F.col(id_a), F.col(id_b)).alias("_b"),
        )
        .filter(F.col("_a") != F.col("_b"))
        .dropDuplicates(["_a", "_b"])
        .localCheckpoint()
    )
    _ckpt_ids = checkpoint_rdd_ids(sm)

    def _ends(edges):
        return edges.select(
            F.col("_a").alias("_n"), F.col("_b").alias("_nb"),
            F.lit(1).alias("_ch"), F.lit(0).alias("_pa"),
        ).unionByName(
            edges.select(
                F.col("_b").alias("_n"), F.col("_a").alias("_nb"),
                F.lit(0).alias("_ch"), F.lit(1).alias("_pa"),
            )
        )

    def _node_stats(ends):
        return ends.groupBy("_n").agg(
            F.min("_nb").alias("_mv"),
            F.sum("_ch").alias("_c"),
            F.sum("_pa").alias("_p"),
        )

    def _star_round(ends, stats_df):
        # ---- large-star: for each node u, connect larger neighbors to
        # min(closed neighborhood of u). Emitted edges (v, m) keep v > m.
        sym = ends.select(F.col("_n").alias("_u"), F.col("_nb").alias("_v"))
        lmin = stats_df.select(
            F.col("_n").alias("_u"), F.least("_n", "_mv").alias("_m")
        )
        ls = (
            sym.join(lmin, "_u")
            .filter(F.col("_v") > F.col("_u"))
            .select(F.col("_v").alias("_a"), F.col("_m").alias("_b"))
            .dropDuplicates(["_a", "_b"])
        )
        # ---- small-star: for each node u over its smaller neighbors N,
        # connect N ∪ {u} (minus the min itself) to min(N)
        smin = ls.groupBy("_a").agg(F.min("_b").alias("_m"))
        return (
            ls.join(smin, "_a")
            .filter(F.col("_b") != F.col("_m"))
            .select(F.col("_b").alias("_a"), F.col("_m").alias("_b"))
            .unionByName(smin.select("_a", F.col("_m").alias("_b")))
            .dropDuplicates(["_a", "_b"])
        )

    rounds = 0
    converged = False
    while True:
        # ONE aggregation per check serves BOTH control and transform:
        # per node it computes (child-degree, parent-degree, min
        # neighbor). The fixpoint test — the edge set is a star forest
        # iff no node is both a parent (_b) and a child (_a) AND no
        # child has two parents (small-star reducers for different u can
        # emit the same child with different minima mid-convergence, so
        # "no parent is a child" alone would declare victory one round
        # early and emit a duplicate, conflicting label) — reads the
        # degree columns; the large-star transform reads the min
        # column. The check short-circuits (limit-1 count: any non-star
        # node, found early on unconverged rounds); persisting the
        # aggregate lets the large-star join read whatever the check
        # already computed from cache instead of paying the endpoint
        # shuffle twice.
        ends = _ends(sm)
        node_stats = _node_stats(ends).persist()
        n_not_star = (
            node_stats.filter(
                (F.col("_c") > 1) | ((F.col("_c") > 0) & (F.col("_p") > 0))
            )
            .limit(1)
            .count()
        )
        if not n_not_star:
            node_stats.unpersist()
            converged = True
            break
        if rounds >= max_iter:
            node_stats.unpersist()
            break
        # exactly ONE star round per checkpoint: round N+1's transforms
        # reference their input several times (sym + stats, ls twice in
        # small-star), which is only cheap because the input is a
        # MATERIALIZED checkpoint — batching two rounds per checkpoint
        # re-executes round N's joins ~3× inside round N+1's lazy plan
        # and measures ~60% SLOWER at sf0.1 despite halving the driver
        # actions. Measured, not guessed; don't re-batch.
        nxt = _star_round(ends, node_stats)
        rounds += 1
        sm = nxt.localCheckpoint()  # eager: materializes before we drop prev
        _new_ids = checkpoint_rdd_ids(sm)
        unpersist_rdd_ids(spark_session, _ckpt_ids)
        _ckpt_ids = _new_ids
        node_stats.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    roots = (
        sm.select(F.col("_b").alias("_id"))
        .dropDuplicates(["_id"])
        .select("_id", F.col("_id").alias("_lbl"))
    )
    leaves = sm.select(F.col("_a").alias("_id"), F.col("_b").alias("_lbl"))
    labels = leaves.unionByName(roots)
    if not converged:
        # max_iter exhausted mid-convergence: a node can still be both a
        # root and a child, or a child of two parents — collapse to ONE
        # (minimum) label per node so the one-label-per-id contract holds
        # even for partial results. No-op cost when converged (skipped).
        labels = labels.groupBy("_id").agg(F.min("_lbl").alias("_lbl"))
    return labels.select(
        F.col("_id").alias(out_id), F.col("_lbl").alias(out_cluster)
    )


def dedup_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    shingle_k: int = 3,
    bucket_cap: int | None = 500,
    max_iter: int = 30,
) -> DataFrame:
    """End-to-end corpus dedup → canonical KEEP-list (one id column).

    The operator a training-data pipeline actually wants: given a raw
    corpus, return the ids to keep —

    1. exact dedup: one representative (min ``id_col``) per byte-identical
       ``text_col`` (web crawls are dominated by exact dups; collapsing
       them first also keeps LSH buckets from quadratic blow-up);
    2. MinHash+LSH near-dup pairs over the representatives
       (:func:`minhash_near_dup`);
    3. connected components over those pairs (:func:`near_dup_clusters`);
    4. keep the cluster minimum per component; every representative not in
       any near-dup pair is a singleton and kept as-is.

    Scale shape: one hash shuffle for exact groups, the capped banded LSH
    pipeline for pairs, O(log n) star-contraction rounds, and a final
    left-anti join against the (tiny — dup cluster members only) drop set,
    which AQE broadcasts. The representatives' minhash signatures are
    computed ONCE and persisted (id + num_hashes ints — the signature-store
    footprint, a vanishing fraction of corpus text): they feed the LSH
    candidate stage AND serve as the keep-list spine, so the final
    anti-join does not replay the exact-dedup shuffle a third time. To
    dedup a stream against this corpus incrementally, persist signatures
    and use :func:`incremental_near_dup` / ``streaming.ingest`` instead of
    re-running this batch operator.
    """
    reps = (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, text_col)
    )
    sigs = track(
        minhash_signatures(reps, text_col, id_col, num_hashes, shingle_k)
    )
    pairs = minhash_near_dup(
        reps,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        shingle_k=shingle_k,
        bucket_cap=bucket_cap,
        sigs=sigs,
    )
    clusters = near_dup_clusters(
        pairs, out_id="_nd_id", out_cluster="_nd_cluster", max_iter=max_iter
    )
    drops = clusters.filter(F.col("_nd_id") != F.col("_nd_cluster")).select(
        F.col("_nd_id").alias(id_col)
    )
    return sigs.select(id_col).join(drops, id_col, "left_anti")


def embedding_near_dup(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 12,
    bands: int = 4,
    seed: int = 42,
    bucket_cap: int | None = 500,
) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH banding: pairs
    with cosine ≥ threshold. ``dim`` is the embedding dimensionality — a
    caller-supplied constant (taking it from the data would run a driver-
    side job before planning)."""
    from astro_sdk_spark.functions.similarity import (
        banded_signatures,
        cosine_similarity_col,
    )

    banded = banded_signatures(df, dim, id_col, vec_col, bits, bands, seed)
    grouped = banded.groupBy("band", "sig").agg(
        F.collect_list(
            F.struct(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        ).alias("_ms")
    )
    cands = (
        _bucket_pairs(grouped, bucket_cap)
        .select(
            F.col("_a._id").alias("id_a"),
            F.col("_b._id").alias("id_b"),
            F.col("_a._v").alias("_va"),
            F.col("_b._v").alias("_vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # _ndg keeps the threshold test out of the candidate join's
    # condition (interpreted aggregate-HOF per matched row otherwise)
    return cands.select(
        "id_a",
        "id_b",
        _ndg(cosine_similarity_col(F.col("_va"), F.col("_vb"))).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def semantic_dedup(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "pairs",
    cluster_cap: int | None = 2000,
    round_digits: int = 4,
    count_capped: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): assign every embedding to its nearest centroid by
    cosine, then compare pairs ONLY within a cluster — the cluster step
    turns the corpus-quadratic similarity problem into a sum of small
    cluster-quadratic ones.

    ``mode='pairs'`` returns ``(id_a, id_b, cosine)`` for within-cluster
    pairs with rounded cosine >= ``threshold``; ``mode='keep'`` returns the
    deduplicated ``emb`` rows, dropping the HIGHER id of every such pair
    (deterministic min-id-wins, matching the text-dedup keep rule; for
    transitive closure feed the pairs through :func:`near_dup_clusters`).

    Scale shape: centroid assignment is the IVF build pass — one broadcast
    of the small centroid set, no shuffle (``similarity.py:ivf_topk``
    shares it). Pair generation shuffles members by cluster id once and
    self-joins co-partitioned, so cost is Σ|cluster|², governed by k (pick
    k ≈ N/target_cluster_size; SemDeDup uses k in the tens of thousands at
    100M-document scale). ``cluster_cap`` (default 2000, mirroring the LSH
    ``bucket_cap`` rationale) bounds adversarial mega-clusters: members
    beyond the cap (in id order) skip pairing — pass ``None`` to disable
    when the centroid set is known to partition the corpus evenly. The
    truncation is never silent: a warning is logged whenever a cap is in
    effect, and ``count_capped=True`` additionally runs a diagnostic job
    that logs HOW MANY clusters exceeded the cap (opt-in because it
    re-evaluates the assignment — default call cost is unchanged).
    ``centroids`` is caller-supplied
    (:func:`~astro_sdk_spark.functions.similarity.train_centroids`, a
    coreset, or a deterministic sample) so the operator stays deterministic
    and engine-checkable."""
    from astro_sdk_spark.functions.similarity import nearest_centroids

    if mode not in ("pairs", "keep"):
        raise ValueError(f"mode must be 'pairs' or 'keep', got {mode!r}")

    assigned = nearest_centroids(
        emb, centroids, id_col=id_col, vec_col=vec_col, n=1,
        cent_id_col=id_col, cent_vec_col=vec_col,
    )
    members = emb.select(id_col, vec_col).join(assigned, on=id_col)
    if cluster_cap is not None:
        import logging

        log = logging.getLogger(__name__)
        if count_capped:
            n_capped = (
                members.groupBy("cent_id")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > cluster_cap)
                .count()
            )
            log.warning(
                "semantic_dedup: %d cluster(s) exceed cluster_cap=%d; members "
                "beyond the cap (in %s order) are excluded from pairing",
                n_capped, cluster_cap, id_col,
            )
        else:
            log.info(
                "semantic_dedup: cluster_cap=%d in effect — clusters larger "
                "than the cap contribute only their first %d members (by %s); "
                "pass cluster_cap=None for exhaustive pairing or "
                "count_capped=True to count affected clusters",
                cluster_cap, cluster_cap, id_col,
            )
        cw = Window.partitionBy("cent_id").orderBy(id_col)
        members = (
            members.withColumn("_m", F.row_number().over(cw))
            .filter(F.col("_m") <= cluster_cap)
            .drop("_m")
        )
    # Precompute each member's L2 norm ONCE (|cluster| evaluations) instead
    # of inside every pair's cosine (|cluster|² × 2 array traversals) — the
    # pair stage then does a single dot product per pair. Same arithmetic,
    # same values: sqrt(ΣxΣ)·sqrt(Σy²) either way.
    from astro_sdk_spark.functions.similarity import _dot, _norm

    members = members.withColumn("_nrm", _norm(F.col(vec_col)))
    a = members.select(
        "cent_id",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col("_nrm").alias("_na"),
    )
    b = members.select(
        "cent_id",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_nrm").alias("_nb"),
    )
    pairs = (
        a.join(b, on="cent_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            _ndg(
                F.round(
                    _dot(F.col("_va"), F.col("_vb"))
                    / (F.col("_na") * F.col("_nb")),
                    round_digits,
                )
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    if mode == "pairs":
        return pairs
    drop = pairs.select(F.col("id_b").alias(id_col)).dropDuplicates([id_col])
    return emb.join(drop, on=id_col, how="left_anti")
