"""Deterministic sampling, dataset splitting, and sequence packing for
training-data pipelines.

A 100 TB corpus-prep job needs reproducible, cluster-order-independent
sampling: every decision here is a pure function of the row's key, never
of partition layout, RNG state, or row order. The primitive is a
**60-bit md5-derived bucket** — ``conv(substring(md5(key||salt),1,15),
16,10) % granularity`` — a pure projection (no shuffle, no UDF) that any
engine can reproduce bit-for-bit (DuckDB:
``CAST('0x'||substr(md5(k),1,15) AS BIGINT)``), so the oracle gate can
check these end-to-end.

Reference scope note: astro-sdk has no sampling/packing operators (its
pipelines stop at load/transform/export — ``sql/operators/transform.py``);
these extend the engine for LLM-corpus work per the project brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GRANULARITY = 10_000  # bucket space for rate decisions: 0.01% resolution


def hash_bucket(key: Column, salt: str = "", granularity: int = GRANULARITY) -> Column:
    """Deterministic bucket in [0, granularity) from a key column.

    md5 → first 15 hex chars → 60-bit int → mod. Engine-portable (see
    module docstring) and stable across partitioning, ordering, and
    cluster size — the property `df.sample()` does NOT have.
    """
    h = F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15), 16, 10)
    return h.cast("bigint") % granularity


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label ("train"/"val"/"test" by default)
    from a hash of its key — reproducible on any cluster, and stable under
    incremental appends (new rows never move old rows between splits,
    unlike ``randomSplit``). Pure projection: no shuffle, no action.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        cond = bucket < int(round(cum * GRANULARITY))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic, per-stratum fraction of rows (training-mixture
    reweighting: e.g. {"wiki": 1.0, "web": 0.25}). A row survives iff
    ``hash_bucket(key) < fraction*GRANULARITY`` for its stratum — one
    filter, no shuffle, reproducible. Strata absent from ``fractions``
    get ``default_fraction``.

    The small fractions map becomes a literal CASE expression — it rides
    whole-stage codegen; no broadcast join needed at any scale.
    """
    bucket = hash_bucket(F.col(key_col), salt)
    thr = None
    for stratum, frac in fractions.items():
        cond = F.col(stratum_col) == stratum
        lit = F.lit(int(round(frac * GRANULARITY)))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = (
        F.lit(int(round(default_fraction * GRANULARITY)))
        if thr is None
        else thr.otherwise(int(round(default_fraction * GRANULARITY)))
    )
    return df.filter(bucket < thr)


def concat_chunk_pack(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 1024,
    salt: str = "",
) -> DataFrame:
    """GPT-style concat-and-chunk packing: documents are laid on a virtual
    tape (ordered by key within a hash bucket) and the tape is cut every
    ``budget`` tokens; a document's ``pack_id`` is the chunk its first
    token lands in.

    Scale design: one window per bucket (``n_buckets`` independent tapes
    → no global sort, no single-partition window; each bucket's window is
    a partition-local sort after one hash shuffle). Deterministic — bucket
    and order are hash/key-derived — so it is oracle-checkable with the
    same window expression in any SQL engine. Output adds ``bucket``,
    ``pack_id`` (globally unique: bucket * 2^32 + chunk index), and
    ``pack_offset`` (token offset of the doc within its chunk) — enough
    for a shard writer to materialize fixed-width training rows.
    """
    bucket = hash_bucket(F.col(key_col), salt, n_buckets).alias("bucket")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("bucket", bucket)
        .withColumn("tape_end", F.sum(token_col).over(w))
        .withColumn("tape_start", F.col("tape_end") - F.col(token_col))
        .withColumn("chunk", (F.col("tape_start") / F.lit(budget)).cast("bigint"))
        .withColumn(
            "pack_id", F.col("bucket") * F.lit(2**32) + F.col("chunk")
        )
        .withColumn(
            "pack_offset", F.col("tape_start") - F.col("chunk") * F.lit(budget)
        )
        .drop("tape_end", "chunk")
    )
    return out


def pack_greedy(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Greedy first-fit packing (no document splitting): within each hash
    bucket, walk documents in key order and open a new pack whenever the
    current one would exceed ``budget``. Documents longer than ``budget``
    get a pack of their own.

    Sequential by nature, so it runs as an Arrow-batched
    ``applyInPandas`` per bucket — ``n_buckets`` independent groups keep
    every group small and the stage embarrassingly parallel; no state
    crosses buckets. Not expressible as a fixed-depth SQL window (the
    running total resets on overflow), hence the Pandas path; the pytest
    invariants (all docs kept, no pack over budget unless single-doc)
    stand in for the SQL oracle.
    """
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort").reset_index(drop=True)
        b = int(pdf["bucket"].iloc[0])
        pack_ids, cur, used = [], 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                cur += 1
                used = 0
            pack_ids.append(b * 2**32 + cur)
            used += t
        pdf["pack_id"] = pack_ids
        return pdf

    bucketed = df.withColumn("bucket", hash_bucket(F.col(key_col), salt, n_buckets))
    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in bucketed.schema.fields)
    return bucketed.groupBy("bucket").applyInPandas(pack, out_schema + ", pack_id long")


def domain_mix(
    df: DataFrame,
    rates: dict[str, float],
    domain_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-domain downsampling — the mixture-rebalancing
    pass of a pre-training pipeline (e.g. keep 100% of books, 30% of
    common-crawl): a row survives iff its hash bucket falls under its
    domain's keep-rate. Domains absent from ``rates`` use
    ``default_rate``.

    Pure projection (no shuffle, no RNG): decisions are
    ``hash_bucket(key, salt) < rate·granularity`` — reproducible across
    cluster sizes, stable under appends (a new document never flips an
    old one's decision), and engine-portable, so mixtures are auditable
    bit-for-bit. Rates compose with :func:`deterministic_split` under a
    different salt (the decisions are independent)."""
    for d, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {d!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    bucket = hash_bucket(F.col(key_col), salt)
    rate = F.lit(default_rate)
    for d, r in rates.items():
        rate = F.when(F.col(domain_col) == d, F.lit(r)).otherwise(rate)
    return df.filter(bucket < (rate * GRANULARITY).cast("bigint"))


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    shingle_k: int = 2,
    smoothing: float = 1.0,
    hash_fn: str = "xxhash64",
    round_digits: int | None = 4,
    broadcast_model: bool = True,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", arXiv:2302.03169): score every raw
    document by how target-domain-like it is, via hashed n-gram bag
    models.

    Per the paper: features are word ``shingle_k``-grams hashed into
    ``n_buckets``; two add-``smoothing`` unigram models over buckets are
    fit — p from ``target``, q from ``df`` (the raw corpus) — and each
    document's log importance weight is ``Σ_features ln p(b) − ln q(b)``.
    Select with :func:`dsir_select`.

    Scale shape: both models are ONE partial-aggregated groupBy(bucket)
    each (≤ ``n_buckets`` rows out — broadcastable by construction, hint
    controlled by ``broadcast_model``); scoring is explode → broadcast
    join → groupBy(id) sum. No all-pairs stage, no driver data path; the
    model table is the only state, so re-scoring a stream against a fixed
    target is one joined projection.

    ``hash_fn``: ``xxhash64`` (fastest, Spark-specific) or ``md5`` (the
    60-bit engine-portable device from :func:`hash_bucket`, replicable in
    an external SQL oracle). Returns ``(id, n_feats, logw)``."""
    from astro_sdk_spark.functions.dedup import shingles_col

    if hash_fn == "xxhash64":
        def bucket(col):
            return F.pmod(F.xxhash64(col), F.lit(n_buckets))
    elif hash_fn == "md5":
        def bucket(col):
            return F.pmod(
                F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint"),
                F.lit(n_buckets),
            )
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")

    def feats(frame):
        return frame.select(
            F.col(id_col),
            F.explode(
                shingles_col(F.col(text_col), shingle_k, distinct=False)
            ).alias("_g"),
        ).select(F.col(id_col), bucket(F.col("_g")).alias("_b"))

    raw_feats = feats(df)
    tgt_counts = feats(target).groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    raw_counts = raw_feats.groupBy("_b").agg(F.count(F.lit(1)).alias("_cq"))
    # FULL join: buckets seen only in the target still contribute to the
    # p-model normalizer _T (a left join would understate it whenever the
    # target has n-grams absent from raw, biasing every logw); they never
    # match a raw feature downstream, so they cost nothing in scoring
    model = (
        raw_counts.join(tgt_counts, "_b", "full")
        .select(
            "_b",
            F.coalesce("_ct", F.lit(0)).alias("_ct"),
            F.coalesce("_cq", F.lit(0)).alias("_cq"),
        )
    )
    # totals ride in as one-row broadcast aggregates (the tf_idf device)
    tot = model.agg(
        F.sum("_ct").alias("_T"), F.sum("_cq").alias("_Q")
    )
    s, b = float(smoothing), float(n_buckets)
    scored_model = model.crossJoin(F.broadcast(tot)).select(
        "_b",
        (
            F.log((F.col("_ct") + F.lit(s)) / (F.col("_T") + F.lit(s * b)))
            - F.log((F.col("_cq") + F.lit(s)) / (F.col("_Q") + F.lit(s * b)))
        ).alias("_lr"),
    )
    model_side = F.broadcast(scored_model) if broadcast_model else scored_model
    out = (
        raw_feats.join(model_side, "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("_lr").alias("_logw"),
        )
    )
    logw = F.round("_logw", round_digits) if round_digits is not None else F.col("_logw")
    return out.select(F.col(id_col), "n_feats", logw.alias("logw"))


def dsir_select(
    weights: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    logw_col: str = "logw",
    relative_error: float = 0.001,
    gumbel: bool = False,
    seed: int = 0,
) -> DataFrame:
    """Keep the most target-like ``fraction`` of documents given
    :func:`dsir_weights` output — threshold selection: the cutoff is the
    ``(1 − fraction)`` quantile of ``logw`` (``percentile_approx``, one
    aggregate — no global sort), then one filter. At 100 TB a global
    rank would funnel every weight through one partition; the quantile
    threshold keeps selection a scan + broadcast-scalar compare.

    ``gumbel=True`` runs the paper's actual sampling-without-replacement
    (Xie et al. §2: top-k of ``logw + Gumbel(0,1)`` ≡ sampling ∝ the
    importance weights): noise is hash-derived per id — uniform u from
    the 53-bit mantissa of ``xxhash64(id, seed)``, then −ln(−ln u) —
    so selection is deterministic and append-stable, no RNG state, and
    the same quantile-threshold plan applies to the noised key."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    key_col = logw_col
    if gumbel:
        # u ∈ (0,1): top 53 bits of the id-seeded hash, never exactly 0/1
        u = (
            F.shiftrightunsigned(F.xxhash64(F.col(id_col), F.lit(seed)), 11)
            .cast("double")
            / F.lit(float(1 << 53))
            + F.lit(2.0 ** -54)
        )
        weights = weights.withColumn("_gkey", F.col(logw_col) - F.log(-F.log(u)))
        key_col = "_gkey"
    thr = weights.agg(
        F.percentile_approx(key_col, 1.0 - fraction, int(1.0 / relative_error))
        .alias("_thr")
    )
    return (
        weights.crossJoin(F.broadcast(thr))
        .filter(F.col(key_col) >= F.col("_thr"))
        .drop("_thr", "_gkey")
    )


def unimax_rates(
    df: DataFrame,
    budget: float,
    lang_col: str = "lang",
    size_col: str | None = None,
    max_epochs: float = 4.0,
    round_digits: int = 4,
) -> DataFrame:
    """UniMax language-sampling allocation (Chung et al., "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining", ICLR 2023): split a total training ``budget`` across
    languages as evenly as possible, but never sample any language for
    more than ``max_epochs`` passes over its corpus.

    This is water-filling over per-language caps ``c_l = n_l ·
    max_epochs``: find the level ``t`` with ``Σ min(c_l, t) = budget``;
    low-resource languages are capped at ``c_l``, the rest all get ``t``.
    Implemented CLOSED-FORM with one ascending window scan (no driver
    loop): the fill level is the ``t_j = (budget − cum_{j−1}) / (n − j +
    1)`` of the FIRST row where ``t_j ≤ c_j``. If the whole corpus fits
    inside the budget, every language is fully used (data-limited case).

    ``size_col=None`` counts rows (documents); pass e.g. ``n_chars`` to
    budget in characters/tokens.

    Returns one row per language: ``(lang, corpus_size, cap, alloc,
    epochs)`` where ``alloc`` is the sampled quota and ``epochs = alloc /
    corpus_size`` (pinned with floor(x·10^d + ½) — engine-agnostic).

    Scale shape: the only corpus-sized work is one partial-aggregated
    groupBy(lang); everything after operates on the ≤|languages|-row
    table (a single-partition window over a tiny frame, then a one-row
    broadcast of the fill level). Apply the resulting per-language
    epochs with :func:`stratified_sample` / :func:`hash_bucket` —
    selection stays a scan-side decision."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    size_expr = F.count(F.lit(1)) if size_col is None else F.sum(size_col)
    sizes = df.groupBy(lang_col).agg(size_expr.cast("bigint").alias("corpus_size"))
    sized = sizes.select(
        F.col(lang_col),
        "corpus_size",
        (F.col("corpus_size") * F.lit(float(max_epochs))).alias("cap"),
    )
    w = Window.orderBy("cap", lang_col)
    wall = Window.orderBy("cap", lang_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    leveled = sized.select(
        "*",
        F.row_number().over(w).alias("_j"),
        (F.sum("cap").over(w) - F.col("cap")).alias("_cum_prev"),
        F.count(F.lit(1)).over(wall).alias("_nl"),
    ).select(
        "*",
        (
            (F.lit(float(budget)) - F.col("_cum_prev"))
            / (F.col("_nl") - F.col("_j") + 1)
        ).alias("_t"),
    )
    level = leveled.filter(F.col("_t") <= F.col("cap")).agg(
        F.min_by("_t", "_j").alias("_level")
    )
    pin = float(10**round_digits)
    alloc = F.least(F.col("cap"), F.coalesce(F.col("_level"), F.col("cap")))
    return (
        leveled.crossJoin(F.broadcast(level))
        .select(
            F.col(lang_col),
            "corpus_size",
            "cap",
            (F.floor(alloc * F.lit(pin) + F.lit(0.5)) / F.lit(pin)).alias("alloc"),
            (
                F.floor(alloc / F.col("corpus_size") * F.lit(pin) + F.lit(0.5))
                / F.lit(pin)
            ).alias("epochs"),
        )
    )


def weighted_sample_per_group(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "",
    hash_fn: str = "xxhash64",
    round_digits: int = 12,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k items per group
    (Efraimidis & Spirakis, "Weighted random sampling with a reservoir",
    IPL 2006): each row gets key ``u^(1/w)`` with ``u ~ Uniform(0,1)``;
    the k largest keys per group are a weighted sample without
    replacement — the distributed-reservoir standard (one pass, no
    global state).

    ``u`` is hash-derived from ``(id, salt)`` (the dsir_select Gumbel
    device: the 53-bit mantissa of xxhash64), so selection is
    DETERMINISTIC, append-stable, and replicable by an external SQL
    engine — rerunning on a grown corpus re-evaluates fairly without
    any RNG state. Rows with weight ≤ 0 are excluded (zero-weight items
    have zero selection probability; a log-domain key would NaN).

    Scale shape: one projection computes the keys, then ONE shuffle — a
    per-group window top-k (rank over descending key). No collect, no
    iteration; with ``group_col=None`` a single global reservoir (the
    one-partition window is the documented cost — use groups at scale).

    Returns the sampled rows with ``_wkey`` and ``sample_rank`` attached.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if hash_fn == "xxhash64":
        u = (
            F.shiftrightunsigned(
                F.xxhash64(F.col(id_col).cast("string"), F.lit(salt)), 11
            ).cast("double")
            / F.lit(float(1 << 53))
            + F.lit(2.0 ** -54)
        )
    elif hash_fn == "md5":
        # 52-bit md5 mantissa — the engine-portable device (classifier/
        # dsir bucketing), replicable in an external SQL oracle
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
                    1, 13,
                ),
                16, 10,
            ).cast("bigint").cast("double")
            / F.lit(float(1 << 52))
            + F.lit(1.0) / F.lit(float(1 << 53))
        )
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    w = F.col(weight_col).cast("double")
    pin = F.lit(float(10 ** round_digits))
    # floor-pin the key (positive) so libm pow ulp noise can never flip a
    # rank across engines; id tiebreak settles pinned ties
    keyed = df.filter(w > 0).withColumn(
        "_wkey", F.floor(F.pow(u, F.lit(1.0) / w) * pin + F.lit(0.5)) / pin
    )
    part = Window.partitionBy(group_col) if group_col else Window.partitionBy()
    win = part.orderBy(F.desc("_wkey"), F.asc(id_col))
    return (
        keyed.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    bucket_cap: int | None = 500,
    split_col: str = "split",
) -> DataFrame:
    """Train/holdout split with cross-boundary decontamination: after the
    deterministic hash split, any TRAIN document that is a near-duplicate
    (exact-verified Jaccard ≥ ``threshold``) of any holdout document is
    relabeled ``'dropped'`` — eliminating the self-inflicted
    train-test leakage that inflates held-out metrics (the within-corpus
    counterpart of benchmark :func:`~astro_sdk_spark.functions.cleaning.
    decontaminate`). Holdout documents are never dropped, so the
    evaluation set stays an unbiased deterministic sample.

    ``weights`` must contain ``'train'`` (default ``{'train': 0.9,
    'test': 0.1}``); every non-train split counts as holdout.

    Scale shape: membership is a pure hash projection
    (:func:`deterministic_split` — append-stable); the leak scan is
    :func:`~astro_sdk_spark.functions.dedup.incremental_near_dup`'s
    banded TRAIN×HOLDOUT bucket join (never a corpus self-join, bucket
    caps bound boilerplate skew), and the relabel is one left join
    against the (tiny) leaked-id set."""
    from astro_sdk_spark.functions.dedup import incremental_near_dup

    weights = weights or {"train": 0.9, "test": 0.1}
    if "train" not in weights:
        raise ValueError(f"weights must contain a 'train' split, got {list(weights)}")
    labeled = deterministic_split(df, id_col, weights, salt, split_col)
    train = labeled.filter(F.col(split_col) == "train")
    holdout = labeled.filter(F.col(split_col) != "train")
    leaks = (
        incremental_near_dup(
            train, holdout, text_col, id_col,
            num_hashes, bands, threshold, shingle_k, bucket_cap,
        )
        .select(F.col("new_id").alias(id_col))
        .dropDuplicates([id_col])
        .withColumn("_leak", F.lit(1))
    )
    return (
        labeled.join(leaks, id_col, "left")
        .withColumn(
            split_col,
            F.when(
                (F.col(split_col) == "train") & F.col("_leak").isNotNull(),
                "dropped",
            ).otherwise(F.col(split_col)),
        )
        .drop("_leak")
    )


def temperature_rates(
    df: DataFrame,
    budget: float,
    group_col: str = "lang",
    alpha: float = 0.5,
    size_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Temperature-based mixture sampling (the mT5/mBERT rule: sample
    probability ∝ n^α, Xue et al. 2021 §3.1): upweight low-resource
    groups relative to their corpus share. α=1 is proportional, α→0 is
    uniform; UniMax (:func:`unimax_rates`) replaces this heuristic with
    an explicit epoch cap — both are offered because the α-temperature
    rule is what most existing multilingual recipes specify.

    Returns ``(group, corpus_size, weight, rate, alloc)`` where
    ``weight = floor(n^α · 10^6)`` as an exact BIGINT, ``rate`` the
    pinned share, ``alloc = floor(budget·rate' + ½)`` samples.

    Determinism: weights are floored to integer micro-units so the total
    is an exact integer sum (order-independent); with the default
    ``alpha=0.5`` the power is IEEE ``sqrt`` — bit-identical in every
    engine — making the whole allocation hash-gate verifiable. Other
    alphas go through ``pow``, which may differ by 1 ulp between libm
    implementations (a ±1 difference in a single weight's last
    micro-unit); document accordingly if gating on them.

    Scale shape: one partial-aggregated groupBy over the corpus, then a
    one-row total broadcast onto the ≤|groups|-row table (the tf_idf
    normalizer device)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    size_expr = F.count(F.lit(1)) if size_col is None else F.sum(size_col)
    sizes = df.groupBy(group_col).agg(
        size_expr.cast("bigint").alias("corpus_size")
    )
    n = F.col("corpus_size").cast("double")
    powed = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(alpha))
    weights = sizes.select(
        group_col,
        "corpus_size",
        F.floor(powed * F.lit(1000000.0)).cast("bigint").alias("weight"),
    )
    tot = weights.agg(F.sum("weight").alias("_tot"))
    pin = F.lit(float(10**round_digits))
    share = F.col("weight").cast("double") / F.col("_tot")
    return weights.crossJoin(F.broadcast(tot)).select(
        group_col,
        "corpus_size",
        "weight",
        (F.floor(share * pin + F.lit(0.5)) / pin).alias("rate"),
        F.floor(F.lit(float(budget)) * share + F.lit(0.5))
        .cast("bigint")
        .alias("alloc"),
    )
