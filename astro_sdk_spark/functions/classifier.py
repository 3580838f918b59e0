"""Distributed text-quality classifier: hashed bag-of-n-gram logistic
regression, trained and applied entirely as DataFrame plans.

This is the fastText-style quality filter used to curate GPT-3/LLaMA-class
pre-training corpora (Brown et al. 2020, arXiv:2005.14165 Appendix A;
Touvron et al. 2023, arXiv:2302.13971 §2): a linear model over hashed
n-gram features separates a trusted corpus (label 1) from raw crawl
(label 0), and every candidate document is kept or dropped by its score.

No reference counterpart (extension mandated alongside SURVEY §2's
training-data-pipeline operators).

Scale shape (the whole point):
- features are word ``shingle_k``-grams hashed into ``n_buckets`` — the
  model is AT MOST ``n_buckets`` rows, broadcastable by construction, so
  scoring 100 TB is explode → broadcast join → one partial-aggregated
  groupBy(doc). No driver data path.
- training is full-batch gradient descent with a FIXED small number of
  iterations; each iteration is two shuffles of the exploded feature
  stream (groupBy doc for margins, groupBy bucket for the gradient) plus
  broadcast joins of the ≤``n_buckets``-row weight table. Cost is
  O(n_iters) linear passes — no per-row Python, no all-pairs stage.
- determinism at scale: every cross-row sum that feeds a decision is an
  INTEGER sum (weights and residuals live on a fixed-point micro-unit
  grid of ``1/scale``), so results are independent of partitioning and
  reduction order — the same property :func:`~astro_sdk_spark.functions.
  timeseries.gapfill`'s value_scale provides — and an external SQL engine
  replays training bit-for-bit (see queries.q_quality_classifier, which
  unrolls both GD iterations in DuckDB).

Update rule (per iteration, plain full-batch logistic regression):
    p_d   = sigmoid(margin_d)            margin_d = Σ_occurrences w[b]
    r_d   = p_d − y_d                    quantized: floor(r_d·scale + ½)
    g_b   = Σ_{(d,b) occurrences} r_d    exact integer in micro-units
    w[b] −= floor(lr · g_b / N + ½)      N = document count
Iteration 1 starts from w ≡ 0, so p_d = ½ exactly and the first gradient
is integer from the outset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from astro_sdk_spark.functions._cache import track
from astro_sdk_spark.functions.dedup import shingles_col

__all__ = ["train_text_classifier", "score_text_classifier", "calibrate_threshold"]


def _bucket(col: Column, n_buckets: int, hash_fn: str) -> Column:
    """Hash a feature string to [0, n_buckets): ``xxhash64`` (fastest,
    Spark-specific) or ``md5`` (the engine-portable 60-bit device shared
    with sampling.hash_bucket / dsir_weights, replicable in oracle SQL)."""
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(n_buckets))
    if hash_fn == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        )
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def _features(
    df: DataFrame, text_col: str, id_col: str,
    n_buckets: int, shingle_k: int, hash_fn: str,
) -> DataFrame:
    """Occurrence-multiset feature stream: one (id, bucket) row per n-gram
    occurrence. Deliberately NOT pre-aggregated to (id, bucket, count) —
    margins and gradients are occurrence sums, so the extra shuffle would
    buy nothing."""
    return df.select(
        F.col(id_col),
        F.explode(
            shingles_col(F.col(text_col), shingle_k, distinct=False)
        ).alias("_g"),
    ).select(F.col(id_col), _bucket(F.col("_g"), n_buckets, hash_fn).alias("_b"))


def train_text_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    shingle_k: int = 2,
    n_iters: int = 2,
    lr: float = 0.5,
    scale: int = 10**6,
    hash_fn: str = "md5",
) -> DataFrame:
    """Fit the hashed-n-gram logistic regression on ``df`` where
    ``label_col`` is 0/1 (1 = trusted/high-quality).

    Returns the weight table ``(_b bigint, w_int bigint, w double)`` with
    at most ``n_buckets`` rows; feed it to :func:`score_text_classifier`.
    ``w = w_int / scale`` — weights live on the micro-unit grid so that
    every margin is an exact integer sum (reduction-order-independent,
    hence reproducible on any cluster layout and replayable by an
    external SQL engine)."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    feats = track(_features(df, text_col, id_col, n_buckets, shingle_k, hash_fn).persist())
    labels = df.select(F.col(id_col), F.col(label_col).cast("bigint").alias("_y"))
    nrow = df.agg(F.count(F.lit(1)).alias("_n"))
    half = scale // 2

    weights: DataFrame | None = None
    for _ in range(n_iters):
        if weights is None:
            # w ≡ 0 → p = ½ exactly: residual is ±half in micro-units
            resid = labels.select(
                F.col(id_col), (F.lit(half) - F.col("_y") * F.lit(scale)).alias("_ri")
            )
        else:
            margins = (
                feats.join(F.broadcast(weights.select("_b", "w_int")), "_b")
                .groupBy(id_col)
                .agg(F.sum("w_int").alias("_mi"))
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_mi") / F.lit(float(scale)))))
            resid = margins.join(labels, id_col).select(
                F.col(id_col),
                F.floor((p - F.col("_y")) * F.lit(float(scale)) + F.lit(0.5)).alias("_ri"),
            )
        grad = (
            feats.join(resid, id_col)
            .groupBy("_b")
            .agg(F.sum("_ri").alias("_gi"))
        )
        delta = F.floor(
            F.lit(lr) * F.col("_gi") / F.col("_n") + F.lit(0.5)
        ).cast("bigint")
        stepped = grad.crossJoin(F.broadcast(nrow)).select(
            "_b", delta.alias("_delta")
        )
        if weights is None:
            weights = stepped.select("_b", (-F.col("_delta")).alias("w_int"))
        else:
            # gradients cover every bucket present in feats (every doc has
            # ≥1 shingle), which is exactly the weight support — but stay
            # full-join-safe against filtered/partial corpora
            weights = (
                weights.join(stepped, "_b", "full")
                .select(
                    "_b",
                    (
                        F.coalesce("w_int", F.lit(0))
                        - F.coalesce("_delta", F.lit(0))
                    ).alias("w_int"),
                )
            )
        weights = track(weights.persist())  # cut lineage growth per iteration

    return weights.select(
        "_b", "w_int", (F.col("w_int") / F.lit(float(scale))).alias("w")
    )


def score_text_classifier(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    shingle_k: int = 2,
    scale: int = 10**6,
    hash_fn: str = "md5",
    round_digits: int = 4,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document with a trained weight table: explode features,
    broadcast-join the ≤``n_buckets``-row model, one partial-aggregated
    groupBy(id). Returns ``(id, n_feats, score, keep)`` where ``score`` is
    the sigmoid of the exact integer margin, pinned to ``round_digits``
    with the engine-agnostic floor(x·10^d + ½) device (sigmoid is
    positive, so the pin is exact), and ``keep = score ≥ 0.5``."""
    feats = _features(df, text_col, id_col, n_buckets, shingle_k, hash_fn)
    model = weights.select("_b", "w_int")
    if broadcast_model:
        model = F.broadcast(model)
    agg = feats.join(model, "_b", "left").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_feats"),
        F.sum(F.coalesce("w_int", F.lit(0))).alias("_mi"),
    )
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_mi") / F.lit(float(scale)))))
    pin = 10 ** round_digits
    score = F.floor(sig * F.lit(float(pin)) + F.lit(0.5)) / F.lit(float(pin))
    return agg.select(
        F.col(id_col),
        "n_feats",
        score.alias("score"),
        (score >= F.lit(0.5)).alias("keep"),
    )


def calibrate_threshold(
    scores: DataFrame,
    keep_fraction: float,
    score_col: str = "score",
    relative_error: float = 0.001,
) -> float:
    """Score cutoff that keeps the top ``keep_fraction`` of documents —
    how the trained filter is actually deployed (LLaMA kept the
    pages its classifier scored most reference-like; Touvron et al.
    2023 §2). One ``percentile_approx`` aggregate — no global sort, the
    dsir_select quantile device — so calibration is a single scan at any
    corpus size. Returns the threshold; apply it as a scan-side filter
    (``scores.filter(F.col("score") >= thr)``)."""
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    row = scores.agg(
        F.percentile_approx(
            score_col, 1.0 - keep_fraction, int(1.0 / relative_error)
        ).alias("_thr")
    ).collect()[0]
    return float(row["_thr"])
