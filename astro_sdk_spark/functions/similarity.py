"""Embedding similarity search — brute-force cosine top-k + LSH-bucketed ANN.

No reference counterpart (astro-sdk delegates all compute to the warehouse);
these are the LLM-data-pipeline extensions required alongside SURVEY §2.

Scale design:
- Cosine math uses Spark *higher-order functions* (``zip_with`` +
  ``aggregate``) — evaluated JVM-side inside whole-stage codegen, no Python
  in the hot path.
- ``cosine_topk`` broadcasts the (small) query set against the (huge)
  candidate set, so the only wide op is the final per-query top-k, done with
  a window over ``query_id`` — shuffle size = |queries| × |candidates kept|.
- ``lsh_bucket_join`` is the scale path: random-hyperplane signatures
  (SimHash for real vectors) computed JVM-side, candidates compared only
  within matching bands — turns O(Q×N) into O(Q×N/2^bits) per band.
- Hyperplanes travel as ONE broadcast array<array<array<double>>> column
  (a single-row crossJoin), not as per-plane literal expressions — at real
  dims (768·12·4 ≈ 37k literals) the literal form bloats the plan and
  serializes it to every task; the broadcast form is O(1) plan size.
- Banded signatures come from ONE scan with a posexplode over the per-band
  signature array — not a union of per-band scans.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from astro_sdk_spark.functions._cache import track


def _dot(a, b):
    # cast operands to double BEFORE multiplying: on array<float> columns
    # Spark would otherwise compute float32 products (then promote), a
    # ~1e-8 relative divergence from any all-double engine — enough to
    # flip a round(x, 4) boundary. With double products and this strict
    # left fold, the result is bit-identical to DuckDB's double math.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_col(a, b):
    """Cosine similarity between two array<float> columns — pure built-ins."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k: every query scored against every candidate.

    Returns (query_id, cand_id, cosine, rank). The query side is broadcast —
    keep it small (this is the exact baseline; use lsh_bucket_join at scale).
    Rank is deterministic: ties broken by candidate id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("_cvec")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id")).select(
        "query_id",
        "cand_id",
        cosine_similarity_col(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
    )
    if round_digits is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_digits))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def band_signature_col(vec_col, band_planes):
    """Signature of one band: bit i = sign(dot(v, band_planes[i])), packed
    into a long. ``band_planes`` is an array<array<double>> COLUMN (usually
    from a broadcast planes matrix), so the plan carries one reference, not
    bits×dim literals. 2.0**i is exact in double for i ≤ 62 (shiftleft
    needs a Python-int position, which a lambda index is not)."""
    bit_terms = F.transform(
        band_planes,
        lambda p, i: F.when(
            _dot(vec_col, p) >= 0,
            F.pow(F.lit(2.0), i.cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bit_terms, F.lit(0).cast("long"), lambda acc, v: acc + v)


def planes_matrix(spark, dim: int, bits: int, bands: int, seed: int = 42):
    """The hyperplane tensor as a one-row DataFrame: planes[band][bit][dim].
    CrossJoin+broadcast it onto the vector table (O(1) plan size)."""
    flat = random_hyperplanes(dim, bits * bands, seed)
    nested = [[flat[b * bits + i] for i in range(bits)] for b in range(bands)]
    return spark.createDataFrame(
        [(nested,)], "planes array<array<array<double>>>"
    )


def banded_signatures(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    bands: int = 4,
    seed: int = 42,
    use_arrow: bool = True,
) -> DataFrame:
    """(id, vec, band, sig) — one row per (vector, band), from a single scan:
    the per-band signature array is computed once per row and posexploded.

    Default path: hyperplane signatures are a dense matmul — batch_vectors
    (n×dim) @ planes.T (dim×bits·bands) → signs → bit-pack. That is BLAS
    territory, so it runs as an Arrow-batched pandas_udf over numpy (the
    one place Python beats Catalyst expressions: higher-order-function
    dot products are interpreted per element, the matmul is vectorized
    ~100×). Fallback (``use_arrow=False``): pure built-in HOF expressions,
    JVM-side, with the planes as one broadcast column — same results."""
    if use_arrow:
        try:
            import numpy as np
            import pandas as pd
        except ImportError:  # pragma: no cover - numpy ships with pyspark
            use_arrow = False
    if use_arrow:
        flat = random_hyperplanes(dim, bits * bands, seed)
        planes_t = np.array(flat, dtype=np.float64).T  # dim × (bits·bands)
        weights = np.array([1 << i for i in range(bits)], dtype=np.int64)
        n_bands = bands

        def _sigs_fn(v):
            if len(v) == 0:
                return pd.Series([], dtype=object)
            mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
            bitmat = (mat @ planes_t) >= 0  # n × bits·bands
            sigs = bitmat.reshape(len(mat), n_bands, -1).astype(np.int64) @ weights
            return pd.Series(list(sigs))

        # annotations set explicitly: `from __future__ import annotations`
        # stringifies inline hints, which pandas_udf cannot resolve
        _sigs_fn.__annotations__ = {"v": pd.Series, "return": pd.Series}
        sig_arr = F.pandas_udf(_sigs_fn, "array<long>")(F.col(vec_col))
    else:
        planes = planes_matrix(df.sparkSession, dim, bits, bands, seed)
        df = df.crossJoin(F.broadcast(planes))
        sig_arr = F.transform(
            F.col("planes"), lambda bp: band_signature_col(F.col(vec_col), bp)
        )
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(sig_arr).alias("band", "sig"),
    )


def lsh_bucket_join(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    bands: int = 4,
    k: int = 10,
    seed: int = 42,
    round_digits: int | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """ANN: compare query/candidate pairs only when they share an LSH bucket
    in at least one band, then exact-rescore the survivors. At 100 TB the
    bucket join shuffles on (band, signature) — uniformly distributed keys,
    no skew — instead of exploding the cross product. ``bucket_cap`` drops
    candidate-side mega-buckets (dense clusters of near-identical vectors)
    before the join."""
    qb = banded_signatures(queries, dim, id_col, vec_col, bits, bands, seed).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qvec"), "band", "sig"
    )
    cb = banded_signatures(candidates, dim, id_col, vec_col, bits, bands, seed).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("_cvec"), "band", "sig"
    )
    if bucket_cap is not None:
        w = Window.partitionBy("band", "sig")
        cb = (
            cb.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("_bsz") <= bucket_cap)
            .drop("_bsz")
        )
    pairs = (
        qb.join(cb, on=["band", "sig"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", "_qvec", "_cvec")
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = pairs.select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("cand_id"),
        cosine_similarity_col(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
    )
    if round_digits is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_digits))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def nearest_centroids(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int = 1,
    cent_id_col: str = "vec_id",
    cent_vec_col: str = "embedding",
    round_digits: int = 4,
    use_arrow: bool = True,
    _cents_rows: list | None = None,
) -> DataFrame:
    """``(id_col, cent_id)`` — each vector's ``n`` nearest centroids by
    cosine, rounded to ``round_digits`` before ranking, ties broken on
    ascending centroid id (the determinism contract every oracle here
    replicates).

    ``_cents_rows`` (private): the centroid rows, pre-collected by the
    caller as ``centroids.select(cent_id_col, cent_vec_col).collect()``
    — lets a caller that already needed the rows (e.g. the persisted
    index's geometry guard) skip this function's own collect job. Only
    honoured on the Arrow path; the broadcast-join fallback ignores it.

    This is THE inner loop of centroid-based indexing (IVF build +
    probe, SemDeDup clustering): dense matrix × small-matrix. Default
    path collects the centroid set to the driver (contractually small —
    same device as PQ codebooks) and runs an Arrow-batched numpy matmul
    per partition: one BLAS call replaces |df|·k interpreted
    higher-order-function cosines (~100× on dim-64 data). Fallback
    (``use_arrow=False`` or numpy absent): broadcast-join + HOF cosine,
    norms precomputed once per side rather than once per pair."""
    if use_arrow:
        try:
            import numpy as np
            import pandas as pd  # noqa: F401 - mapInPandas interface
        except ImportError:  # pragma: no cover - numpy ships with pyspark
            use_arrow = False
    if use_arrow:
        cents = sorted(
            _cents_rows
            if _cents_rows is not None
            else centroids.select(cent_id_col, cent_vec_col).collect(),
            key=lambda r: r[0],
        )
        cent_ids = np.array([r[0] for r in cents])
        cmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in cents])
        cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
        spark = df.sparkSession
        id_type = dict(df.dtypes)[id_col]
        cent_type = dict(centroids.dtypes)[cent_id_col]
        out_schema = f"{id_col} {id_type}, cent_id {cent_type}"
        b_cids = spark.sparkContext.broadcast(cent_ids)
        b_cmat = spark.sparkContext.broadcast(cmat)
        top_n = n

        def _assign(batches):
            cm = b_cmat.value
            cid = b_cids.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vm = np.stack(
                    [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
                )
                vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
                sims = np.round(vm @ cm.T, round_digits)
                # stable argsort of -sims: equal rounded cosines keep
                # ascending centroid order — exactly ORDER BY sim DESC, id
                order = np.argsort(-sims, axis=1, kind="stable")[:, :top_n]
                ids = pdf[id_col].to_numpy().repeat(order.shape[1])
                yield pd.DataFrame(
                    {id_col: ids, "cent_id": cid[order].ravel()}
                )

        return df.select(id_col, vec_col).mapInPandas(_assign, out_schema)
    cent = centroids.select(
        F.col(cent_id_col).alias("cent_id"),
        F.col(cent_vec_col).alias("_centvec"),
        _norm(F.col(cent_vec_col)).alias("_cnrm"),
    )
    scored = (
        df.select(id_col, vec_col)
        .withColumn("_vnrm", _norm(F.col(vec_col)))
        .crossJoin(F.broadcast(cent))
        .select(
            F.col(id_col),
            "cent_id",
            F.round(
                _dot(F.col(vec_col), F.col("_centvec"))
                / (F.col("_vnrm") * F.col("_cnrm")),
                round_digits,
            ).alias("_csim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cent_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .select(id_col, "cent_id")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    k: int = 10,
    round_digits: int | None = 4,
) -> DataFrame:
    """IVF-flat ANN: an inverted-file index with cosine assignment.

    - Every candidate is assigned to its nearest centroid (one broadcast
      of the small centroid set against the huge candidate table — no
      shuffle; at 100 TB this is the build pass you materialize once).
    - Each query probes its ``nprobe`` nearest centroids and exact-scores
      only the candidates in those lists: work drops from O(Q·N) to
      O(Q·N·nprobe/n_centroids) for balanced lists.
    - ``centroids`` is caller-supplied (id_col, vec_col) — k-means
      training, a coreset, or any deterministic sample; keeping selection
      outside makes the operator deterministic and engine-checkable.

    Ranking determinism: cosines are rounded before every rank and ties
    break on ids, so the result is reproducible across engines."""
    def _nearest(df: DataFrame, side_id: str, n: int) -> DataFrame:
        return nearest_centroids(
            df, centroids, id_col=side_id, vec_col=vec_col, n=n,
            cent_id_col=id_col, cent_vec_col=vec_col,
        )

    cand = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col))
    assigned = _nearest(cand.select("cand_id", vec_col), "cand_id", 1)
    lists = cand.join(assigned, on="cand_id")

    qdf = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    probes = _nearest(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
        "query_id",
        nprobe,
    )
    pairs = (
        probes.join(lists, on="cent_id")
        .join(F.broadcast(qdf), on="query_id")
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    scored = pairs.select(
        "query_id",
        "cand_id",
        cosine_similarity_col(F.col("_qvec"), F.col(vec_col)).alias("cosine"),
    )
    if round_digits is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_digits))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.dropDuplicates(["query_id", "cand_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def train_centroids(
    df: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    seed_ids: list | None = None,
) -> DataFrame:
    """Spherical k-means (Lloyd's) trainer producing an ``ivf_topk``
    centroid set — makes the IVF path self-contained instead of
    caller-supplied-only.

    Scale shape (the same Arrow machinery as ``banded_signatures``):
    - seeding is deterministic and order-independent: the k vectors with
      the smallest ``xxhash64(id, seed)`` (a hash-derived sample, no
      ``rand()``); or, when ``seed_ids`` is given, the vectors with those
      ids in ascending id order — an engine-agnostic seeding that an
      external oracle can replicate exactly (the hash path is
      Spark-specific);
    - each iteration is ONE ``mapInPandas`` pass: per partition, a numpy
      matmul assigns every vector to its nearest centroid (cosine) and
      emits k partial (count, sum) rows — the per-partition combine means
      only ``n_partitions × k`` tiny rows ever reach the driver, never the
      vectors themselves;
    - the driver merges partials, renormalizes, and rebroadcasts —
      O(k·dim) per round, the irreducible cost of iterative convergence
      (same argument as ``near_dup_clusters``).

    Empty clusters keep their previous centroid. Returns a ``(id_col,
    vec_col)`` DataFrame with ids ``0..k-1``, ready for ``ivf_topk``.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if seed_ids is not None:
        if len(seed_ids) != k:
            raise ValueError(f"seed_ids must have exactly k={k} ids, got {len(seed_ids)}")
        seeds = (
            vecs.filter(F.col("_id").isin(list(seed_ids)))
            .orderBy("_id")
            .select("_v")
            .collect()
        )
    else:
        seeds = (
            vecs.withColumn("_h", F.xxhash64(F.col("_id").cast("string"), F.lit(seed)))
            .orderBy("_h", "_id")
            .limit(k)
            .select("_v")
            .collect()
        )
    if len(seeds) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seeds)}")
    cents = np.stack([np.asarray(r._v, dtype=np.float64) for r in seeds])
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    only_vecs = vecs.select("_v")
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)

        def _partials(batches):
            cl = bc.value
            n_cent, dim_ = cl.shape
            sums = np.zeros((n_cent, dim_))
            counts = np.zeros(n_cent, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["_v"]])
                norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                # Round cosines BEFORE argmax — the same determinism
                # contract as ``nearest_centroids``: numpy matmul (pairwise
                # summation) and an external oracle's sequential list_sum
                # can differ at ~1e-16, which would flip near-tied
                # assignments nondeterministically. argmax takes the FIRST
                # max, i.e. the lowest centroid id on rounded ties —
                # exactly ORDER BY sim DESC, cent_id.
                sims = np.round((mat / norms) @ cl.T, 4)
                cids = sims.argmax(axis=1)
                for c in np.unique(cids):
                    mask = cids == c
                    sums[c] += mat[mask].sum(axis=0)
                    counts[c] += int(mask.sum())
            yield pd.DataFrame(
                {
                    "cid": np.arange(n_cent, dtype=np.int64),
                    "n": counts,
                    "s": [row.tolist() for row in sums],
                }
            )

        partials = only_vecs.mapInPandas(
            _partials, "cid long, n long, s array<double>"
        ).collect()  # n_partitions × k rows — bounded, never the data
        bc.unpersist()
        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        for row in partials:
            sums[row.cid] += np.asarray(row.s)
            counts[row.cid] += row.n
        nonempty = counts > 0
        new_cents = cents.copy()
        means = sums[nonempty] / counts[nonempty, None]
        new_cents[nonempty] = means / np.maximum(
            np.linalg.norm(means, axis=1, keepdims=True), 1e-12
        )
        if np.allclose(new_cents, cents, atol=1e-9):
            cents = new_cents
            break
        cents = new_cents

    return spark.createDataFrame(
        [(int(i), [float(x) for x in cents[i]]) for i in range(k)],
        f"{id_col} long, {vec_col} array<double>",
    )


def ann_recall(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    bands: int = 4,
    k: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Recall@k of the LSH path against the exact brute-force baseline, per
    query: |LSH∩exact| / |exact|. The measurement the ANN path is judged by."""
    # both top-k sets are tiny (|queries|·k rows) and referenced multiple
    # times below — persist so the scoring subtrees run once each
    exact = track(
        cosine_topk(queries, candidates, id_col, vec_col, k, round_digits=4).select(
            "query_id", "cand_id"
        )
    )
    approx = track(
        lsh_bucket_join(
            queries, candidates, dim, id_col, vec_col, bits, bands, k, seed, round_digits=4
        ).select("query_id", F.col("cand_id").alias("_ac"))
    )
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id) & (exact.cand_id == approx._ac),
        "left_semi",
    )
    n_exact = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_exact.join(n_hit, on="query_id", how="left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall"),
        )
    )
