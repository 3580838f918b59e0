"""Persisted IVF ANN index: centroids + inverted lists as managed tables.

The in-query IVF family (similarity.py:ivf_topk, pq.py:ivfpq_topk) rebuilds
its index structures inside every query — fine for one-shot analytics,
wrong for a similarity SERVICE over a 100 TB corpus, where the expensive
candidate-assignment pass should be paid once, persisted, and extended
incrementally as new vectors arrive (the reference's closest analogue is
its reusable-table workflow around load/merge, e.g.
``python-sdk/src/astro/sql/operators/load_file.py:64-118``; the signature
store in functions/dedup.py:incremental near-dup is this repo's own
precedent).

Layout (all plain managed parquet tables — readable by any engine):

- ``{name}__centroids``: ``(cent_id, vec)`` — the (contractually small)
  coarse quantizer, broadcast at query/add time.
- ``{name}__lists``:     ``(cent_id, cand_id, vec)`` — the inverted lists,
  i.e. every indexed vector tagged with its nearest centroid. At scale
  this is THE big table; it is written partitioned by nothing but read
  with a cent_id equi-join, so Catalyst prunes probed lists via the join
  (or via partition pruning if the caller repartitions by cent_id).
- ``{name}__meta``:      one row of build parameters, checked on every
  add/query so an index built under one geometry can't silently serve
  another (same discipline as streaming/store.py's param columns).

Determinism contract: assignment/probing/rescoring round cosines to
``round_digits`` and break ties on ascending id — identical to ivf_topk,
so an incrementally-built index answers queries bit-for-bit like a
one-shot build (gated by q_ann_persist's oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from astro_sdk_spark.functions.similarity import (
    cosine_similarity_col,
    nearest_centroids,
)

__all__ = [
    "build_ann_index",
    "ann_index_add",
    "ann_index_topk",
    "drop_ann_index",
]

_ROUND_DIGITS = 4


def _tables(name: str) -> tuple[str, str, str]:
    return f"{name}__centroids", f"{name}__lists", f"{name}__meta"


def _read_meta(spark: SparkSession, name: str) -> dict:
    _, _, meta_t = _tables(name)
    if not spark.catalog.tableExists(meta_t):
        raise ValueError(f"ANN index {name!r} does not exist (no {meta_t})")
    row = spark.table(meta_t).head()
    if row is None:
        raise ValueError(f"ANN index {name!r} has an empty meta table")
    return row.asDict()


def build_ann_index(
    spark: SparkSession,
    corpus: DataFrame,
    name: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Create the index tables and assign ``corpus`` to its lists.

    ``centroids`` is caller-supplied — train_centroids output, a coreset,
    or a deterministic sample — keeping the quantizer choice outside the
    storage layer (same contract as ivf_topk). One broadcast-assign pass
    over the corpus, no shuffle; the lists table append is the only
    write."""
    cent_t, lists_t, meta_t = _tables(name)
    drop_ann_index(spark, name)
    cent = centroids.select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("vec")
    )
    cent.write.format("parquet").saveAsTable(cent_t)
    n_cent = spark.table(cent_t).count()
    dim_row = spark.table(cent_t).select(F.size("vec").alias("d")).head()
    spark.createDataFrame(
        [(int(n_cent), int(dim_row.d), _ROUND_DIGITS, "cosine")],
        "n_centroids int, dim int, round_digits int, metric string",
    ).write.format("parquet").saveAsTable(meta_t)
    _append_assigned(spark, corpus, name, id_col, vec_col, first=True)


def ann_index_add(
    spark: SparkSession,
    batch: DataFrame,
    name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dedupe: bool = True,
) -> None:
    """Incrementally index new vectors: assign against the STORED
    centroids (broadcast — the corpus lists are never rescanned) and
    append to the lists table. With ``dedupe`` (default), ids already in
    the index are skipped, making re-adds idempotent — the anti-join
    touches only the lists table's id column (column-pruned scan)."""
    _read_meta(spark, name)  # existence + geometry check
    _append_assigned(spark, batch, name, id_col, vec_col, dedupe=dedupe)


def _append_assigned(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    id_col: str,
    vec_col: str,
    first: bool = False,
    dedupe: bool = True,
) -> None:
    cent_t, lists_t, _ = _tables(name)
    meta = _read_meta(spark, name)
    dim = df.select(F.size(F.col(vec_col)).alias("d")).head()
    if dim is not None and dim.d != meta["dim"]:
        raise ValueError(
            f"ANN index {name!r} holds dim-{meta['dim']} vectors; "
            f"got dim-{dim.d}"
        )
    vecs = df.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("vec")
    )
    if not first and dedupe and spark.catalog.tableExists(lists_t):
        vecs = vecs.join(
            spark.table(lists_t).select("cand_id"), "cand_id", "left_anti"
        )
    assigned = nearest_centroids(
        vecs,
        spark.table(cent_t),
        id_col="cand_id",
        vec_col="vec",
        n=1,
        cent_id_col="cent_id",
        cent_vec_col="vec",
        round_digits=meta["round_digits"],
    )
    out = vecs.join(assigned, "cand_id").select("cent_id", "cand_id", "vec")
    writer = out.write.format("parquet")
    if first and not spark.catalog.tableExists(lists_t):
        writer.saveAsTable(lists_t)
    else:
        writer.mode("append").saveAsTable(lists_t)


def ann_index_topk(
    spark: SparkSession,
    queries: DataFrame,
    name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    k: int = 10,
) -> DataFrame:
    """Top-k cosine search against the persisted index. Each query probes
    its ``nprobe`` nearest stored centroids and exact-scores only those
    lists — the cent_id equi-join against the lists table is the pruning
    step, so work is O(Q · N · nprobe / n_centroids), and the queries side
    broadcasts (a query batch is small next to a 100 TB corpus). Output
    matches ivf_topk exactly: (query_id, cand_id, cosine, rank)."""
    cent_t, lists_t, _ = _tables(name)
    meta = _read_meta(spark, name)
    digits = meta["round_digits"]
    qdf = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    probes = nearest_centroids(
        qdf,
        spark.table(cent_t),
        id_col="query_id",
        vec_col="_qvec",
        n=nprobe,
        cent_id_col="cent_id",
        cent_vec_col="vec",
        round_digits=digits,
    )
    pairs = (
        probes.join(spark.table(lists_t), "cent_id")
        .join(F.broadcast(qdf), "query_id")
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    scored = pairs.select(
        "query_id",
        "cand_id",
        F.round(
            cosine_similarity_col(F.col("_qvec"), F.col("vec")), digits
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.dropDuplicates(["query_id", "cand_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def drop_ann_index(spark: SparkSession, name: str) -> None:
    """Drop the three index tables, including orphaned warehouse
    locations a previous session left behind (the derived ``__centroids``
    /``__lists``/``__meta`` names are operator-owned, so the
    unconditional scrub is safe — same contract as the sketch store's
    staging names)."""
    from astro_sdk_spark.operators.swap import scrub_orphaned_location

    for t in _tables(name):
        if spark.catalog.tableExists(t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        else:
            scrub_orphaned_location(spark, t)
