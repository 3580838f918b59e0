"""An always-on similarity service: persisted ANN index + streaming adds.

The shape a 100 TB embedding corpus is actually served from, composed
end-to-end:

    build_ann_index(corpus, codebooks=...)   one assignment/encode pass;
                                             centroids + PQ codebooks +
                                             cent_id-partitioned inverted
                                             lists land as plain managed
                                             parquet tables
      → stream_ann_index_ingest(stream)      each micro-batch of NEW
                                             vectors is encoded against
                                             the STORED quantizer and
                                             appended — the corpus is
                                             never rescanned, replays
                                             are id-idempotent
      → ann_index_topk(queries)              point-in-time search at ANY
                                             moment: the tiny probe set
                                             becomes a static partition
                                             filter, so a query opens
                                             nprobe/n_centroids of the
                                             lists' FILES

Why persist instead of the in-query ivfpq_topk: the assignment/encode
pass is the corpus-sized cost. Paying it once and extending incrementally
is what makes "index 100 TB, then serve forever" viable; the two-batch
build is hash-verified equal to a one-shot rebuild (q_ann_persist /
q_annpq_persist under the oracle gate), so freshness never trades against
correctness.

Run at any scale factor:

    python examples/similarity_service.py [sf_dir]

Builds a PQ index over half the embeddings table, streams the other half
in as two micro-batches, runs a top-k query batch, prints the first
results, then cleans up.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from astro_sdk_spark import get_session  # noqa: E402
from astro_sdk_spark.functions.ann_index import (  # noqa: E402
    ann_index_compact,
    ann_index_stats,
    ann_index_topk,
    build_ann_index,
    drop_ann_index,
)
from astro_sdk_spark.queries import T  # noqa: E402
from astro_sdk_spark.streaming.ops import stream_ann_index_ingest  # noqa: E402
from astro_sdk_spark.streaming.testing import stage_microbatch_files  # noqa: E402


def serve(spark, sf_dir: str) -> dict:
    """Build → stream-extend → query; returns the pieces the test pins."""
    emb = T(spark, sf_dir, "embeddings")
    idx = "example_sim_idx"
    work = tempfile.mkdtemp(prefix="sim_service_")
    try:
        # deterministic sample quantizer + inlined codebooks — swap in
        # train_centroids / train_pq output for a learned index
        cents = emb.filter(F.col("vec_id") < 16)
        cw = cents.orderBy("vec_id").select("embedding").collect()
        m, dsub = 4, 16
        codebooks = [
            [[float(r.embedding[s * dsub + t]) for t in range(dsub)] for r in cw]
            for s in range(m)
        ]

        # 1. one-time build over the historical half of the corpus
        drop_ann_index(spark, idx)
        build_ann_index(
            spark, emb.filter(F.col("vec_id") % 2 == 0), idx,
            centroids=cents, codebooks=codebooks,
        )

        # 2. the "live" half arrives as a stream of micro-batches
        newer = emb.filter(F.col("vec_id") % 2 == 1)
        batches = [
            newer.filter(F.col("vec_id") % 4 == 1),
            newer.filter(F.col("vec_id") % 4 == 3),
        ]
        src = stage_microbatch_files(batches, os.path.join(work, "vec_stream"))
        q = stream_ann_index_ingest(
            spark.readStream.schema(newer.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            idx,
            os.path.join(work, "ck"),
        )
        assert q.awaitTermination(300) and q.exception() is None

        # 3. serve: top-5 neighbours for a query batch, from the tables
        hits = ann_index_topk(
            spark, emb.filter(F.col("vec_id") < 4), idx, nprobe=4, k=5
        ).orderBy("query_id", "rank").collect()

        # 4. maintain: every micro-batch appended ≥1 small file per
        # touched list — read the health report, compact the fragmented
        # lists (per-partition dynamic INSERT OVERWRITE; readers keep
        # answering), and verify the answers didn't move a byte
        stats_before = ann_index_stats(spark, idx).collect()
        report = ann_index_compact(spark, idx, min_files=2)
        hits_after = ann_index_topk(
            spark, emb.filter(F.col("vec_id") < 4), idx, nprobe=4, k=5
        ).orderBy("query_id", "rank").collect()
        assert hits_after == hits, "compaction must not change answers"
        return {
            "n_indexed": spark.table(f"{idx}__lists").count(),
            "n_corpus": emb.count(),
            "hits": hits,
            "index": idx,
            "files_before": report["files_before"],
            "files_after": report["files_after"],
            "max_list_files_before": max(r.files for r in stats_before),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main(sf_dir: str) -> None:
    spark = get_session(app_name="similarity_service_example")
    spark.sparkContext.setLogLevel("ERROR")
    out = serve(spark, sf_dir)
    try:
        print(f"indexed vectors: {out['n_indexed']} (of {out['n_corpus']})")
        print(
            f"maintenance: {out['files_before']} list files "
            f"(max {out['max_list_files_before']}/list after streaming) "
            f"→ {out['files_after']} after compaction, answers unchanged"
        )
        for r in out["hits"][:10]:
            print(
                f"query {r.query_id}: neighbour {r.vec_id} "
                f"(adist {r.adist}, rank {r.rank})"
            )
    finally:
        drop_ann_index(spark, out["index"])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
