"""End-to-end training-corpus curation with astro_sdk_spark.

The canonical pre-training data pipeline, composed from the library's
operators the way a real curation job would chain them:

    raw HTML pages
      → strip_html            (markup → text)
      → normalize_text        (Unicode NFC, control strip)
      → lang_id + quality     (heuristic gates)
      → dedup_corpus          (exact + MinHash-LSH near-dup keep-list)
      → decontaminate         (benchmark n-gram overlap drop)
      → redact_pii            (emails/IPs/SSNs/phones)
      → leakage-safe split    (train/test with cross-boundary dedup)
      → pack_greedy           (fixed-length sequence packing)

Every stage is a DataFrame→DataFrame transform: the whole pipeline is
ONE lazy plan per output, Catalyst prunes columns across stage
boundaries, and nothing collects to the driver. Run it at any scale
factor:

    python examples/curate_corpus.py [sf_dir] [output_dir]

The pipeline returns per-stage survivor counts so a scheduled job can
emit them as metrics.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    seq_len: int = 512,
    quality_threshold: float = 0.5,
) -> dict:
    """Run the curation chain; returns the stage frames and counts.

    ``docs``: (doc_id, text, ...) raw documents (HTML allowed).
    ``benchmark``: (doc_id, text) evaluation sets to decontaminate
    against.
    """
    from astro_sdk_spark.functions import (
        dedup_corpus,
        normalize_text,
        pack_greedy,
        quality_score,
        redact_pii,
        strip_html,
    )
    from astro_sdk_spark.functions.cleaning import decontaminate
    from astro_sdk_spark.functions.sampling import leakage_safe_split
    from astro_sdk_spark.functions.text import lang_id, token_count

    counts: dict[str, int] = {"input": docs.count()}

    # 1. markup → text (no-op for plain-text rows), then canonicalize
    text = strip_html(docs).select("doc_id", F.col("plain_text").alias("text"))
    text = normalize_text(text).select(
        "doc_id", F.col("norm_text").alias("text")
    )

    # 2. heuristic gates: language id (column fn) + quality score
    labeled = text.withColumn("lang", lang_id(F.col("text")))
    scored = labeled.join(
        quality_score(text).select("doc_id", "quality_score"), "doc_id"
    )
    kept = (
        scored.filter(F.col("quality_score") >= quality_threshold)
        .select("doc_id", "text", "lang")
    )
    counts["after_quality_gate"] = kept.count()

    # 3. exact + near-duplicate removal: dedup_corpus returns the
    # canonical KEEP-list of ids; semi-join selects the survivors.
    # persist(): every stage below (and both output writes) would
    # otherwise replay the MinHash banding from the raw scan — the
    # classic multi-action lineage trap
    keep_ids = dedup_corpus(kept)
    deduped = kept.join(keep_ids, "doc_id", "left_semi").persist()
    counts["after_dedup"] = deduped.count()

    # 4. benchmark decontamination (broadcast n-gram set)
    clean = decontaminate(deduped, benchmark, mode="drop")
    counts["after_decontamination"] = clean.count()

    # 5. PII redaction (codegen projection, counts preserved)
    redacted = redact_pii(clean).select(
        "doc_id", F.col("text_redacted").alias("text"), "n_pii"
    ).join(clean.select("doc_id", "lang"), "doc_id")

    # 6. leakage-safe 90/10 split: train docs near-dup to holdout drop
    split = leakage_safe_split(redacted).select("doc_id", "split")
    final = redacted.join(split, "doc_id").filter(
        F.col("split") != "dropped"
    ).persist()
    counts["after_split"] = final.count()
    deduped.unpersist()

    # 7. pack the train side into fixed-length sequences
    train = final.filter(F.col("split") == "train").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    packed = pack_greedy(train, "doc_id", "n_tokens", budget=seq_len)
    counts["train_sequences"] = packed.select("pack_id").distinct().count()

    return {
        "counts": counts,
        "final": final,
        "packed": packed,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"

    from astro_sdk_spark import get_session

    spark = get_session(app_name="curate_corpus")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # use a slice of the corpus itself as the stand-in benchmark
    benchmark = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")

    result = curate(docs, benchmark)
    result["final"].write.mode("overwrite").parquet(f"{out_dir}/documents")
    result["packed"].write.mode("overwrite").parquet(f"{out_dir}/sequences")
    for stage, n in result["counts"].items():
        print(f"{stage:>24}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
