"""examples/curate_corpus.py: the documented end-to-end curation chain
must run at sf0.001, shrink monotonically, and emit well-formed outputs."""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "curate_corpus",
    os.path.join(os.path.dirname(__file__), "..", "examples", "curate_corpus.py"),
)
example = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(example)


@pytest.fixture(scope="module")
def curated(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    return example.curate(docs, benchmark)


def test_pipeline_counts_monotone(curated):
    c = curated["counts"]
    order = [
        "input", "after_quality_gate", "after_dedup",
        "after_decontamination", "after_split",
    ]
    vals = [c[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert c["after_split"] > 0 and c["train_sequences"] > 0


def test_pipeline_output_schema_and_hygiene(curated):
    final = curated["final"]
    assert {"doc_id", "text", "lang", "split", "n_pii"} <= set(final.columns)
    # split labels are only train/test after the dropped filter
    labels = {r.split for r in final.select("split").distinct().collect()}
    assert labels <= {"train", "test"}
    # redaction ran: no raw emails survive
    leaked = final.filter(F.col("text").rlike(r"[\w.]+@[\w.]+\.\w")).count()
    assert leaked == 0


def test_pipeline_packs_respect_budget(curated):
    packed = curated["packed"]
    over = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("n"))
        # single oversized docs legitimately overflow a pack alone
        .filter((F.col("tok") > 512) & (F.col("n") > 1))
        .count()
    )
    assert over == 0
