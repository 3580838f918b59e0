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


# ---------------------------------------------------------------------------
# examples/analytics_publish.py — the ELT publication chain


@pytest.fixture(scope="module")
def published(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "analytics_publish",
        os.path.join(
            os.path.dirname(__file__), "..", "examples", "analytics_publish.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.nightly_report(spark, "/root/testdata/sf0.001")


def test_publish_example_live_table_matches_direct_aggregate(spark, published):
    c = published["counts"]
    assert c["orders"] > 0 and c["lineitem"] > 0 and c["report_rows"] > 0
    # the published table equals the aggregate computed directly
    from pyspark.sql import functions as F

    li = spark.table("rpt_lineitem")
    o = spark.table("rpt_orders")
    want = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count_distinct("o_orderkey").alias("n_orders"))
    )
    got = spark.table("rpt_revenue").select("priority", "n_orders")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_publish_example_monitor_covers_every_flag(spark, published):
    mon = {(r.l_returnflag, r.q) for r in published["monitor"].collect()}
    flags = {
        r.l_returnflag
        for r in spark.table("rpt_lineitem").select("l_returnflag").distinct().collect()
    }
    assert mon == {(f, q) for f in flags for q in (0.5, 0.95)}


# ---------------------------------------------------------------------------
# examples/stream_monitoring.py — the always-on sketch-store monitoring chain


@pytest.fixture(scope="module")
def monitored(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "stream_monitoring",
        os.path.join(
            os.path.dirname(__file__), "..", "examples", "stream_monitoring.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.monitor(spark, "/root/testdata/sf0.001")


def test_stream_monitoring_example_covers_every_event_type(spark, monitored):
    from astro_sdk_spark.queries import T

    types = {
        r.event_type
        for r in T(spark, "/root/testdata/sf0.001", "events")
        .select("event_type").distinct().collect()
    }
    got = {(r.event_type, r.q) for r in monitored["quantiles"]}
    assert got == {(t, q) for t in types for q in (0.5, 0.95)}
    # CMS estimates exist and are upper bounds > 0 for probed users
    assert monitored["top_freqs"] and all(r.est > 0 for r in monitored["top_freqs"])
    # state is sketch-bounded: quantile rows <= types * bucket range,
    # cms rows <= types * depth * width
    assert monitored["cms_state_rows"] <= len(types) * 4 * 1024


# examples/similarity_service.py — persisted ANN index + streaming adds


def test_similarity_service_example(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "similarity_service",
        os.path.join(
            os.path.dirname(__file__), "..", "examples", "similarity_service.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.serve(spark, "/root/testdata/sf0.001")
    try:
        # the stream-extended index covers the WHOLE corpus (build half +
        # two streamed micro-batches), and every query's best neighbour
        # is itself (ADC distance of a vector to its own code is minimal
        # here because the codebooks are inlined from corpus vectors)
        assert out["n_indexed"] == out["n_corpus"]
        by_q: dict = {}
        for r in out["hits"]:
            by_q.setdefault(r.query_id, []).append(r)
        assert set(by_q) == {0, 1, 2, 3}
        for qid, rows in by_q.items():
            assert rows[0].rank == 1 and rows[0].vec_id == qid
        # maintenance payoff: streaming fragmented ≥1 list, compaction
        # strictly reduced the file count (answers pinned inside serve())
        assert out["max_list_files_before"] >= 2
        assert out["files_after"] < out["files_before"]
    finally:
        from astro_sdk_spark.functions.ann_index import drop_ann_index

        drop_ann_index(spark, out["index"])
