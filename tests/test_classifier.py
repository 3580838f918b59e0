"""Quality classifier (hashed-ngram logistic regression) and document
chunking: learning behavior, determinism contracts, and window geometry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.classifier import (
    score_text_classifier,
    train_text_classifier,
)
from astro_sdk_spark.functions.text import chunk_documents


def _toy_corpus(spark):
    """Two separable dialects: 'good' docs reuse a clean vocabulary,
    'bad' docs a junk vocabulary; a couple of mixed docs sit between."""
    good = [f"clean prose sentence number {i} reads well" for i in range(20)]
    bad = [f"zz spam junk blob {i} click buy now" for i in range(20)]
    rows = [(i, t, 1) for i, t in enumerate(good)]
    rows += [(100 + i, t, 0) for i, t in enumerate(bad)]
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_classifier_separates_classes(spark):
    df = _toy_corpus(spark)
    w = train_text_classifier(df, "y", n_iters=3, lr=1.0, hash_fn="xxhash64")
    scored = score_text_classifier(df, w, hash_fn="xxhash64")
    joined = {r["doc_id"]: r for r in scored.collect()}
    good_scores = [joined[i]["score"] for i in range(20)]
    bad_scores = [joined[100 + i]["score"] for i in range(20)]
    assert min(good_scores) > max(bad_scores)
    # keep flag follows the 0.5 threshold on the trained margin
    assert all(joined[i]["keep"] for i in range(20))
    assert not any(joined[100 + i]["keep"] for i in range(20))


def test_classifier_weights_bounded_by_buckets(spark):
    df = _toy_corpus(spark)
    w = train_text_classifier(df, "y", n_buckets=64, n_iters=1, hash_fn="xxhash64")
    rows = w.collect()
    assert len(rows) <= 64
    assert {r["_b"] for r in rows} <= set(range(64))
    # micro-unit grid contract: w is exactly w_int / 1e6
    for r in rows:
        assert r["w"] == r["w_int"] / 1e6


def test_classifier_deterministic_across_partitionings(spark):
    """Integer-grid arithmetic makes training reduction-order-independent:
    1 partition and 7 partitions must give bit-identical weights."""
    df = _toy_corpus(spark)
    w1 = dict(
        train_text_classifier(
            df.repartition(1), "y", n_iters=2, hash_fn="xxhash64"
        ).select("_b", "w_int").collect()
    )
    w7 = dict(
        train_text_classifier(
            df.repartition(7), "y", n_iters=2, hash_fn="xxhash64"
        ).select("_b", "w_int").collect()
    )
    assert w1 == w7


def test_classifier_rejects_bad_args(spark):
    df = _toy_corpus(spark)
    with pytest.raises(ValueError, match="n_iters"):
        train_text_classifier(df, "y", n_iters=0)
    with pytest.raises(ValueError, match="hash_fn"):
        train_text_classifier(df, "y", hash_fn="sha1")


def test_chunk_documents_geometry(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap_tokens=1).collect()
    # stride 3: starts 0,3,6,9 → 4 chunks; last is the 1-token remainder
    assert [r["chunk_id"] for r in sorted(out, key=lambda r: r["chunk_id"])] == [0, 1, 2, 3]
    by_id = {r["chunk_id"]: r for r in out}
    assert by_id[0]["chunk_text"] == "t0 t1 t2 t3"
    assert by_id[1]["chunk_text"] == "t3 t4 t5 t6"  # 1 token of overlap
    assert by_id[3]["chunk_text"] == "t9"
    assert by_id[3]["chunk_token_count"] == 1
    # full coverage: every token appears in at least one chunk
    covered = set()
    for r in out:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_documents_short_and_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, " ".join(["w"] * 6)), (3, "solo")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=3, overlap_tokens=0)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert rows[(1, 0)]["chunk_text"] == "a b"  # shorter than one window
    assert len([k for k in rows if k[0] == 2]) == 2  # exact multiple: no empty tail
    assert rows[(3, 0)]["chunk_token_count"] == 1


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


def test_chunk_plan_is_shuffle_free(spark):
    """Chunking must stay a generator projection — no Exchange in the plan."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_calibrate_threshold_keeps_target_fraction(spark):
    from astro_sdk_spark.functions.classifier import calibrate_threshold

    # spread of distinct scores — quantile thresholds are only meaningful
    # off ties (a bimodal classifier output needs a fraction that falls
    # between the modes)
    scored = spark.createDataFrame(
        [(i, (i + 1) / 100.0) for i in range(100)], "doc_id long, score double"
    )
    for frac in (0.25, 0.5, 0.9):
        thr = calibrate_threshold(scored, keep_fraction=frac)
        kept = scored.filter(F.col("score") >= thr).count()
        assert abs(kept / 100.0 - frac) <= 0.05
    # keep everything → threshold at/below the minimum
    assert calibrate_threshold(scored, 1.0) <= 0.01 + 1e-9
    with pytest.raises(ValueError, match="keep_fraction"):
        calibrate_threshold(scored, 0.0)


def test_calibrate_threshold_on_trained_scores(spark):
    """On the bimodal toy corpus a fraction between the modes recovers
    exactly the good class."""
    from astro_sdk_spark.functions.classifier import calibrate_threshold

    df = _toy_corpus(spark)
    w = train_text_classifier(df, "y", n_iters=3, lr=1.0, hash_fn="xxhash64")
    scored = score_text_classifier(df, w, hash_fn="xxhash64")
    thr = calibrate_threshold(scored, keep_fraction=0.4)
    kept = {r["doc_id"] for r in scored.filter(F.col("score") >= thr).collect()}
    # the threshold lands inside/above the good mode: everything kept is
    # good, and a healthy share of the good class survives
    assert kept and kept <= set(range(20))
    assert len(kept) >= 10


def test_chunk_reassembly_property(spark):
    """For ANY document: drop each chunk's overlap prefix (except the
    first chunk) and concatenate in chunk order → the original token
    stream, exactly. Hypothesis over random token counts and window
    geometries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        st.integers(1, 40),   # document length in tokens
        st.integers(2, 9),    # chunk_tokens
        st.integers(0, 7),    # overlap_tokens (< chunk enforced below)
    )
    def prop(n_tokens, chunk, overlap):
        overlap = min(overlap, chunk - 1)
        text = " ".join(f"w{i}" for i in range(n_tokens))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, chunk_tokens=chunk, overlap_tokens=overlap)
            .collect(),
            key=lambda r: r["chunk_id"],
        )
        toks = []
        for i, r in enumerate(rows):
            parts = r["chunk_text"].split(" ")
            toks.extend(parts if i == 0 else parts[overlap:])
        assert toks == text.split(" ")

    prop()
