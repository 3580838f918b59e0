"""functions/sampling.py: deterministic splits, stratified sampling, and
sequence packing. The md5-bucket queries are oracle-checked end-to-end
(q_train_split / q_stratified_sample / q_seq_packing); these tests cover
the properties the SQL oracle can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.sampling import (
    concat_chunk_pack,
    deterministic_split,
    hash_bucket,
    pack_greedy,
    stratified_sample,
)
from astro_sdk_spark.queries import T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        T(spark, SF, "documents")
        .withColumn("n_tokens", F.size(F.split(F.col("text"), " ")))
        .cache()
    )


def test_split_stable_under_append(spark, docs):
    """New rows must never move existing rows between splits."""
    half = docs.filter(F.col("doc_id") < 250)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {
        r.doc_id: r.split
        for r in deterministic_split(docs, "doc_id", w).select("doc_id", "split").collect()
    }
    part = {
        r.doc_id: r.split
        for r in deterministic_split(half, "doc_id", w).select("doc_id", "split").collect()
    }
    assert part == {k: v for k, v in full.items() if k < 250}
    assert set(full.values()) == {"train", "val", "test"}


def test_split_weights_validated(docs):
    with pytest.raises(ValueError, match="sum to 1.0"):
        deterministic_split(docs, "doc_id", {"a": 0.5, "b": 0.6})


def test_stratified_fraction_bounds(docs):
    """fraction 1.0 keeps everything; 0.0 default drops unlisted strata."""
    kept = stratified_sample(
        docs, "source", {"src0": 1.0}, key_col="doc_id", default_fraction=0.0
    )
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert kept.count() == n_src0
    assert kept.select("source").distinct().collect()[0][0] == "src0"


def test_hash_bucket_partition_independent(spark, docs):
    a = docs.coalesce(1).select("doc_id", hash_bucket(F.col("doc_id")).alias("b"))
    b = docs.repartition(16).select("doc_id", hash_bucket(F.col("doc_id")).alias("b"))
    assert {(r.doc_id, r.b) for r in a.collect()} == {
        (r.doc_id, r.b) for r in b.collect()
    }


def test_concat_chunk_pack_offsets(docs):
    out = concat_chunk_pack(docs, "doc_id", "n_tokens", budget=512, n_buckets=4)
    rows = out.select("bucket", "doc_id", "n_tokens", "pack_id", "pack_offset").collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r.pack_offset < 512
        assert r.pack_id >> 32 == r.bucket
    # within a bucket the tape is contiguous: total tokens == last end
    agg = (
        out.groupBy("bucket")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max(F.col("tape_start") + F.col("n_tokens")).alias("tape_end"),
        )
        .collect()
    )
    for r in agg:
        assert r.tot == r.tape_end


def test_pack_greedy_invariants(docs):
    budget = 512
    out = pack_greedy(docs, "doc_id", "n_tokens", budget=budget, n_buckets=4).cache()
    # every doc survives exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # no pack exceeds budget unless it is a single over-long doc
    packs = (
        out.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert packs
    for p in packs:
        assert p.fill <= budget or p.n == 1
    # packing is reasonably tight: average fill of multi-doc packs > 50%
    multi = [p.fill for p in packs if p.n > 1]
    if multi:
        assert sum(multi) / len(multi) > budget * 0.5
    out.unpersist()


def test_pack_greedy_matches_reference_walk(spark):
    """Tiny hand-checkable case on one bucket."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate([300, 300, 300, 700, 100, 900])],
        "doc_id long, n_tokens long",
    )
    out = pack_greedy(df, "doc_id", "n_tokens", budget=600, n_buckets=1)
    got = {r.doc_id: r.pack_id & 0xFFFFFFFF for r in out.collect()}
    # walk: 300 | 300+300 no (600 fits!) — 300,300=600 pack0; 300 pack1;
    # 700 alone pack2 (over budget, own pack); 100 pack... 700>600 so new
    # pack; then 100 starts pack3? greedy: after 700 (pack2, used=700),
    # 100 would exceed → pack3; 900 exceeds → pack4
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_domain_mix_rates_and_determinism(spark):
    from astro_sdk_spark.functions.sampling import domain_mix

    rows = [(i, "heavy" if i % 2 else "light") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_mix(df, {"heavy": 0.25}, salt="t")
    by_src = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["light"] == 1000            # default_rate=1.0 keeps all
    assert 150 < by_src["heavy"] < 350        # ~25% of 1000
    # decisions are per-row deterministic: repartitioning changes nothing
    again = {r.doc_id for r in domain_mix(df.repartition(13), {"heavy": 0.25}, salt="t").collect()}
    assert again == {r.doc_id for r in out.collect()}
    # rate 0 removes the domain entirely
    assert domain_mix(df, {"heavy": 0.0}, salt="t").filter("source='heavy'").count() == 0


def test_domain_mix_validates_rates(spark):
    import pytest as _pytest

    from astro_sdk_spark.functions.sampling import domain_mix

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError):
        domain_mix(df, {"a": 1.5})
    with _pytest.raises(ValueError):
        domain_mix(df, {"a": 0.5}, default_rate=-0.1)


def test_tf_idf_ranks_distinctive_terms(spark):
    from astro_sdk_spark.functions.text import tf_idf

    docs = spark.createDataFrame(
        [
            (1, "common common zebra zebra zebra"),
            (2, "common yak"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = tf_idf(docs, top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    top1 = {d: rs[0] for d, rs in by_doc.items() for rs in [sorted(rs, key=lambda x: x.rank)]}
    # 'common' is in every doc -> idf 0; distinctive terms win
    assert top1[1].term == "zebra" and top1[1].tf == 3
    assert top1[2].term == "yak"
    import math
    assert top1[1].tfidf == round(3 * math.log(3 / 1), 4)
    # doc 3 has only a zero-idf term; it still gets ranked rows with tfidf 0
    assert top1[3].term == "common" and top1[3].tfidf == 0.0


def test_lm_score_ranks_reference_like_text_higher(spark):
    import math

    from astro_sdk_spark.functions.text import lm_score

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(100, "the cat sat"), (101, "zyx qwv jkl")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_score(corpus, docs).collect()}
    # in-vocabulary text scores far better than unseen gibberish
    assert out[100].avg_logprob > out[101].avg_logprob
    assert out[100].perplexity < out[101].perplexity
    # check the exact smoothed value for the unseen-token doc:
    # corpus: T=60 tokens, V=5 distinct; unseen P = 1/(60 + 1*(5+1))
    assert out[101].avg_logprob == round(math.log(1 / 66), 4)
    assert out[100].n_tokens == 3


def test_tf_idf_hot_term_in_every_doc(spark):
    """De-skew regression: a stopword present in EVERY document gets IDF 0
    (unsmoothed ln(N/N)), and document frequency comes from a partially-
    aggregated groupBy(term) + join, not a term-partitioned window."""
    from astro_sdk_spark.functions.text import tf_idf

    n = 100
    docs = spark.createDataFrame(
        [(i, f"the word{i} filler{i}") for i in range(n)],
        "doc_id long, text string",
    )
    out = tf_idf(docs, top_n=3)
    rows = [(r.doc_id, r.term, r.tfidf) for r in out.collect()]
    hot = [t for t in rows if t[1] == "the"]
    assert len(hot) == n and all(t[2] == 0.0 for t in hot)
    distinctive = [t for t in rows if t[1] == f"word{0}" and t[0] == 0]
    assert distinctive and distinctive[0][2] > 0

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(term" not in plan.lower()


def test_tf_idf_matches_bruteforce_reference(spark):
    """Cross-check the groupBy+join document frequency against a Python
    reference (raw tf, unsmoothed ln(N/df), top-3, term tiebreak)."""
    import math
    from collections import Counter

    from astro_sdk_spark.functions.text import tf_idf

    corpus = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "apple cherry date date date"),
        (3, "elderberry"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")

    n = len(corpus)
    tfs = {d: Counter(t.lower().split()) for d, t in corpus}
    dfreq = Counter(term for c in tfs.values() for term in c)
    expect = {}
    for d, c in tfs.items():
        scored = sorted(
            ((round(tf * math.log(n / dfreq[t]), 4), t, tf) for t, tf in c.items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        expect[d] = [(t, tf, s, i + 1) for i, (s, t, tf) in enumerate(scored)]

    got = {}
    for r in tf_idf(docs, top_n=3).collect():
        got.setdefault(r.doc_id, []).append((r.term, r.tf, r.tfidf, r.rank))
    got = {d: sorted(v, key=lambda x: x[3]) for d, v in got.items()}
    assert got == expect, (got, expect)


def test_dsir_weights_rank_target_domain_higher(spark):
    """Documents from the target distribution must get higher importance
    weights than off-domain documents; dsir_select keeps the top slice."""
    from astro_sdk_spark.functions.sampling import dsir_select, dsir_weights

    tgt_text = "the model trains on clean english data with many words"
    off_text = "zzz qqq xxx vvv kkk jjj www uuu yyy ttt"
    rows = [(i, tgt_text + f" extra{i}") for i in range(20)]
    rows += [(100 + i, off_text + f" extra{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.filter("doc_id < 10")
    w = dsir_weights(df, target, n_buckets=1000)
    got = {r.doc_id: r.logw for r in w.collect()}
    avg_on = sum(got[i] for i in range(20)) / 20
    avg_off = sum(got[100 + i] for i in range(20)) / 20
    assert avg_on > avg_off
    kept = dsir_select(w, 0.5).collect()
    kept_ids = {r.doc_id for r in kept}
    # the on-domain half dominates the kept slice
    assert sum(1 for i in kept_ids if i < 100) >= 18


def test_dsir_hash_paths_agree_on_ranking(spark):
    """xxhash64 and md5 bucketings give different absolute weights but
    must agree on which group is more target-like."""
    from astro_sdk_spark.functions.sampling import dsir_weights

    rows = [(i, "alpha beta gamma delta common words here") for i in range(10)]
    rows += [(100 + i, "totally different off domain tokens qqq zzz") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.filter("doc_id < 5")
    for fn in ("xxhash64", "md5"):
        got = {r.doc_id: r.logw for r in dsir_weights(df, target, hash_fn=fn).collect()}
        assert min(got[i] for i in range(10)) > max(got[100 + i] for i in range(10))


def test_dsir_model_join_broadcasts_by_default(spark):
    """The scored-model side is <= n_buckets rows by construction — the
    scoring join must be a broadcast, never a full shuffle of features."""
    from astro_sdk_spark.functions.sampling import dsir_weights

    df = spark.createDataFrame(
        [(i, f"word{i} shared tokens appear here") for i in range(60)],
        "doc_id long, text string",
    )
    w = dsir_weights(df, df.filter("doc_id < 10"), n_buckets=128)
    w.collect()
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_dsir_select_gumbel_deterministic_and_weighted(spark, sf_dir):
    from astro_sdk_spark.functions.sampling import dsir_select, dsir_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = dsir_weights(docs, docs.filter(F.col("lang") == "en")).cache()

    a = {r.doc_id for r in dsir_select(w, 0.3, gumbel=True, seed=7).collect()}
    b = {r.doc_id for r in dsir_select(w, 0.3, gumbel=True, seed=7).collect()}
    assert a == b and len(a) > 0  # hash-derived noise: fully deterministic

    c = {r.doc_id for r in dsir_select(w, 0.3, gumbel=True, seed=8).collect()}
    assert a != c  # a different seed reshuffles the Gumbel keys

    # sampling ∝ weight: the selected set's mean logw must beat the
    # population mean (the whole point of importance resampling)
    pop = w.agg(F.avg("logw")).collect()[0][0]
    sel = w.join(
        spark.createDataFrame([(i,) for i in a], "doc_id long"), "doc_id"
    ).agg(F.avg("logw")).collect()[0][0]
    assert sel > pop
    # noised output drops the internal key column
    out = dsir_select(w, 0.3, gumbel=True)
    assert set(out.columns) == set(w.columns)
    w.unpersist()


# ---------------------------------------------------------------------------
# unimax_rates (UniMax language budget allocation)


def _lang_df(spark, sizes):
    rows = []
    did = 0
    for lang, n in sizes.items():
        rows.append((did, lang, n))
        did += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


def test_unimax_mixed_cap(spark):
    from astro_sdk_spark.functions.sampling import unimax_rates

    # caps (1 epoch): a=10, b=40, c=100; budget 100 → a capped at 10,
    # level (100-10)/2 = 45 for b? no: sorted [10,40,100]; j=1 t=33.3>10
    # capped; j=2 t=(100-10)/2=45>40 capped; j=3 t=(100-50)/1=50<=100 → 50
    df = _lang_df(spark, {"a": 10, "b": 40, "c": 100})
    out = {r["lang"]: r for r in unimax_rates(
        df, budget=100.0, size_col="n_chars", max_epochs=1.0
    ).collect()}
    assert out["a"]["alloc"] == 10.0 and out["a"]["epochs"] == 1.0
    assert out["b"]["alloc"] == 40.0
    assert out["c"]["alloc"] == 50.0 and out["c"]["epochs"] == 0.5
    assert sum(r["alloc"] for r in out.values()) == 100.0


def test_unimax_uncapped_even_split(spark):
    from astro_sdk_spark.functions.sampling import unimax_rates

    df = _lang_df(spark, {"a": 100, "b": 200, "c": 300})
    out = {r["lang"]: r["alloc"] for r in unimax_rates(
        df, budget=90.0, size_col="n_chars", max_epochs=1.0
    ).collect()}
    assert out == {"a": 30.0, "b": 30.0, "c": 30.0}


def test_unimax_data_limited(spark):
    from astro_sdk_spark.functions.sampling import unimax_rates

    # budget exceeds every cap: everything fully used, epochs = max_epochs
    df = _lang_df(spark, {"a": 10, "b": 20})
    out = {r["lang"]: r for r in unimax_rates(
        df, budget=1000.0, size_col="n_chars", max_epochs=2.0
    ).collect()}
    assert out["a"]["alloc"] == 20.0 and out["a"]["epochs"] == 2.0
    assert out["b"]["alloc"] == 40.0 and out["b"]["epochs"] == 2.0


def test_unimax_counts_docs_when_no_size_col(spark):
    from astro_sdk_spark.functions.sampling import unimax_rates

    df = _lang_df(spark, {"a": 7}).union(_lang_df(spark, {"a": 9, "b": 5}))
    out = {r["lang"]: r["corpus_size"] for r in unimax_rates(
        df, budget=10.0, max_epochs=1.0
    ).collect()}
    assert out == {"a": 2, "b": 1}


def test_unimax_validation(spark):
    import pytest

    from astro_sdk_spark.functions.sampling import unimax_rates

    df = _lang_df(spark, {"a": 1})
    with pytest.raises(ValueError, match="budget"):
        unimax_rates(df, budget=0.0)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_rates(df, budget=1.0, max_epochs=0.0)


# ---------------------------------------------------------------------------
# weighted_sample_per_group (Efraimidis–Spirakis reservoir)


def test_weighted_sample_shape_and_determinism(spark):
    from astro_sdk_spark.functions.sampling import weighted_sample_per_group

    rows = [(i, "g1" if i % 2 else "g2", (i % 7) + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    out1 = weighted_sample_per_group(df, k=3, weight_col="w", group_col="grp")
    got1 = sorted((r["grp"], r["doc_id"]) for r in out1.collect())
    # exactly k per group
    from collections import Counter

    assert Counter(g for g, _ in got1) == {"g1": 3, "g2": 3}
    # deterministic across partitionings
    out2 = weighted_sample_per_group(
        df.repartition(7), k=3, weight_col="w", group_col="grp"
    )
    assert sorted((r["grp"], r["doc_id"]) for r in out2.collect()) == got1
    # salt changes the draw
    out3 = weighted_sample_per_group(
        df, k=3, weight_col="w", group_col="grp", salt="other"
    )
    assert sorted((r["grp"], r["doc_id"]) for r in out3.collect()) != got1


def test_weighted_sample_zero_weight_excluded(spark):
    from astro_sdk_spark.functions.sampling import weighted_sample_per_group

    df = spark.createDataFrame(
        [(1, 0), (2, -3), (3, 5), (4, 5)], "doc_id long, w long"
    )
    got = {r["doc_id"] for r in
           weighted_sample_per_group(df, k=10, weight_col="w").collect()}
    assert got == {3, 4}


def test_weighted_sample_bias_follows_weights(spark):
    """A heavy item must be selected far more often than a light one
    across independent salts (probabilistic contract, not just shape)."""
    from astro_sdk_spark.functions.sampling import weighted_sample_per_group

    rows = [(i, 100 if i == 0 else 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    hits = 0
    for s in range(20):
        sel = {r["doc_id"] for r in weighted_sample_per_group(
            df, k=5, weight_col="w", salt=str(s)
        ).collect()}
        hits += 0 in sel
    assert hits >= 15  # P(select) ≈ 1 for w=100 vs 49 × w=1, k=5


def test_weighted_sample_validation(spark):
    import pytest

    from astro_sdk_spark.functions.sampling import weighted_sample_per_group

    df = spark.createDataFrame([(1, 1)], "doc_id long, w long")
    with pytest.raises(ValueError, match="k must"):
        weighted_sample_per_group(df, k=0, weight_col="w")
    with pytest.raises(ValueError, match="hash_fn"):
        weighted_sample_per_group(df, k=1, weight_col="w", hash_fn="crc")


# ---------------------------------------------------------------------------
# leakage_safe_split (split + cross-boundary decontamination)


def test_leakage_safe_split_drops_train_side_only(spark):
    from astro_sdk_spark.functions.sampling import leakage_safe_split

    # craft a near-dup pair that straddles the boundary: same long text,
    # two ids — whichever lands in test forces the train twin to drop
    twin = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    uniq = [f"document number {i} totally unique content piece {i*7}" for i in range(30)]
    rows = [(i, t) for i, t in enumerate(uniq)] + [(500, twin), (501, twin)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # salt "x2" puts doc 500 in train and its twin 501 in test (md5
    # buckets 500+"x2" < 5000 <= 501+"x2") — a guaranteed straddle
    out = leakage_safe_split(
        df, weights={"train": 0.5, "test": 0.5}, salt="x2", threshold=0.5
    )
    labels = {r["doc_id"]: r["split"] for r in out.collect()}
    # the train twin of a cross-boundary near-dup pair is dropped
    assert labels[500] == "dropped" and labels[501] == "test"
    # every doc got a label from {train, test, dropped}
    assert set(labels.values()) <= {"train", "test", "dropped"}


def test_leakage_safe_split_requires_train(spark):
    import pytest

    from astro_sdk_spark.functions.sampling import leakage_safe_split

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="train"):
        leakage_safe_split(df, weights={"a": 0.5, "b": 0.5})


def test_leakage_safe_split_append_stable_membership(spark):
    """Adding new docs never moves existing docs between train/test
    (dropped can change only if a NEW holdout doc collides)."""
    from astro_sdk_spark.functions.sampling import leakage_safe_split

    base = [(i, f"unique content item {i} with words {i*3}") for i in range(40)]
    df1 = spark.createDataFrame(base, "doc_id long, text string")
    df2 = spark.createDataFrame(
        base + [(1000, "entirely new and unrelated text block")],
        "doc_id long, text string",
    )
    l1 = {r["doc_id"]: r["split"] for r in leakage_safe_split(df1, salt="s2").collect()}
    l2 = {r["doc_id"]: r["split"] for r in leakage_safe_split(df2, salt="s2").collect()}
    for k in l1:
        assert l1[k] == l2[k]


def test_temperature_rates_upweights_low_resource(spark):
    from astro_sdk_spark.functions.sampling import temperature_rates

    rows = [("big",)] * 900 + [("small",)] * 100
    df = spark.createDataFrame(rows, "lang string")
    out = {r.lang: r for r in temperature_rates(df, budget=1000, alpha=0.5).collect()}
    # sqrt flattening: small gets sqrt(100)/(sqrt(900)+sqrt(100)) = 25%
    assert out["small"].rate == 0.25 and out["big"].rate == 0.75
    assert out["small"].alloc == 250 and out["big"].alloc == 750
    # proportional baseline for contrast (alpha=1 via pow path)
    prop = {r.lang: r for r in temperature_rates(df, budget=1000, alpha=1.0).collect()}
    assert prop["small"].alloc == 100


def test_temperature_rates_validates(spark):
    import pytest as _pytest

    from astro_sdk_spark.functions.sampling import temperature_rates

    df = spark.createDataFrame([("x",)], "lang string")
    with _pytest.raises(ValueError, match="budget"):
        temperature_rates(df, budget=0)
    with _pytest.raises(ValueError, match="alpha"):
        temperature_rates(df, budget=10, alpha=1.5)


def test_temperature_rates_size_col(spark):
    """Budgeting in characters instead of documents: weights follow the
    summed sizes, not row counts."""
    from astro_sdk_spark.functions.sampling import temperature_rates

    rows = [("big", 100)] * 4 + [("small", 25)]  # 400 vs 25 chars
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    out = {r.lang: r for r in temperature_rates(
        df, budget=100, alpha=0.5, size_col="n_chars"
    ).collect()}
    assert out["big"].corpus_size == 400 and out["small"].corpus_size == 25
    # sqrt(400)=20, sqrt(25)=5 -> big 80%, small 20%
    assert out["big"].rate == 0.8 and out["small"].alloc == 20
