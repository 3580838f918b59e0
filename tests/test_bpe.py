"""BPE vocabulary training + encoding (functions/bpe.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.bpe import END, apply_bpe, merges_df, train_bpe


def test_hand_computed_merges(spark):
    # corpus: "low" x5, "lowest" x2  (lowercased already)
    df = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lowest lowest")],
        "doc_id long, text string",
    )
    merges = train_bpe(df, n_merges=4)
    # pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2, ...
    # tie (l,o) vs (o,w) at 7 → lexicographic: ('l','o') first
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # round 3: (low,</w>)=5 wins over (low,e)=2
    assert merges[2] == ("low", END)
    # round 4: (low,e)/(e,s)/(s,t)/(t,</w>) all tie at 2 → ('e','s')
    assert merges[3] == ("e", "s")


def test_training_is_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = train_bpe(docs, n_merges=8)
    b = train_bpe(docs, n_merges=8)
    assert a == b and len(a) == 8


def test_encode_matches_training_segmentation(spark):
    df = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lowest lowest")],
        "doc_id long, text string",
    )
    merges = train_bpe(df, n_merges=4)
    toks = apply_bpe(df, merges, output="tokens")
    got = {r.doc_id: r.tokens for r in toks.collect()}
    # "low" fully merges to one token; "lowest" = low + es + t + </w>
    assert got[1] == ["low</w>"] * 5
    assert got[2] == ["low", "es", "t", END] * 2


def test_encode_unseen_words_fall_back_to_chars(spark):
    train = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    merges = train_bpe(train, n_merges=2)
    test = spark.createDataFrame([(9, "xyz")], "doc_id long, text string")
    got = apply_bpe(test, merges, output="tokens").collect()[0].tokens
    assert got == ["x", "y", "z", END]


def test_n_tokens_output_consistent_with_tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = train_bpe(docs, n_merges=8)
    n = {r.doc_id: r.n_bpe_tokens for r in apply_bpe(docs, merges).collect()}
    t = {r.doc_id: len(r.tokens) for r in apply_bpe(docs, merges, output="tokens").collect()}
    assert n == t and len(n) == 50


def test_more_merges_never_increase_token_count(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    m4 = train_bpe(docs, n_merges=4)
    m12 = train_bpe(docs, n_merges=12)
    assert m12[:4] == m4  # merge list is a prefix-stable sequence
    n4 = apply_bpe(docs, m4).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    n12 = apply_bpe(docs, m12).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert n12 <= n4


def test_merges_df_shape(spark):
    df = merges_df(spark, [("a", "b"), ("ab", "c")])
    rows = df.collect()
    assert [(r.merge_rank, r.lhs, r.rhs) for r in rows] == [
        (1, "a", "b"),
        (2, "ab", "c"),
    ]


def test_max_words_cap_bounds_driver_memory(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = train_bpe(docs, n_merges=4, max_words=50)
    assert len(capped) == 4  # still trains, on the top-50 vocabulary


def test_apply_bpe_output_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_tokens|tokens"):
        apply_bpe(df, [], output="bogus")


def test_vocab_and_encode_ids(spark):
    from astro_sdk_spark.functions.bpe import bpe_vocab, encode_ids

    df = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lowest lowest")],
        "doc_id long, text string",
    )
    merges = train_bpe(df, n_merges=4)
    vocab = bpe_vocab(merges)
    # base alphabet then merges in rank order, no duplicate tokens
    assert vocab[-4:] == ["lo", "low", "low</w>", "es"]
    assert len(vocab) == len(set(vocab))
    got = {r.doc_id: r.token_ids for r in encode_ids(df, merges).collect()}
    assert got[1] == [vocab.index("low</w>")] * 5
    assert [vocab[i] for i in got[2][:4]] == ["low", "es", "t", "</w>"]


def test_encode_ids_unknown_token_maps_to_unk(spark):
    from astro_sdk_spark.functions.bpe import bpe_vocab, encode_ids

    merges = []
    vocab = bpe_vocab(merges, alphabet=["a", "b"])
    test = spark.createDataFrame([(1, "abz")], "doc_id long, text string")
    got = encode_ids(test, merges, vocab=vocab).collect()[0].token_ids
    # a, b known; z unknown -> unk id = len(vocab); </w> known
    assert got == [0, 1, len(vocab), 2]


def test_encode_ids_join_path_matches_map_path(spark):
    """Vocabularies past the literal-map threshold route through the
    broadcast-join pipeline; both paths must agree, including on empty
    documents."""
    from astro_sdk_spark.functions.bpe import bpe_vocab, encode_ids

    df = spark.createDataFrame(
        [(1, "low low lowest"), (2, ""), (3, "xyz low")],
        "doc_id long, text string",
    )
    merges = train_bpe(df.filter("doc_id = 1"), n_merges=3)
    small = bpe_vocab(merges)
    # pad with unused tokens to force the join path (>1024)
    big = small + [f"pad{i}" for i in range(1100)]
    a = {r.doc_id: r.token_ids for r in encode_ids(df, merges, vocab=small).collect()}
    b = {r.doc_id: r.token_ids for r in encode_ids(df, merges, vocab=big).collect()}
    assert a == b
    assert a[2] == []
