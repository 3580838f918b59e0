"""Adversarial-skew volume tests: a corpus where ONE document body repeats
thousands of times — the degenerate case that makes uncapped LSH quadratic
(every copy shares every band bucket → cap²·copies² pairs) and that the
bucket_cap / exact-reps-first design exists to absorb.

These are volume tests, not toys: 5k identical docs + engineered near-dups
must complete quickly and produce exactly the documented semantics.
"""

import pytest


@pytest.fixture(scope="module")
def skewed_corpus(spark):
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(5000)]
    # engineered near-dup pair (distinct from the boilerplate cluster)
    rows.append((9001, "completely different text about distributed systems and shuffles"))
    rows.append((9002, "completely different text about distributed systems and shuffle"))
    # a loner
    rows.append((9003, "nothing like anything else in this corpus whatsoever"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_bucket_cap_absorbs_identical_flood(spark, skewed_corpus):
    """With bucket_cap, the 5000-copy mega-bucket is dropped from pair
    expansion (exact dups are the exact_dedup pass's job — documented in
    _bucket_pairs) while genuine near-dups elsewhere still surface."""
    from astro_sdk_spark.functions.dedup import minhash_near_dup

    pairs = minhash_near_dup(
        skewed_corpus, threshold=0.5, bucket_cap=500
    ).collect()
    ids = {(r.id_a, r.id_b) for r in pairs}
    assert (9001, 9002) in ids
    # no pair from the flooded cluster leaked through the cap
    assert not any(a < 5000 and b < 5000 for a, b in ids)


def test_dedup_corpus_keeps_one_of_identical_flood(spark, skewed_corpus):
    """dedup_corpus runs exact-reps FIRST, so the 5000-copy cluster
    collapses to min-id before LSH ever sees it — keep-list = one rep of
    the flood + near-dup winner + loner."""
    from astro_sdk_spark.functions.dedup import dedup_corpus

    kept = {r.doc_id for r in dedup_corpus(skewed_corpus, threshold=0.5).collect()}
    assert 0 in kept and not any(1 <= i < 5000 for i in kept)
    assert 9001 in kept and 9002 not in kept  # min-id wins the near-dup pair
    assert 9003 in kept
    assert len(kept) == 3


def test_jaccard_join_pre_dedup_absorbs_identical_flood(spark, skewed_corpus):
    """pre_dedup + expand=False runs the exact prefix join over the 3
    distinct texts instead of 5003 docs: the flood never reaches the
    candidate join. Representative-level output = the one genuine
    near-dup pair (the 5000-copy text has no τ≥0.5 neighbor)."""
    from astro_sdk_spark.functions.fuzzy import jaccard_join

    pairs = jaccard_join(
        skewed_corpus, threshold=0.5, pre_dedup=True, expand=False
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(9001, 9002)}
