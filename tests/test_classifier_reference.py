"""Property test: train_text_classifier/score_text_classifier against an
independent pure-Python reference of the integer-grid GD — random tiny
corpora must score BIT-identically (the fixed-label oracle in queries.py
proves one dataset; this proves the arithmetic contract in general)."""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from astro_sdk_spark.functions.classifier import (
    score_text_classifier,
    train_text_classifier,
)

N_BUCKETS = 64
SCALE = 10**6
LR = 0.5


def _shingles(text: str) -> list[str]:
    """Mirror of dedup.shingles_col(k=2, distinct=False): whitespace-
    normalized lowercase bigrams; <2 tokens → the whole normalized text."""
    norm = re.sub(r"\s+", " ", text.strip().lower())
    toks = norm.split(" ")
    if len(toks) >= 2:
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [norm]


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % N_BUCKETS


def _reference(docs: list[tuple[int, str, int]], n_iters: int) -> dict[int, float]:
    feats = [(i, _bucket(g)) for i, t, _ in docs for g in _shingles(t)]
    y = {i: lab for i, _, lab in docs}
    n = len(docs)
    w: dict[int, int] = {}
    for it in range(n_iters):
        if it == 0:
            resid = {i: SCALE // 2 - y[i] * SCALE for i, _, _ in docs}
        else:
            m = {i: 0 for i, _, _ in docs}
            for i, b in feats:
                m[i] += w.get(b, 0)
            resid = {
                i: math.floor(
                    (1.0 / (1.0 + math.exp(-(mi / float(SCALE)))) - y[i])
                    * float(SCALE)
                    + 0.5
                )
                for i, mi in m.items()
            }
        grad: dict[int, int] = {}
        for i, b in feats:
            grad[b] = grad.get(b, 0) + resid[i]
        for b, gi in grad.items():
            w[b] = w.get(b, 0) - math.floor(LR * gi / n + 0.5)
    scores = {}
    m = {i: 0 for i, _, _ in docs}
    for i, b in feats:
        m[i] += w.get(b, 0)
    for i, mi in m.items():
        sig = 1.0 / (1.0 + math.exp(-(mi / float(SCALE))))
        scores[i] = math.floor(sig * 10000.0 + 0.5) / 10000.0
    return scores


word = st.sampled_from(
    ["cat", "dog", "run", "fast", "spam", "zz", "the", "a", "good", "bad"]
)
doc = st.lists(word, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(doc, st.integers(0, 1)), min_size=2, max_size=12
    )
)
def test_classifier_matches_pure_python_reference(spark, corpus):
    rows = [(i, t, lab) for i, (t, lab) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    w = train_text_classifier(
        df, "y", n_buckets=N_BUCKETS, n_iters=2, lr=LR, hash_fn="md5"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in score_text_classifier(
            df, w, n_buckets=N_BUCKETS, hash_fn="md5"
        ).collect()
    }
    assert got == _reference(rows, n_iters=2)
