"""Text-quality filters: Gopher-rules verdicts on engineered documents."""


def test_gopher_rules_verdicts(spark):
    """Engineered documents hit each rule: a clean doc passes; bullet
    spam, symbol spam, and too-short docs fail their specific rule."""
    from astro_sdk_spark.functions.text import gopher_rules

    good = " ".join(
        "the quick brown fox jumps over and over with some of that text"
        for _ in range(5)
    )
    bullets = "\n".join(f"- item {i}" for i in range(20))
    hashy = " ".join("#tag" for _ in range(60))
    rows = [
        (1, good),
        (2, bullets),
        (3, hashy),
        (4, "too short to pass the word count rule"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[1].passes
    assert not out[2].passes and out[2].bullet_frac == 1.0
    assert not out[3].passes and out[3].symbol_ratio >= 1.0
    assert not out[4].passes and out[4].n_words < 50


def _r4(x):
    """Spark/DuckDB round() is HALF_UP; Python's is banker's — match."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def _py_gopher(text):
    """Independent Python reference of the gopher_rules metrics."""
    import re

    norm = re.sub(r"\s+", " ", text.lower()).strip()
    words = norm.split(" ")
    n_words = len(words)
    n_chars = len(norm.replace(" ", ""))
    mean_wl = n_chars / n_words
    n_sym = norm.count("#") + norm.count("…") + norm.count("...")
    lines = text.split("\n")
    n_bullet = sum(
        1 for ln in lines if ln.lstrip(" ").startswith(("-", "*", "•"))
    )
    n_ell = sum(
        1 for ln in lines if ln.rstrip(" ").endswith(("...", "…"))
    )
    n_alpha = sum(1 for w in words if re.search("[a-z]", w))
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    n_stop = sum(1 for w in words if w in stops)
    return {
        "n_words": n_words,
        "mean_word_len": _r4(mean_wl),
        "symbol_ratio": _r4(n_sym / n_words),
        "bullet_frac": _r4(n_bullet / len(lines)),
        "ellipsis_frac": _r4(n_ell / len(lines)),
        "alpha_frac": _r4(n_alpha / n_words),
        "n_stop": n_stop,
    }


def test_gopher_rules_matches_python_reference_on_random_docs(spark):
    """150 randomized documents (bullets, symbols, unicode ellipses,
    stopword mixes, multi-space runs): every metric must equal an
    independent Python reimplementation."""
    import random

    rng = random.Random(7)
    vocab = ["the", "fox", "run", "#tag", "data", "of", "x1", "…", "be", "zz"]
    docs = []
    for i in range(150):
        lines = []
        for _ in range(rng.randint(1, 6)):
            toks = [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
            line = (" " * rng.randint(1, 3)).join(toks)
            if rng.random() < 0.3:
                line = "- " + line
            if rng.random() < 0.2:
                line += "..."
            lines.append(line)
        docs.append((i, "\n".join(lines)))
    from astro_sdk_spark.functions.text import gopher_rules

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    for i, text in docs:
        ref = _py_gopher(text)
        row = got[i]
        for k, v in ref.items():
            assert getattr(row, k) == v, (i, k, getattr(row, k), v, text)


# ---------------------------------------------------------------------------
# bigram_lm_score (Stupid Backoff)


def test_bigram_lm_prefers_seen_transitions(spark):
    from astro_sdk_spark.functions.text import bigram_lm_score

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(100, "the cat sat on the mat"),  # every bigram seen
         (101, "mat the on sat cat the")],  # same unigrams, unseen bigrams
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_score(corpus, docs).collect()}
    assert out[100]["avg_logprob"] > out[101]["avg_logprob"]
    assert out[100]["perplexity"] < out[101]["perplexity"]
    assert out[100]["n_tokens"] == 6


def test_bigram_lm_single_token_doc_uses_unigram(spark):
    from astro_sdk_spark.functions.text import bigram_lm_score

    import math

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_lm_score(corpus).collect()}
    # doc 2: one token, no bigram context → pure unigram path
    # uni: alpha=2, beta=1, T=3, V=2 → S(alpha) = (2+1)/(3+3) = 0.5
    assert out[2]["n_tokens"] == 1
    assert out[2]["avg_logprob"] == round(math.log(0.5), 4)


def test_bigram_lm_backoff_branch_exact(spark):
    from astro_sdk_spark.functions.text import bigram_lm_score

    import math

    corpus = spark.createDataFrame(
        [(1, "a b"), (2, "b a")], "doc_id long, text string"
    )
    docs = spark.createDataFrame([(9, "a a")], "doc_id long, text string")
    out = bigram_lm_score(corpus, docs, broadcast_model=True).collect()[0]
    # uni: a=2, b=2, T=4, V=2; S(a) = (2+1)/(4+3) = 3/7
    # pos1: unigram ln(3/7); pos2: bigram "a a" unseen → ln(0.4 * 3/7)
    expected = (math.log(3 / 7) + math.log(0.4 * 3 / 7)) / 2
    assert out["avg_logprob"] == round(expected, 4)
