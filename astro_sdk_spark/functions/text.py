"""Text analysis for training-data pipelines: token stats, quality scoring,
language-ID, document fingerprinting.

No reference counterpart (extensions mandated alongside SURVEY §2).
Everything here is built-in-function compositions (JVM-side, codegen) —
no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_WS = " "


def token_count(text) -> Column:
    """Whitespace token count. Empty string counts as 1 ('' token) to match
    split semantics across engines; callers may zero it with when()."""
    return F.size(F.split(text, _WS))


def distinct_token_count(text) -> Column:
    return F.size(F.array_distinct(F.split(text, _WS)))


def type_token_ratio(text) -> Column:
    """Distinct/total tokens — a standard lexical-diversity quality signal."""
    return distinct_token_count(text) / token_count(text)


def avg_token_length(text) -> Column:
    """(chars - separators) / tokens."""
    n = token_count(text)
    return (F.length(text) - (n - F.lit(1))) / n


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics in one projection pass."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars_actual"),
        token_count(t).alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct_tokens"),
        F.round(type_token_ratio(t), 4).alias("ttr"),
        F.round(avg_token_length(t), 4).alias("avg_token_len"),
    )


# A small deterministic English stopword list for quality scoring.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def stopword_ratio(text, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords — array built-ins only."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    toks = F.split(text, _WS)
    n_stop = F.size(F.filter(toks, lambda tkn: F.array_contains(sw, tkn)))
    return n_stop / F.size(toks)


def quality_score_col(text) -> Column:
    """Composite quality score in [0,1] as a single Column expression:
    length band + lexical diversity + stopword presence (a
    Gopher-rules-style heuristic filter). Usable directly in filters
    (e.g. the streaming clean-ingest quality gate) without a join."""
    n_tok = token_count(text)
    length_ok = (n_tok >= 5) & (n_tok <= 100000)
    ttr = type_token_ratio(text)
    sw = stopword_ratio(text)
    return (
        length_ok.cast("double") * 0.4
        + F.least(ttr * 2, F.lit(1.0)) * 0.3
        + F.least(sw * 10, F.lit(1.0)) * 0.3
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality diagnostics; see :func:`quality_score_col`."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        F.round(type_token_ratio(t), 4).alias("ttr"),
        F.round(stopword_ratio(t), 4).alias("stopword_ratio"),
        F.round(quality_score_col(t), 4).alias("quality_score"),
    )


# Gopher quality rules (Rae et al., "Scaling Language Models: ... Gopher",
# arXiv:2112.11446, Appendix A1.1): the standard pre-training document
# filter. Stopword list per the paper.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-rules document filter: per-document quality metrics plus the
    composite keep/drop verdict, one shuffle-free projection pass.

    Rules (defaults are the paper's): word count in [50, 100k]; mean word
    length in [3, 10]; '#'/ellipsis symbols ≤ 0.1 per word; < 90% of lines
    bullet-led; ≤ 30% of lines ellipsis-terminated; ≥ 80% of words contain
    an alphabetic character; ≥ 2 stopword occurrences. Words are
    whitespace tokens of the lowercased, space-collapsed text (empty text
    counts 1 empty word — the :func:`token_count` convention); line rules
    read the RAW line structure before whitespace collapsing.

    Scale shape: pure projection (no shuffle, no UDF) — line/word
    fractions are array built-ins and counting is ``length`` arithmetic,
    so the filter runs at scan speed and composes with any downstream
    op. Returns ``(id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_frac, n_stop, passes)``."""
    t = F.col(text_col)
    # collapse THEN trim: trim() strips spaces only, so a leading newline
    # would otherwise survive collapsing as a leading space → empty word
    norm = F.trim(F.regexp_replace(F.lower(t), r"\s+", " "))
    words = F.split(norm, _WS)
    n_words = F.size(words)
    n_chars = F.length(F.replace(norm, F.lit(" "), F.lit("")))
    mean_wl = n_chars / n_words
    n_hash = F.length(norm) - F.length(F.replace(norm, F.lit("#"), F.lit("")))
    n_uni_ell = F.length(norm) - F.length(F.replace(norm, F.lit("…"), F.lit("")))
    n_dot_ell = (
        F.length(norm) - F.length(F.replace(norm, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_uni_ell + n_dot_ell) / n_words
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.ltrim(ln).startswith("-")
            | F.ltrim(ln).startswith("*")
            | F.ltrim(ln).startswith("•"),
        )
    )
    n_ell_end = F.size(
        F.filter(
            lines,
            lambda ln: F.rtrim(ln).endswith("...") | F.rtrim(ln).endswith("…"),
        )
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    bullet_frac = n_bullet / n_lines
    ellipsis_frac = n_ell_end / n_lines
    alpha_frac = n_alpha / n_words
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (n_stop >= min_stopwords)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(bullet_frac, 4).alias("bullet_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_frac"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        n_stop.alias("n_stop"),
        passes.alias("passes"),
    )


# Language-ID: tiny per-language marker-token table (n-gram heuristic).
# Deterministic and fully JVM-side; a real model would slot in as a
# pandas_udf with the same output contract.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
    "zh": ["的", "是", "了", "在"],
}


def lang_id(text) -> Column:
    """Best-scoring language by marker-token hits; 'und' when no marker."""
    toks = F.split(text, _WS)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda tkn: F.array_contains(marker_arr, tkn)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text, bits: int = 64) -> Column:
    """Stable document fingerprint via xxhash64 of normalized text (rolling-
    hash replacement — xxhash64 is Spark-native and shuffle-friendly)."""
    normalized = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.xxhash64(normalized)


def bpe_ish_token_count(text) -> Column:
    """Sub-word-ish token estimate: words + punctuation marks counted
    separately (a BPE-like regex tokenizer, built-ins only)."""
    words = F.size(F.split(F.trim(text), r"\s+"))
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return words + punct


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Per-document top-``top_n`` terms by TF-IDF — the standard keyword
    extraction / document-signature pass. ``tfidf = tf · ln(N / df_t)``
    with raw term counts (no length normalization — rank order within a
    document is unchanged by it) and unsmoothed IDF (a term in every
    document scores exactly 0).

    Returns ``(id_col, term, tf, tfidf, rank)``, ``rank`` 1..top_n per
    document, ties broken on term.

    Scale shape: tokenize+explode is map-side; then groupBy (doc, term)
    for tf; document frequency is ``tf.groupBy(term).count()`` joined back
    on term — partial aggregation means a stopword term (present in ~every
    document) ships one row per map partition instead of funnelling every
    (doc, stopword) row into a single window task, and AQE skew-join can
    split the hot term's probe partition on the join back; a window over
    doc for the final rank. The corpus document count N is a one-row
    aggregate broadcast into the projection — never a driver collect
    inside the plan."""
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    terms = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_dft"))
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("_n").cast("double") / F.col("_dft")),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def lm_score(
    corpus: DataFrame,
    docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
    round_digits: int = 4,
    broadcast_model: bool | None = None,
) -> DataFrame:
    """Language-model quality scoring, CCNet-style (Wenzek et al. 2020):
    fit a unigram model with add-k smoothing on ``corpus`` (the reference
    text — CCNet uses Wikipedia), then score ``docs`` (default: the corpus
    itself) by mean token log-probability. Low-probability documents are
    gibberish/boilerplate; high are reference-like. Returns
    ``(id_col, n_tokens, avg_logprob, perplexity)`` with
    ``perplexity = exp(-avg_logprob)``.

    Model: ``P(w) = (c(w)+k) / (T + k·(V+1))`` — unseen tokens take the
    ``c=0`` slot. (CCNet's KenLM is a 5-gram; the unigram keeps the
    operator closed over built-ins — same pipeline shape, pluggable
    numerator.)

    Scale shape: the model is a groupBy(term) count — one shuffle of
    corpus tokens; scoring joins doc tokens against the model on term —
    a Zipf-skewed key, so the model side is broadcast-hinted by default
    when scoring the corpus against itself (the vocabulary is
    aggregate-sized, and a hash join sidesteps hot-token shuffle skew
    entirely); pass ``broadcast_model=False`` for an open-vocabulary
    corpus too large to broadcast (AQE skew-join then handles the hot
    terms), or ``True`` to force the hint. Plus one groupBy(doc). The
    scalar normalizers (T, V) ride in as a one-row broadcast aggregate,
    never a driver collect."""
    if broadcast_model is None:
        broadcast_model = docs is None
    if docs is None:
        docs = corpus

    def _toks(df: DataFrame):
        norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
        return F.split(norm, " ")

    model = (
        corpus.select(F.explode(_toks(corpus)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    totals = model.agg(
        F.sum("_c").alias("_T"), F.count(F.lit(1)).alias("_V")
    )
    doc_terms = docs.select(F.col(id_col), F.explode(_toks(docs)).alias("term"))
    model_side = F.broadcast(model) if broadcast_model else model
    scored = (
        doc_terms.join(model_side, on="term", how="left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("_c"), F.lit(0)) + F.lit(add_k))
                / (F.col("_T") + F.lit(add_k) * (F.col("_V") + 1))
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("_lp"), round_digits).alias("avg_logprob"),
        F.round(F.exp(-F.avg("_lp")), round_digits).alias("perplexity"),
    )


def bigram_lm_score(
    corpus: DataFrame,
    docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    add_k: float = 1.0,
    round_digits: int = 4,
    broadcast_model: bool | None = None,
) -> DataFrame:
    """Bigram LM quality scoring with Stupid Backoff (Brants et al.,
    "Large Language Models in Machine Translation", EMNLP 2007 §4) — the
    smoothing designed FOR distributed corpus-scale LMs: no discount
    bookkeeping, no normalization pass, just

        S(w | v) = count(vw) / count(v)            if count(vw) > 0
                 = α · S(w)                         otherwise
        S(w)     = (count(w) + k) / (T + k·(V+1))   (the lm_score unigram)

    The first token of a document is unigram-scored; every later token is
    scored through the backoff chain. Returns ``(id, n_tokens,
    avg_logprob, perplexity)`` — drop-in beside :func:`lm_score`, one
    order of context stronger (repetitive/boilerplate text shows up much
    harder in bigram space).

    Scale shape: two model tables — groupBy(term) and groupBy(prev, term)
    counts, both ONE partial-aggregated shuffle over corpus tokens; the
    bigram table is Zipf-concentrated and broadcast-hinted by default for
    self-scoring (pass ``broadcast_model=False`` for open-domain corpora
    — AQE then handles hot-bigram skew in the shuffle join). Scoring is
    three left joins + one groupBy(doc); position/prev extraction is a
    generator projection (posexplode + element_at), no per-doc window."""
    if broadcast_model is None:
        broadcast_model = docs is None
    if docs is None:
        docs = corpus

    def _positions(df: DataFrame):
        norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
        base = df.select(F.col(id_col), F.split(norm, " ").alias("_tk"))
        return base.select(
            F.col(id_col), "_tk", F.posexplode("_tk").alias("_p", "term")
        ).select(
            F.col(id_col),
            "term",
            F.when(F.col("_p") >= 1, F.element_at("_tk", F.col("_p"))).alias("prev"),
        )

    corpus_pos = _positions(corpus)
    uni = corpus_pos.groupBy("term").agg(F.count(F.lit(1)).alias("_c1"))
    tot = uni.agg(F.sum("_c1").alias("_T"), F.count(F.lit(1)).alias("_V"))
    bi = (
        corpus_pos.filter(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.count(F.lit(1)).alias("_c2"))
    )
    uni_side = F.broadcast(uni) if broadcast_model else uni
    bi_side = F.broadcast(bi) if broadcast_model else bi

    doc_pos = _positions(docs)
    k = float(add_k)
    denom = F.col("_T") + F.lit(k) * (F.col("_V") + 1)
    uni_num = F.coalesce(F.col("_c1t"), F.lit(0)) + F.lit(k)
    lp = (
        F.when(F.col("_c2").isNotNull(), F.log(F.col("_c2") / F.col("_c1p")))
        .when(F.col("prev").isNotNull(), F.log(F.lit(float(alpha)) * uni_num / denom))
        .otherwise(F.log(uni_num / denom))
    )
    scored = (
        doc_pos.join(bi_side, ["prev", "term"], "left")
        .join(uni_side.withColumnRenamed("_c1", "_c1t"), "term", "left")
        .join(
            uni_side.select(
                F.col("term").alias("prev"), F.col("_c1").alias("_c1p")
            ),
            "prev",
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select(F.col(id_col), lp.alias("_lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("_lp"), round_digits).alias("avg_logprob"),
        F.round(F.exp(-F.avg("_lp")), round_digits).alias("perplexity"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    context-window preparation for RAG indexing and fixed-length
    pre-training examples (each chunk carries ``overlap_tokens`` of left
    context so no boundary information is lost).

    Windows start every ``stride = chunk_tokens − overlap_tokens`` tokens
    and the final window may be short; output is one row per chunk:
    ``(id, chunk_id, chunk_text, chunk_token_count)`` with ``chunk_id``
    dense from 0 in document order.

    Scale shape: a pure generator projection — split / sequence /
    posexplode / slice are all built-ins, no shuffle, no UDF; chunking
    100 TB is a single map stage whose output partitioning follows the
    input (chunks of one document stay in one partition, which is what
    downstream per-chunk embedding batches want). Chunk geometry is a
    row-local decision, so the op is append-stable and streaming-safe.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError(
            f"overlap_tokens ({overlap_tokens}) must be < chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap_tokens
    base = df.select(F.col(id_col), F.split(F.col(text_col), _WS).alias("_tk"))
    starts = F.sequence(F.lit(0), F.size("_tk") - 1, F.lit(stride))
    exploded = base.select(
        F.col(id_col), F.col("_tk"), F.posexplode(starts).alias("chunk_id", "_st")
    )
    window = F.slice(F.col("_tk"), F.col("_st") + 1, F.lit(chunk_tokens))
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.array_join(window, _WS).alias("chunk_text"),
        F.size(window).alias("chunk_token_count"),
    )
