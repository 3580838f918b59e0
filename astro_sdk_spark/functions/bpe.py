"""Byte-pair-encoding vocabulary training and application over a corpus.

BPE (Sennrich et al. 2016, arXiv:1508.07909) is the standard subword
tokenizer-training algorithm for LLM pipelines. Its two phases have very
different scale profiles, and the implementation splits them accordingly:

- **word-frequency counting** is corpus-sized (the 100 TB part): one
  codegen projection (lower → whitespace split → explode) plus one
  partial-aggregatable ``groupBy(word).count()`` shuffle — identical in
  shape to the tf-idf document-frequency pass;
- **the merge loop** operates on the *distinct-word frequency table*,
  which is bounded (Heaps' law; and explicitly capped at ``max_words``
  rows ≈ a few MB) and strictly sequential — merge k+1's pair counts
  depend on merge k. It runs on the driver over the collected counts,
  the same contractually-bounded-collect pattern as the PQ codebooks
  (pq.py) and k-means partials (similarity.py). Distributing the loop
  would pay 2 shuffles per merge × 32k merges over a table that fits
  in memory — the wrong trade at every scale.

Symbols are strings; a word is its code points plus a terminal ``</w>``
marker, and a merge rewrites every left-to-right non-overlapping
occurrence of the pair (the greedy scan every reference implementation
uses). Ties in pair frequency break lexicographically so training is
deterministic — the property that lets ``q_bpe_train``'s DuckDB oracle
replicate whole merge rounds in SQL.

``apply_bpe`` (encoding) is distributed: an Arrow-batched pandas
iterator applies the trained merge ranks per word with a per-batch word
cache — the standard rank-priority encode, Python because real
tokenizers are (the merge table is a broadcast closure, the scan is
embarrassingly parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_bpe", "apply_bpe", "merges_df", "bpe_vocab", "encode_ids"]

END = "</w>"


def _word_counts(df: DataFrame, text_col: str, lowercase: bool):
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = F.split(F.trim(F.regexp_replace(t, r"\s+", " ")), " ")
    return (
        df.select(F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    max_words: int = 50_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list [(left, right), ...].

    ``max_words`` caps the driver-side vocabulary at the most frequent
    distinct words (deterministic cut: count desc, word asc) — rare-word
    truncation barely moves pair statistics and bounds driver memory."""
    rows = (
        _word_counts(df, text_col, lowercase)
        .orderBy(F.desc("count"), "word")
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        vocab[tuple(r.word) + (END,)] = r["count"]

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        left, right = best
        joined = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if i < n - 1 and syms[i] == left and syms[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Merge list → DataFrame (merge_rank, lhs, rhs) — the persistable
    artifact (saveAsTable next to the model tables)."""
    return spark.createDataFrame(
        [(i + 1, l, r) for i, (l, r) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string",
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    output: str = "n_tokens",
) -> DataFrame:
    """Encode every document with a trained merge list.

    ``output="n_tokens"`` → (id, n_bpe_tokens); ``output="tokens"`` →
    (id, tokens array<string>). Encoding applies merges in rank order per
    word (training-equivalent greedy scans), memoized per distinct word
    within each Arrow batch — web text repeats words heavily, so the
    per-batch cache turns the merge loop into a dict lookup for the
    overwhelming majority of tokens."""
    if output not in ("n_tokens", "tokens"):
        raise ValueError(f"output must be n_tokens|tokens, got {output!r}")
    rank = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [END]
        while len(syms) > 1:
            # lowest-rank applicable merge (rank-priority encode)
            best_i = -1
            best_rank = len(rank)
            for i in range(len(syms) - 1):
                rk = rank.get((syms[i], syms[i + 1]), None)
                if rk is not None and rk < best_rank:
                    best_rank, best_i = rk, i
            if best_i < 0:
                break
            left, right = merges[best_rank]
            joined = left + right
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if i < n - 1 and syms[i] == left and syms[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    id_type = dict(df.dtypes)[id_col]

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, outs = [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                t = text.lower() if lowercase else text
                for w in t.split():
                    toks.extend(encode_word(w, cache))
                ids.append(rid)
                outs.append(len(toks) if output == "n_tokens" else toks)
            col = "n_bpe_tokens" if output == "n_tokens" else "tokens"
            yield pd.DataFrame({id_col: ids, col: outs})

    out_type = "n_bpe_tokens int" if output == "n_tokens" else "tokens array<string>"
    return df.select(id_col, text_col).mapInPandas(
        run, f"`{id_col}` {id_type}, {out_type}"
    )


def bpe_vocab(
    merges: list[tuple[str, str]], alphabet: list[str] | None = None
) -> list[str]:
    """Deterministic token → id table: base alphabet (sorted; ASCII
    printable + ``</w>`` by default) followed by each merge's joined
    symbol in rank order — the GPT-2-style convention where a merge's
    token id is fixed by its training rank. Returns the token list
    (index = id)."""
    if alphabet is None:
        alphabet = [chr(c) for c in range(32, 127)]
    base = sorted(set(alphabet)) + [END]
    seen = set(base)
    out = list(base)
    for left, right in merges:
        tok = left + right
        if tok not in seen:
            seen.add(tok)
            out.append(tok)
    return out


def encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    unk_id: int | None = None,
) -> DataFrame:
    """(id, token_ids array<int>): the model-input encoding. Tokens
    outside the vocabulary map to ``unk_id`` (default: one past the
    vocab, the conventional <unk> slot). The token→id lookup stays
    JVM-side either way: a literal map expression for small vocabularies,
    or — for real tokenizer sizes (32k+), where tens of thousands of
    plan literals would bloat codegen — a posexplode → broadcast-join →
    re-assemble pipeline over a vocab DataFrame."""
    vocab = vocab if vocab is not None else bpe_vocab(merges)
    unk = len(vocab) if unk_id is None else unk_id
    toks = apply_bpe(
        df, merges, text_col=text_col, id_col=id_col,
        lowercase=lowercase, output="tokens",
    )
    if len(vocab) <= 1024:
        lookup = F.create_map(
            *[x for i, t in enumerate(vocab) for x in (F.lit(t), F.lit(i))]
        )
        return toks.select(
            id_col,
            F.transform(
                F.col("tokens"),
                lambda t: F.coalesce(
                    F.element_at(lookup, t), F.lit(unk)
                ).cast("int"),
            ).alias("token_ids"),
        )
    spark = df.sparkSession
    vdf = spark.createDataFrame(
        [(t, i) for i, t in enumerate(vocab)], "_tok string, _tid int"
    )
    exploded = toks.select(
        id_col, F.posexplode("tokens").alias("_pos", "_tok")
    )
    mapped = (
        exploded.join(F.broadcast(vdf), "_tok", "left")
        .withColumn("_tid", F.coalesce("_tid", F.lit(unk)).cast("int"))
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_tid")))
                ),
                lambda s: s["_tid"],
            ).alias("token_ids")
        )
    )
    # empty documents explode to zero rows — restore them with [] so both
    # lookup paths agree row-for-row
    return (
        toks.select(id_col)
        .join(mapped, id_col, "left")
        .withColumn(
            "token_ids",
            F.coalesce("token_ids", F.array().cast("array<int>")),
        )
    )
