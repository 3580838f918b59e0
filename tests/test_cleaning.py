"""Corpus-cleaning operators: PII redaction, decontamination, repetition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from astro_sdk_spark.functions.cleaning import (
    decontaminate,
    redact_pii,
    repetition_stats,
)


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "mail me at alice@example.com or bob.smith@corp.co.uk thanks"),
        (2, "server at 192.168.1.100 and 10.0.0.1 are up"),
        (3, "ssn is 123-45-6789 call +1 555 123 4567"),
        (4, "nothing sensitive here at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_counts_and_replaces(pii_docs):
    out = {r.doc_id: r for r in redact_pii(pii_docs).collect()}
    assert out[1].n_email == 2 and "[email]" in out[1].text_redacted
    assert "alice@example.com" not in out[1].text_redacted
    assert out[2].n_ipv4 == 2 and out[2].text_redacted.count("[ipv4]") == 2
    assert out[3].n_ssn == 1 and out[3].n_phone == 1
    assert "[ssn]" in out[3].text_redacted and "[phone]" in out[3].text_redacted
    assert out[4].n_pii == 0 and out[4].text_redacted == "nothing sensitive here at all"
    assert out[1].n_pii == 2 and out[3].n_pii == 2


def test_redact_pii_custom_kinds_and_token(pii_docs):
    out = {
        r.doc_id: r
        for r in redact_pii(pii_docs, kinds=("email",), token="<PII>").collect()
    }
    assert "<PII>" in out[1].text_redacted
    # ipv4 untouched when not requested
    assert "192.168.1.100" in out[2].text_redacted
    with pytest.raises(ValueError, match="Unknown PII kinds"):
        redact_pii(pii_docs, kinds=("email", "iban"))


def test_decontaminate_flag_and_drop(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about gardening tips"),
            (3, "partial overlap quick brown fox appears here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox is a benchmark sentence")],
        "doc_id long, text string",
    )
    flags = {r.doc_id: r.n_benchmark_ngrams for r in decontaminate(corpus, bench).collect()}
    assert 1 in flags and 3 in flags and 2 not in flags
    clean = decontaminate(corpus, bench, mode="drop")
    assert {r.doc_id for r in clean.collect()} == {2}
    assert clean.columns == corpus.columns
    with pytest.raises(ValueError, match="flag.*drop"):
        decontaminate(corpus, bench, mode="purge")


def test_decontaminate_min_hits(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma unrelated tail words")], "doc_id long, text string"
    )
    # shares exactly one distinct 3-gram ("alpha beta gamma")
    assert decontaminate(corpus, bench, min_hits=1).count() == 1
    assert decontaminate(corpus, bench, min_hits=2).count() == 0


def test_repetition_stats_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),      # heavy 3-gram repetition
            (2, "one two three four five six seven"),  # no repetition
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    # doc 1: 9 tokens, 3 distinct -> dup_token_frac = 1 - 3/9
    assert out[1].dup_token_frac == pytest.approx(1 - 3 / 9, abs=1e-4)
    # doc 1 grams: 7 total, 3 distinct ("a b c" x3, "b c a" x2, "c a b" x2)
    assert out[1].dup_ngram_frac == pytest.approx(4 / 7, abs=1e-4)
    assert out[1].top_ngram_frac == pytest.approx(3 / 7, abs=1e-4)
    assert out[2].dup_token_frac == 0.0
    assert out[2].dup_ngram_frac == 0.0
    # doc 2: every 3-gram unique -> top is 1 of 5
    assert out[2].top_ngram_frac == pytest.approx(1 / 5, abs=1e-4)


def test_line_dedup_removes_corpus_duplicates(spark):
    from astro_sdk_spark.functions.cleaning import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\ncommon line\ngamma"),
            (2, "common line\ndelta"),         # dup of doc 1's line -> removed
            (3, "common line\ncommon line"),   # fully emptied
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert out[1].text == "alpha beta\ncommon line\ngamma"
    assert out[2].text == "delta" and out[2].n_lines == 2 and out[2].n_kept == 1
    # every input doc survives as a row, even when all its lines were dups
    assert out[3].text == "" and out[3].n_kept == 0


def test_line_dedup_min_chars_keeps_short_lines(spark):
    from astro_sdk_spark.functions.cleaning import line_dedup

    docs = spark.createDataFrame(
        [(1, "x\nlong shared line"), (2, "x\nlong shared line")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs, min_chars=2).collect()}
    # the 1-char line is exempt from dedup in BOTH docs; the long one isn't
    assert out[1].text == "x\nlong shared line"
    assert out[2].text == "x"


def test_line_dedup_custom_delimiter_is_literal(spark):
    from astro_sdk_spark.functions.cleaning import line_dedup

    docs = spark.createDataFrame(
        [(1, "a.b.c"), (2, "b.z")], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in line_dedup(docs, delimiter=".").collect()}
    assert out[1] == "a.b.c" and out[2] == "z"


def test_line_dedup_hot_line_in_every_doc(spark):
    """De-skew regression: one line duplicated across EVERY document (the
    boilerplate case line dedup exists for) must still keep exactly the
    first occurrence, with first-occurrence detection done by a partially-
    aggregatable groupBy(min(struct)) rather than a single-task window."""
    from astro_sdk_spark.functions.cleaning import line_dedup

    n = 200
    docs = spark.createDataFrame(
        [(i, f"unique line {i}\nHome | About | Contact") for i in range(n)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert len(out) == n
    assert out[0].text == "unique line 0\nHome | About | Contact"
    for i in range(1, n):
        assert out[i].text == f"unique line {i}", i
        assert out[i].n_lines == 2 and out[i].n_kept == 1

    # plan assertion: first-occurrence detection is a partial aggregate
    # (map-side combine), not a row_number window over the line text
    plan = line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan or "partial_finalmerge" in plan.lower() or "HashAggregate" in plan
    assert "row_number" not in plan or "windowspecdefinition(_line" not in plan.lower()


def test_decontaminate_no_broadcast_path(spark):
    """Benchmark set too big to broadcast: broadcast_benchmark=False must
    produce identical results through a plain shuffle join, with the
    forced-broadcast hint absent from the plan (run with
    autoBroadcastJoinThreshold=-1 so AQE can't silently re-broadcast)."""
    from astro_sdk_spark.functions.cleaning import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap here at all"),
            (3, "quick brown fox appears in this document too"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        flagged = decontaminate(
            corpus, bench, broadcast_benchmark=False
        )
        rows = {r.doc_id: r.n_benchmark_ngrams for r in flagged.collect()}
        ref = {
            r.doc_id: r.n_benchmark_ngrams
            for r in decontaminate(corpus, bench).collect()
        }
        assert rows == ref and 1 in rows and 2 not in rows
        plan = flagged._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        dropped = decontaminate(
            corpus, bench, mode="drop", broadcast_benchmark=False
        )
        assert {r.doc_id for r in dropped.collect()} == {2}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_line_dedup_matches_bruteforce_reference(spark):
    """Cross-check the distributed first-occurrence logic against a
    sequential reference over a corpus with empty docs, unicode, repeated
    lines inside one doc, and interleaved duplicates across docs."""
    from astro_sdk_spark.functions.cleaning import line_dedup

    corpus = [
        (10, "alpha\nbeta\nalpha"),          # dup inside one doc
        (11, ""),                             # empty doc -> one empty line
        (12, "beta\nγράμμα\ndelta"),         # cross-doc dup of beta
        (13, "γράμμα\nalpha\nepsilon"),      # unicode dup + late alpha
        (14, "zeta"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")

    # sequential reference: first (doc_id, pos) wins, min_chars=1 exempts
    # only lines shorter than 1 char (i.e. empty lines always kept)
    seen, expect = set(), {}
    for doc_id, text in sorted(corpus):
        kept = []
        for pos, line in enumerate(text.split("\n")):
            if len(line) < 1:
                kept.append(line)
            elif line not in seen:
                seen.add(line)
                kept.append(line)
        expect[doc_id] = "\n".join(kept)
    out = {r.doc_id: r.text for r in line_dedup(docs).collect()}
    assert out == expect, (out, expect)


def test_line_dedup_min_chars_zero_no_short_branch(spark):
    from astro_sdk_spark.functions.cleaning import line_dedup

    docs = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "\nb")], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in line_dedup(docs, min_chars=0).collect()}
    # with min_chars=0 even empty lines dedup: doc1 keeps a,"",b; doc2's
    # "" and b are corpus-dups
    assert out[1] == "a\n\nb" and out[2] == ""


def test_substring_dedup_semantics(spark):
    from astro_sdk_spark.functions.cleaning import substring_dedup

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, "zzz one two three four five six seven eight yyy"),
            (3, "short doc"),
            (4, "one   two\tthree four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_dedup(docs, k=8).collect()}
    # doc 1 is the global first occurrence — untouched
    assert out[1].text == "one two three four five six seven eight nine ten"
    assert out[1].n_removed == 0
    # doc 2's embedded 8-token span is removed, flanks survive
    assert out[2].text == "zzz yyy" and out[2].n_removed == 8
    # shorter than k → pass-through
    assert out[3].text == "short doc" and out[3].n_removed == 0
    # doc 4 normalizes to an exact dup of doc 1 → fully removed
    assert out[4].text == "" and out[4].n_removed == 10 and out[4].n_tokens == 10


def test_substring_dedup_hot_gram_partial_agg(spark):
    """A gram repeated in every doc must dedup via a partially-aggregated
    groupBy, not a gram-keyed window (same de-skew contract as
    line_dedup)."""
    from astro_sdk_spark.functions.cleaning import substring_dedup

    n = 100
    boiler = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(i, f"u{i} {boiler}") for i in range(n)], "doc_id long, text string"
    )
    res = substring_dedup(docs, k=8)
    out = {r.doc_id: r for r in res.collect()}
    # doc 0 keeps everything; every later doc keeps only its unique prefix
    # and the tail tokens not covered by a duplicated 8-gram window.
    assert out[0].text == f"u0 {boiler}" and out[0].n_removed == 0
    assert all(out[i].n_removed > 0 for i in range(1, n))

    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(_gram" not in plan.lower()


def test_c4_rules_line_filtering_and_verdicts(spark):
    """Terminal-punct + min-word lines survive; lorem/brace/short pages
    are rejected; clean_text reassembles in original line order."""
    from astro_sdk_spark.functions.cleaning import c4_rules

    good = (
        "This is a perfectly normal first sentence for the page.\n"
        "menu home about\n"
        "Another full sentence with enough words to be kept!\n"
        "Is this a third full sentence with enough words here?\n"
    )
    rows = [
        (1, good),
        (2, "Lorem ipsum dolor sit amet and some more words here too.\n"
            "A second real sentence that would otherwise be kept here.\n"
            "And a third full sentence to clear the sentence floor now."),
        (3, "function f() { return 1; } some page with code in it here."),
        (4, "Too few sentences survive here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_rules(df).collect()}
    assert out[1].keep and out[1].n_lines_kept == 3
    assert "menu home about" not in out[1].clean_text
    assert out[1].clean_text.splitlines()[0].startswith("This is")
    assert not out[2].keep and out[2].has_lorem
    assert not out[3].keep and out[3].has_brace
    assert not out[4].keep and out[4].n_sentences < 3


def test_c4_rules_matches_python_reference_on_random_docs(spark):
    """150 randomized multi-line documents vs an independent Python
    reimplementation of every c4_rules output column."""
    import random
    import re

    rng = random.Random(13)
    vocab = ["alpha", "beta", "the", "run.", "fox!", "ok?", "x", "lorem", "{y}"]
    docs = []
    for i in range(150):
        lines = []
        for _ in range(rng.randint(1, 7)):
            toks = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
            line = (" " * rng.randint(1, 2)).join(toks)
            if rng.random() < 0.4:
                line += rng.choice([".", "!", "?", '"', ""])
            lines.append(line)
        if rng.random() < 0.1:
            lines.append("lorem ipsum dolor")
        docs.append((i, "\n".join(lines)))

    def ref(text):
        lines = text.split("\n")
        kept = [
            ln for ln in lines
            if ln.rstrip(" ").endswith((".", "!", "?", '"'))
            and len(re.sub(r"\s+", " ", ln).strip(" ").split(" ")) >= 5
        ]
        clean = "\n".join(kept)
        n_sent = clean.count(".") + clean.count("!") + clean.count("?")
        has_lorem = "lorem ipsum" in text.lower()
        has_brace = "{" in text
        return {
            "clean_text": clean,
            "n_lines": len(lines),
            "n_lines_kept": len(kept),
            "n_sentences": n_sent,
            "has_lorem": has_lorem,
            "has_brace": has_brace,
            "keep": (not has_lorem) and (not has_brace) and n_sent >= 3,
        }

    from astro_sdk_spark.functions.cleaning import c4_rules

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in c4_rules(df).collect()}
    for i, text in docs:
        exp = ref(text)
        row = got[i]
        for k, v in exp.items():
            assert getattr(row, k) == v, (i, k, getattr(row, k), v, text)


def test_line_dedup_null_text_is_empty_document(spark):
    from astro_sdk_spark.functions.cleaning import line_dedup

    df = spark.createDataFrame(
        [(1, "a\nb"), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in line_dedup(df).collect()}
    assert rows[2].text == "" and rows[2].n_lines == 1
    assert rows[1].text == "a\nb"


# ---------------------------------------------------------------------------
# contamination_score (graded decontamination)


def test_contamination_score_extremes(spark):
    from astro_sdk_spark.functions.cleaning import contamination_score

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # identical
            (2, "completely unrelated words appear in this sentence here"),
            (3, "the quick brown fox went somewhere else entirely today"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in contamination_score(corpus, bench).collect()}
    assert rows[1]["contamination"] == 1.0
    assert rows[2]["contamination"] == 0.0 and rows[2]["n_hits"] == 0
    assert 0.0 < rows[3]["contamination"] < 1.0
    # every corpus doc gets a row, including the zero-hit one
    assert set(rows) == {1, 2, 3}


def test_contamination_score_halfway_pin(spark):
    """Exact p/q half-boundaries must round half-up deterministically:
    1 hit out of 32 distinct 3-grams → 0.03125 → 0.0313 (not banker's
    0.0312)."""
    from astro_sdk_spark.functions.cleaning import contamination_score

    # 34 tokens → 32 distinct 3-grams; benchmark shares exactly the first
    toks = [f"w{i}" for i in range(34)]
    corpus = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, " ".join(toks[:3]) + " zzz qqq rrr")], "doc_id long, text string"
    )
    row = contamination_score(corpus, bench).collect()[0]
    assert row["n_ngrams"] == 32 and row["n_hits"] == 1
    assert row["contamination"] == 0.0313


# ---------------------------------------------------------------------------
# normalize_text (Unicode canonicalization)


def test_normalize_text_composes_and_strips(spark):
    from astro_sdk_spark.functions.cleaning import normalize_text

    decomposed = "cafe\u0301 menu"        # e + combining acute
    with_ctrl = "ab\x07cd\x1fef"                     # BEL + US controls
    df = spark.createDataFrame(
        [(1, decomposed), (2, with_ctrl), (3, "plain ascii"), (4, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert rows[1]["norm_text"] == "café menu"  # precomposed é
    assert rows[1]["changed"] and rows[1]["n_chars_out"] == rows[1]["n_chars_in"] - 1
    assert rows[2]["norm_text"] == "abcdef" and rows[2]["changed"]
    assert rows[3]["norm_text"] == "plain ascii" and not rows[3]["changed"]
    assert rows[4]["norm_text"] is None  # null-safe


def test_normalize_text_nfkc_and_ws(spark):
    from astro_sdk_spark.functions.cleaning import normalize_text

    df = spark.createDataFrame(
        [(1, "ﬁle  name x")],  # ligature fi + double space + NBSP
        "doc_id long, text string",
    )
    row = normalize_text(df, form="NFKC", collapse_whitespace=True).collect()[0]
    assert row["norm_text"] == "file name x"  # ligature expanded, ws collapsed


def test_normalize_text_rejects_bad_form(spark):
    import pytest as _pytest

    from astro_sdk_spark.functions.cleaning import normalize_text

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="normal form"):
        normalize_text(df, form="NFX")


@pytest.fixture(scope="module")
def html_docs(spark):
    rows = [
        (1, '<html><head><script>var x = "<b>no</b>";</script>'
            '<style>h1 { color: blue }</style></head>'
            '<body><h1>Title</h1><p>first para</p><p>second &amp; third</p>'
            '<a href="https://x.test/?a=1&amp;b=2">a link</a></body></html>'),
        (2, "no markup at all, just text"),
        (3, '<p>broken <unclosed and &amp;lt;escaped&amp;gt;</p><br>tail'),
        (4, "<P>UPPER CASE TAGS</P><BR/><SCRIPT>drop()</SCRIPT>done"),
        (5, "spaces\t\tand   runs<br><br><br>collapse"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_strip_html_drops_script_style_and_tags(html_docs):
    from astro_sdk_spark.functions.cleaning import strip_html

    out = {r.doc_id: r for r in strip_html(html_docs).collect()}
    t1 = out[1].plain_text
    assert "no</b>" not in t1 and "color: blue" not in t1
    assert "Title\nfirst para\nsecond & third" in t1
    assert "a link" in t1 and "https://x.test" not in t1
    assert out[1].n_links == 1 and out[1].had_script


def test_strip_html_plain_text_passthrough(html_docs):
    from astro_sdk_spark.functions.cleaning import strip_html

    out = {r.doc_id: r for r in strip_html(html_docs).collect()}
    assert out[2].plain_text == "no markup at all, just text"
    assert out[2].n_links == 0 and not out[2].had_script
    assert out[2].n_chars_in == out[2].n_chars_out


def test_strip_html_entity_decode_is_single_pass(html_docs):
    """'&amp;lt;' must decode to the literal '&lt;', never to '<' — the
    HTML5 single-pass rule the entity ordering pins."""
    from astro_sdk_spark.functions.cleaning import strip_html

    out = {r.doc_id: r for r in strip_html(html_docs).collect()}
    assert "&lt;escaped&gt;" in out[3].plain_text
    # the unclosed '<unclosed ...' tag swallows text up to the next '>'
    assert "broken" in out[3].plain_text


def test_strip_html_case_insensitive_and_collapse(html_docs):
    from astro_sdk_spark.functions.cleaning import strip_html

    out = {r.doc_id: r for r in strip_html(html_docs).collect()}
    # </P> and <BR/> each emit a newline; 2 newlines = paragraph break
    # (only runs of 3+ collapse)
    assert out[4].plain_text == "UPPER CASE TAGS\n\ndone"
    assert "drop()" not in out[4].plain_text
    t5 = out[5].plain_text
    assert "spaces and runs" in t5 and "\n\n\n" not in t5


def test_dedup_lines_in_doc(spark):
    from astro_sdk_spark.functions.cleaning import dedup_lines_in_doc

    rows = [
        (1, "nav\nbody one\nnav\nbody two\nnav"),
        (2, "a\n\nb\n\na"),  # empty lines always kept; dup 'a' dropped
        (3, "unique only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_lines_in_doc(df).collect()}
    assert out[1].text == "nav\nbody one\nbody two"
    assert out[1].n_lines == 5 and out[1].n_kept == 3
    assert out[2].text == "a\n\nb\n"
    assert out[2].n_kept == 4
    assert out[3].text == "unique only" and out[3].n_kept == 1


def test_dedup_lines_in_doc_min_chars_exempts_short(spark):
    from astro_sdk_spark.functions.cleaning import dedup_lines_in_doc

    df = spark.createDataFrame([(1, "ab\nab\nx\nx")], "doc_id long, text string")
    out = dedup_lines_in_doc(df, min_chars=3).collect()[0]
    # every line is under 3 chars -> all kept
    assert out.n_kept == 4 and out.text == "ab\nab\nx\nx"


def test_dedup_lines_in_doc_is_per_document(spark):
    """The same line in two DIFFERENT docs survives in both (corpus-wide
    removal is line_dedup's job)."""
    from astro_sdk_spark.functions.cleaning import dedup_lines_in_doc

    df = spark.createDataFrame(
        [(1, "shared\nown1"), (2, "shared\nown2")], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in dedup_lines_in_doc(df).collect()}
    assert out[1] == "shared\nown1" and out[2] == "shared\nown2"


def test_dedup_lines_in_doc_regex_metachar_delimiter(spark):
    """The delimiter is a LITERAL: '|' must not become regex alternation."""
    from astro_sdk_spark.functions.cleaning import dedup_lines_in_doc

    df = spark.createDataFrame([(1, "nav|body|nav")], "doc_id long, text string")
    out = dedup_lines_in_doc(df, delimiter="|").collect()[0]
    assert out.text == "nav|body" and out.n_lines == 3 and out.n_kept == 2
