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
