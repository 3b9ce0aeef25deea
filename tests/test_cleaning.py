"""C4-style line-cleaning operator tests (operators/cleaning.py):
each dropped-line category, line-order preservation, the doc gate,
and the zero-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from irclogbot_spark.operators.cleaning import clean_corpus, clean_lines_col


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return clean_corpus(df, **kw).collect()[0]


def test_each_dropped_category(spark):
    text = "\n".join(
        [
            "A proper sentence that survives cleaning.",  # kept
            "no terminal punctuation here",  # dropped: no . ! ? "
            "* bullet fragment",  # dropped: no punct AND short
            "Please enable JavaScript to continue.",  # dropped: javascript
            "Lorem Ipsum dolor sit amet.",  # dropped: lorem ipsum
            "if (x) { return y; }",  # dropped: brace
            "No.",  # dropped: < 3 words
            'He said "stop right there."',  # kept: quote-terminal
            "Is this a question?",  # kept: ? terminal
        ]
    )
    row = _one(spark, text)
    assert row.n_lines == 9
    assert row.n_kept_lines == 3
    assert row.clean_text.split("\n") == [
        "A proper sentence that survives cleaning.",
        'He said "stop right there."',
        "Is this a question?",
    ]
    assert row.doc_kept == 1
    assert row.n_chars_in == len(text)
    assert row.n_chars_out == len(row.clean_text)


def test_lines_trimmed_before_predicates(spark):
    # leading bullet-ish whitespace is stripped before judging;
    # the trimmed line is what lands in the output
    row = _one(spark, "   An indented line still counts fine.   ")
    assert row.n_kept_lines == 1
    assert row.clean_text == "An indented line still counts fine."


def test_doc_gate_and_empty_result(spark):
    row = _one(spark, "nothing survives here\nshort one")
    assert row.n_kept_lines == 0
    assert row.clean_text == ""
    assert row.doc_kept == 0


def test_min_words_parameter(spark):
    assert _one(spark, "Two words.", min_words=2).n_kept_lines == 1
    assert _one(spark, "Two words.", min_words=3).n_kept_lines == 0


def test_map_only_no_shuffle(spark):
    df = spark.createDataFrame([(1, "A fine sentence here.")], "doc_id long, text string")
    plan = clean_corpus(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_composable_column_form(spark):
    df = spark.createDataFrame(
        [(1, "Keep this sentence please.\ndrop me")], "doc_id long, text string"
    )
    out = df.select(F.size(clean_lines_col("text")).alias("n")).collect()[0]
    assert out.n == 1


def test_cleaning_matches_imperative_reference_on_random_corpus(spark):
    """Independent Python reimplementation of the C4 rules over a
    seeded random multi-line corpus — independent of both the Spark
    formulation and the SQL oracle."""
    import random
    import re

    rng = random.Random(21)
    frag = [
        "A good sentence with plenty of words here.",
        "no punct line with words",
        "Tiny.",
        "Enable javascript now please people.",
        "lorem ipsum is Lorem Ipsum filler text.",
        "code { brace } line.",
        "  Indented but proper sentence stands here.  ",
        'Quoted ending works fine he said."',
        "Question form also survives doesn't it?",
        "",
    ]
    rows = [
        (i, "\n".join(rng.choice(frag) for _ in range(rng.randint(1, 8))))
        for i in range(80)
    ]

    def py_clean(text):
        kept = []
        for line in text.split("\n"):
            l = line.strip(" ")
            low = l.lower()
            if (
                re.search(r'[.!?"]$', l)
                and len(re.findall(r"\S+", l)) >= 3
                and "javascript" not in low
                and "lorem ipsum" not in low
                and "{" not in l
            ):
                kept.append(l)
        return kept

    df = spark.createDataFrame(rows, "doc_id long, text string")
    from irclogbot_spark.operators.cleaning import clean_corpus

    got = {r.doc_id: r for r in clean_corpus(df).collect()}
    for i, text in rows:
        kept = py_clean(text)
        r = got[i]
        assert r.n_lines == len(text.split("\n"))
        assert r.n_kept_lines == len(kept)
        assert r.clean_text == "\n".join(kept)
        assert r.doc_kept == (1 if kept else 0)
