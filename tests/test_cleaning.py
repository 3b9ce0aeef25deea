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


def test_strip_markup_tags_entities_and_script_content(spark):
    from irclogbot_spark.operators.cleaning import strip_markup
    from pyspark.sql import functions as F

    cases = [
        # script/style content dies WITH its tags (incl. bare < > &&)
        (
            '<head><style>p { color: red; }</style>'
            "<script>if (1 < 2 && x > 0) { run(); }</script></head>"
            "<body><p>hello</p></body>",
            "hello",
        ),
        # entity decode order: &amp;lt; must become the literal text
        # "&lt;", NOT double-decode into "<"
        ("a &amp;lt; b", "a &lt; b"),
        ("x &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;y", 'x <tag> "q" \'s\' y'),
        # whitespace collapses across removed tags
        ("<h1>one</h1>\n\n<p>two   three</p>", "one two three"),
        # self-closing + attributes
        ('<img src="x.png"/>pic<br/><a href="#">link</a>', "pic link"),
        # case-insensitive script block
        ("<SCRIPT>var a=1;</SCRIPT>kept", "kept"),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)], "i int, h string")
    got = {r.i: r.s for r in df.select("i", strip_markup("h").alias("s")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_nfc_normalize_col_composes_and_matches_python(spark):
    import unicodedata

    from irclogbot_spark.functions.text import nfc_normalize_col
    from pyspark.sql import functions as F

    rows = [
        (0, "cafe\u0301 latte"),      # e + combining acute -> \u00e9
        (1, "a\u0301b\u0308c"),       # multiple combining marks
        (2, "plain ascii"),            # no-op
        (3, "\u00e9 already composed"),  # idempotent
        (4, None),                     # null passthrough
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    got = {r.i: r.n for r in df.select("i", nfc_normalize_col("t").alias("n")).collect()}
    for i, t in rows:
        want = unicodedata.normalize("NFC", t) if t is not None else None
        assert got[i] == want, (i, got[i], want)
    # composition actually shrank the bytes for the decomposed cases
    assert len(got[0].encode()) < len(rows[0][1].encode())
