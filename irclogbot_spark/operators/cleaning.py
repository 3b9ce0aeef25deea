"""C4-style line-level text cleaning (north-star quality extension).

The line-level heuristics of Raffel et al. 2020 (C4, §2.2) as used by
every major web-scale training corpus since (RefinedWeb, Dolma,
FineWeb): a document is split into lines, each line is kept only if
it looks like prose — ends in terminal punctuation, has a minimum
word count, is not javascript/cookie boilerplate, not a code
fragment, not "lorem ipsum" filler — and the document is rebuilt
from the surviving lines.

Relational shape (the 100 TB path): the whole operator is ONE
map-only projection — ``split`` on newline, a higher-order
``filter`` over the line array with pure string predicates, and an
``array_join`` back to text. No explode, no shuffle, no UDF: every
predicate is a JVM codegen'd expression over an in-row array, so
the operator runs at scan speed and composes with any downstream
gate without a stage boundary. (Contrast: the obvious
explode -> filter -> groupBy(doc) -> array_agg formulation costs a
full-corpus shuffle AND loses line order without an extra sort key.)

Line predicates (C4 §2.2, adapted):
* terminal punctuation: line ends with . ! ? or closing quote;
* >= ``min_words`` whitespace words;
* no curly brace (code smell, C4 drops these pages — we drop lines);
* lowercased line does not contain "javascript" or "lorem ipsum".

Reference scope note: the irclogbot reference has no text-cleaning
code at all (SURVEY §2I); this operator is part of the BASELINE.json
north-star text-analysis battery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: terminal-punctuation set: . ! ? or a closing double quote.
_TERMINAL_RE = r'[.!?"]$'
_WORD_RE = r"\S+"


def _is_kept(line: Column, min_words: int) -> Column:
    low = F.lower(line)
    return (
        line.rlike(_TERMINAL_RE)
        & (F.size(F.regexp_extract_all(line, F.lit(_WORD_RE), F.lit(0))) >= min_words)
        & ~low.contains("javascript")
        & ~low.contains("lorem ipsum")
        & ~line.contains("{")
    )


def clean_lines_col(text: Column | str, min_words: int = 3) -> Column:
    """Array of surviving lines for one text column — the composable
    core. Lines are trimmed before the predicates run (C4 strips
    leading bullet whitespace before judging the line)."""
    text = F.col(text) if isinstance(text, str) else text
    lines = F.transform(F.split(text, "\n"), lambda l: F.trim(l))
    return F.filter(lines, lambda l: _is_kept(l, min_words))


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_kept_lines: int = 1,
) -> DataFrame:
    """Per-doc C4 line cleaning: cleaned text + audit counters + the
    doc-level keep gate. One map-only projection; `kept` is computed
    once in a lateral-style nested select so the line filter runs a
    single time per row, not once per output column."""
    all_lines = F.split(F.col(text_col), "\n")
    with_kept = df.select(
        F.col(id_col),
        F.size(all_lines).cast("long").alias("n_lines"),
        F.length(text_col).cast("long").alias("n_chars_in"),
        clean_lines_col(F.col(text_col), min_words).alias("_kept"),
    )
    clean_text = F.array_join(F.col("_kept"), "\n")
    return with_kept.select(
        id_col,
        "n_lines",
        F.size("_kept").cast("long").alias("n_kept_lines"),
        clean_text.alias("clean_text"),
        F.length(clean_text).cast("long").alias("n_chars_out"),
        "n_chars_in",
        (F.size("_kept") >= min_kept_lines).cast("int").alias("doc_kept"),
    )


#: entity decode order matters: &amp; LAST, or "&amp;lt;" would
#: double-decode into "<" (the classic entity-unescape bug)
_HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(text: Column | str) -> Column:
    """Web-corpus markup removal — the extraction step every
    HTML-crawl pipeline (C4/CCNet/FineWeb) runs before any quality
    or dedup pass: drop <script>/<style> blocks INCLUDING their
    content, drop every remaining tag, decode the six ubiquitous
    entities, collapse whitespace. A pure JVM regexp/replace chain —
    one whole-stage-codegen projection, no UDF, no shuffle — and
    every pattern is RE2-compatible (no backreferences) so the
    DuckDB oracle twin runs the clause-identical chain."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))
