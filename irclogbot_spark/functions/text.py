"""Text-analysis functions: tokenization, quality metrics, language
identification, document fingerprinting (north-star extensions).

All pure column expressions — whole-stage codegen end to end, and
each has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = r"\S+"
#: BPE-ish subword split: word chars run | single non-word-non-space.
BPE_RE = r"\w+|[^\w\s]"
PUNCT_RE = r"[.,!?;:]"

#: Tiny per-language stopword profiles for the n-gram/stopword
#: language-ID heuristic. Deliberately small: the heuristic is the
#: operator; accuracy depends on corpus realism.
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "con", "que"],
}


def token_count(text: Column | str, pattern: str = WORD_RE) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def stopword_hits(text: Column | str, lang: str = "en") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    words = "|".join(LANG_STOPWORDS[lang])
    return F.size(
        F.regexp_extract_all(F.lower(c), F.lit(rf"\b({words})\b"), F.lit(0))
    )


def lang_stopword_pattern(lang: str) -> str:
    return rf"\b({'|'.join(LANG_STOPWORDS[lang])})\b"


def lang_id(text: Column | str) -> Column:
    """Stopword-profile language guess: the language with the most
    stopword hits, alphabetical tiebreak; 'und' when nothing hits.

    Expressed as an ordered CASE (first alphabetical max wins) so the
    SQL oracle twin is a literal transcription.
    """
    langs = sorted(LANG_STOPWORDS)  # de, en, es, fr
    scores = {lang: stopword_hits(text, lang) for lang in langs}
    expr = F.when(F.greatest(*[scores[lg] for lg in langs]) == 0, F.lit("und"))
    for i, lang in enumerate(langs[:-1]):
        cond = F.lit(True)
        for other in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[other])
        expr = expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(langs[-1]))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n = F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), F.lit(0)))
    return n.cast("double") / F.greatest(F.length(c), F.lit(1))


def rolling_fingerprint(text: Column | str, base: int = 1000003, mod: int = 2147483647) -> Column:
    """Order-sensitive polynomial rolling hash over tokens.

    h = fold(tokens, h*base + (len(tok)*131 + first_codepoint) mod M).
    Unlike the set-style md5 fingerprint, transposing tokens changes
    the value. Stays in BIGINT: h < 2^31, so h*base < 2^52.
    SQL twin: list_reduce over the same token features.
    """
    toks = F.regexp_extract_all(
        F.col(text) if isinstance(text, str) else text, F.lit(WORD_RE), F.lit(0)
    )
    code = lambda t: F.length(t).cast("long") * 131 + F.ascii(t).cast("long")  # noqa: E731
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(base) + code(t), F.lit(mod).cast("long")),
    )
