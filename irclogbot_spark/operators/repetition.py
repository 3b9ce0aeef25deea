"""Gopher-style repetition signals (north-star quality extension).

The repetition filters of Rae et al. 2021 (Gopher, table A1) and the
Dolma/RedPajama pipelines: documents dominated by a few repeated
n-grams are low-quality (boilerplate, keyword stuffing, scraper junk)
and get filtered before training. Two families:

- ``top n-gram char fraction``: how much of the document is the
  single most repeated n-gram (short n, n=2..4),
- ``duplicate n-gram char fraction``: how much of the document is
  covered by n-grams occurring more than once (long n, n=5..10).

Relational shape (the 100 TB path): ONE corpus scan — tokens are
materialized in a projection so the regex runs once per row, both
n-gram widths expand from that array map-side — then ONE partially-
aggregated shuffle on (doc, n, gram): the repeated grams this
operator exists to find are exactly the rows partial agg collapses
before the exchange. The per-doc reduction and the keep-every-doc
left join both hash on doc id. No window, no sort, no driver loop.

Tie-break note: "most frequent n-gram" is ambiguous under count ties,
so the top-gram signal is defined as max(count * gram_chars) — the
max char mass any single gram accounts for. Deterministic, and the
quantity the filter actually thresholds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.plans.partitioning import ensure_parallelism

TOKEN_RE = r"\S+"


def ngrams_of(toks: Column, n: int) -> Column:
    """Word n-grams over a token array, space-joined; [] when < n
    tokens. The short-doc case needs an explicit guard: Spark's
    sequence(1, 0) yields a DESCENDING [1, 0], not the empty list
    DuckDB's generate_series produces — unguarded it would emit bogus
    partial grams per short doc."""
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def ngrams(text: Column, n: int) -> Column:
    return ngrams_of(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)), n)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
    families: tuple[str, ...] = ("top", "dup"),
) -> DataFrame:
    """Per-doc repetition stats for docs that HAVE grams — the lean
    core (no keep-every-doc join, so one corpus scan): rows only for
    docs with >= top_n tokens. Callers that already guarantee a
    minimum token count (e.g. prep_corpus after its min-token gate)
    use this directly and save a scan; ``repetition_signals`` wraps
    it with the keep-all join for the general case.

    ``families`` selects which signal families to compute: the
    exploded (doc, n, gram) rows are the dominant shuffle, so a
    caller thresholding only one family (prep_corpus gates on
    top2gram_frac alone) passes ``("top",)`` and halves the exchange
    volume; output columns shrink to the requested families."""
    # explicit validation (not assert: must survive python -O), and a
    # set comparison alone would accept ("top", "top"), which concat-tags
    # the same n-gram family twice and doubles n_top_grams
    if (
        not families
        or len(set(families)) != len(families)
        or not set(families) <= {"top", "dup"}
    ):
        raise ValueError(
            f"families must be a non-repeating subset of ('top', 'dup'); got {families!r}"
        )
    # ensure_parallelism: tokenize + n-gram expansion is the dominant
    # CPU stage — don't let a single-file scan pin it to one core.
    toks = ensure_parallelism(df).select(
        F.col(id_col),
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0)).alias("_toks"),
    )
    def _tag(n: int):
        # NB: a one-arg lambda is load-bearing — PySpark dispatches
        # higher-order-function lambdas on arity, so a captured-default
        # second parameter (lambda g, n=n: ...) would silently receive
        # the ARRAY INDEX instead of the closure value.
        return F.transform(
            ngrams_of(F.col("_toks"), n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    parts = [_tag(top_n) if f == "top" else _tag(dup_n) for f in families]
    tagged = F.concat(*parts) if len(parts) > 1 else parts[0]
    counts = (
        toks.select(F.col(id_col), F.explode(tagged).alias("x"))
        .select(id_col, F.col("x.n").alias("n"), F.col("x.gram").alias("gram"))
        .groupBy(id_col, "n", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mass = F.col("cnt") * F.length("gram")
    is_top, is_dup = F.col("n") == top_n, F.col("n") == dup_n
    aggs, cols = [], [F.col(id_col)]
    if "top" in families:
        aggs += [
            F.sum(F.when(is_top, F.col("cnt")).otherwise(F.lit(0))).alias("n_top"),
            F.max(F.when(is_top, mass)).alias("top_chars"),
            F.sum(F.when(is_top, mass).otherwise(F.lit(0))).alias("top_total"),
        ]
        cols += [
            F.col("n_top").cast("long").alias("n_top_grams"),
            _frac("top_chars", "top_total").alias(f"top{top_n}gram_frac"),
        ]
    if "dup" in families:
        aggs += [
            F.sum(F.when(is_dup, F.col("cnt")).otherwise(F.lit(0))).alias("n_dup"),
            F.sum(F.when(is_dup & (F.col("cnt") > 1), mass).otherwise(F.lit(0))).alias(
                "dup_chars"
            ),
            F.sum(F.when(is_dup, mass).otherwise(F.lit(0))).alias("dup_total"),
        ]
        cols += [
            F.col("n_dup").cast("long").alias("n_dup_grams"),
            _frac("dup_chars", "dup_total").alias(f"dup{dup_n}gram_frac"),
        ]
    return counts.groupBy(id_col).agg(*aggs).select(*cols)


def _frac(num: str, den: str):
    return F.when(
        F.coalesce(F.col(den), F.lit(0)) > 0,
        F.col(num).cast("double") / F.col(den).cast("double"),
    ).otherwise(F.lit(0.0))


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Per-doc repetition stats: one row per INPUT doc —
    ``repetition_stats`` plus the keep-every-doc left join, so docs
    too short to form a single n-gram report 0 counts and 0.0
    fractions (the filter downstream must see every doc)."""
    stats = repetition_stats(df, id_col, text_col, top_n, dup_n)
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_top_grams", F.lit(0)).alias("n_top_grams"),
            F.coalesce(f"top{top_n}gram_frac", F.lit(0.0)).alias(
                f"top{top_n}gram_frac"
            ),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce(f"dup{dup_n}gram_frac", F.lit(0.0)).alias(
                f"dup{dup_n}gram_frac"
            ),
        )
    )

