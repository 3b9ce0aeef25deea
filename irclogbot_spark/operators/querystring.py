"""ES ``simple_query_string`` — the user-facing search-box syntax
(SURVEY.md §2H; the reference's implied search UI, utils.py:93-103's
Flask vestige, is a text box whose raw input ES deployments route
through exactly this never-throws parser).

Supported syntax (the high-traffic subset, parsed with ES's
never-raise contract — malformed input degrades to plain terms):

- ``term``    -> a should clause (optional, scores when it matches)
- ``+term``   -> a must clause (required, scores)
- ``-term``   -> a must_not clause (excluded, never scores)
- ``term*``   -> prefix expansion: the trailing ``*`` expands against
  the corpus/index term dictionary in TERM ORDER, capped at
  ``max_expansions`` (ES default 50 — the engine-wide enforced-bound
  convention); each expansion lands in the SHOULD list (a must prefix
  with several expansions relaxes to should-group semantics in real
  ES too, so this matches the common case). ``+term*`` / ``-term*``
  DEGRADE to the plain should prefix (round 13, per ADVICE r12: ES
  never throws on raw search-box input — a deployment routing user
  input must not crash on an unsupported polarity marker; the
  documented deviation is that the must/must_not polarity is dropped,
  not honored)
- a bare ``+`` / ``-`` / ``*`` or duplicate term collapses or drops
  per the never-throws rule (documented per case in
  :func:`parse_simple_query`)
- a query whose positive clauses all vanish (only ``-term`` clauses,
  or a prefix expanding to zero dictionary terms — a user typing
  ``zzz*``) returns the EMPTY (id, score, n_should) frame, exactly
  ES's empty-hits response (round 13, per ADVICE r12; the underlying
  programmer-facing :func:`~irclogbot_spark.operators.boolquery.
  bool_search` still raises on an empty positive clause list — the
  never-throws contract belongs to the search-box entry points)

The compiled query IS a :mod:`irclogbot_spark.operators.boolquery`
bool query — the parser produces (must, should, must_not) and both
physical forms reuse bool_search / bool_search_atrest verbatim, so
scan and at-rest stay bit-identical and every scale property
(zero-shuffle scan, bucket-pruned at-rest probe) is inherited, not
reimplemented.

Reference parity note: the reference bot has no query parser (it is
an ingest bot; irclogbot.py:50-51 only writes to ES) — this is the
§2H implied-search-surface completion, same as the rest of the ES
query family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irclogbot_spark.functions.text import WORD_RE


def parse_simple_query(query: str) -> dict:
    """Parse the simple_query_string syntax into clause lists:
    ``{"must": [...], "should": [...], "must_not": [...],
    "prefixes": [...]}`` where prefixes are the bare/should
    ``term*`` stems awaiting dictionary expansion.

    Never raises on user input (the ES contract): empty tokens after
    stripping operators are dropped; a term repeated across clauses
    keeps its FIRST occurrence only (the engine's compound queries
    reject duplicate terms, so the parser dedupes rather than
    forwarding the error to a search box); ``+term*`` / ``-term*``
    degrade to the plain should prefix ``term*`` (round 13 — the
    polarity marker is dropped, the module-docstring deviation; ES
    itself relaxes a multi-expansion must prefix to a should group,
    and a raising parser would break the never-throws contract for
    raw search-box input)."""
    must: list[str] = []
    should: list[str] = []
    must_not: list[str] = []
    prefixes: list[str] = []
    seen: set[str] = set()
    for raw in (query or "").split():
        tok = raw
        polarity = "should"
        if tok[0] == "+":
            polarity, tok = "must", tok[1:]
        elif tok[0] == "-":
            polarity, tok = "must_not", tok[1:]
        prefix = tok.endswith("*")
        if prefix:
            tok = tok[:-1]
        if not tok or tok in seen:
            continue
        seen.add(tok)
        if prefix:
            # polarity dropped for prefixes — +term*/-term* degrade
            # to the should prefix (never-throws; docstring deviation)
            prefixes.append(tok)
        elif polarity == "must":
            must.append(tok)
        elif polarity == "must_not":
            must_not.append(tok)
        else:
            should.append(tok)
    return {
        "must": must,
        "should": should,
        "must_not": must_not,
        "prefixes": prefixes,
    }


def _expand_prefixes(
    vocab_terms: DataFrame,
    prefixes: list[str],
    exclude: set[str],
    max_expansions: int,
) -> list[str]:
    """Expand each prefix stem against a (term) frame in TERM ORDER,
    capped PER PREFIX at max_expansions (the ES knob is per prefix
    clause). Terms already referenced by another clause (or by an
    earlier prefix) are excluded BEFORE the cap (round 13, per ADVICE
    r12: exclusion after the cap silently shrank the expansion below
    max_expansions even when more dictionary matches existed), so a
    prefix always yields the full max_expansions distinct new terms
    when the dictionary has them. Documented deviation from ES: the
    excluded term itself loses the extra should-clause score real ES
    would add for the duplicate clause — the engine's
    no-duplicate-terms contract (boolquery._check_no_duplicate_terms)
    keeps each term a single clause."""
    out: list[str] = []
    for p in prefixes:
        skip = set(exclude) | set(out)
        exp = vocab_terms.filter(F.col("term").startswith(p))
        if skip:
            exp = exp.filter(~F.col("term").isin(sorted(skip)))
        exp = (
            exp.select("term")
            .distinct()
            .orderBy("term")
            .limit(int(max_expansions))
        )
        out.extend(r[0] for r in exp.collect())  # bounded: <= max_expansions
    return out


def simple_query_string_search(
    df: DataFrame,
    query: str,
    max_expansions: int = 50,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Scan-form simple_query_string: parse, expand prefixes against
    the corpus term types (term order, capped — a term-type-sized
    distinct, the match_phrase_prefix convention), and run the
    compiled bool query. Output/ordering contract = bool_search's
    (id, score, n_should). A query with no surviving positive clause
    (only must_not terms, or prefixes expanding to nothing) returns
    the empty frame — ES's empty-hits response, never an error
    (round 13, per ADVICE r12)."""
    from irclogbot_spark.operators.boolquery import bool_search

    clauses = parse_simple_query(query)
    should = list(clauses["should"])
    if clauses["prefixes"]:
        toks = F.regexp_extract_all(F.col(text_col), F.lit(WORD_RE), F.lit(0))
        vocab = df.select(
            F.explode(F.array_distinct(toks)).alias("term")
        ).distinct()
        referenced = set(
            clauses["must"] + should + clauses["must_not"]
        )
        should += _expand_prefixes(
            vocab, clauses["prefixes"], referenced, max_expansions
        )
    if not clauses["must"] and not should:
        return df.select(
            F.col(id_col),
            F.lit(0.0).alias("score"),
            F.lit(0).cast("long").alias("n_should"),
        ).limit(0)
    return bool_search(
        df,
        must=clauses["must"],
        should=should or None,
        must_not=clauses["must_not"] or None,
        k=k,
        id_col=id_col,
        text_col=text_col,
        k1=k1,
        b=b,
    )


def simple_query_string_atrest(
    spark: SparkSession,
    path: str,
    query: str,
    max_expansions: int = 50,
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    index: tuple | None = None,
) -> DataFrame:
    """simple_query_string served from the at-rest index: prefix
    expansion walks the vocab sidecar (the term-dictionary walk —
    the fuzzy/match_phrase_prefix pruning boundary), then the
    compiled bool query runs through bool_search_atrest —
    bit-identical to the scan form, including the empty-hits
    response when no positive clause survives (the empty frame's id
    rows come from the narrow doclens table — no postings read)."""
    from irclogbot_spark.operators.boolquery import bool_search_atrest
    from irclogbot_spark.operators.textindex import (
        read_text_index,
        read_vocab,
    )

    clauses = parse_simple_query(query)
    should = list(clauses["should"])
    if clauses["prefixes"]:
        vocab = (
            index[0].select("term").distinct()
            if index is not None
            else read_vocab(spark, path)
        )
        referenced = set(
            clauses["must"] + should + clauses["must_not"]
        )
        should += _expand_prefixes(
            vocab, clauses["prefixes"], referenced, max_expansions
        )
    if not clauses["must"] and not should:
        doclens = (
            index[1] if index is not None else read_text_index(spark, path)[1]
        )
        return doclens.select(
            F.col(id_col),
            F.lit(0.0).alias("score"),
            F.lit(0).cast("long").alias("n_should"),
        ).limit(0)
    return bool_search_atrest(
        spark,
        path,
        must=clauses["must"],
        should=should or None,
        must_not=clauses["must_not"] or None,
        k=k,
        id_col=id_col,
        k1=k1,
        b=b,
        index=index,
    )
