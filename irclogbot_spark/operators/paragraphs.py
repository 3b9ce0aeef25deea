"""Paragraph-level (sub-document) deduplication — the CCNet pass.

Web-scale pipelines (CCNet, RefinedWeb, Dolma) dedup at PARAGRAPH
granularity before any document-level pass: boilerplate (nav bars,
cookie banners, license blocks) repeats across millions of pages while
the surrounding documents are unique, so document-level dedup never
sees it. The operation: split every document into paragraphs, hash
each, count how many DISTINCT documents each paragraph appears in,
and remove every occurrence of paragraphs above the threshold,
rebuilding the surviving text in order.

Scale design (the 100 TB path):
- Paragraph text NEVER enters an exchange. Paragraphs are split and
  hashed IN-ROW (``F.split`` + ``F.transform``); only ``(doc_id, pos,
  hash)`` triples explode into the two narrow shuffles (the
  doc-frequency count and the dup-position collect). The rebuild is a
  2-arg ``F.filter`` lambda over the in-row paragraph array — the same
  no-text-in-any-exchange discipline as ``crossdup.remove`` and
  ``text.tokenize_with_vocab`` (plan-asserted in tests/test_plans.py).
- The doc-frequency count is a partial-aggregating
  ``groupBy(hash).agg(countDistinct(doc_id))`` — map-side combine
  prunes in-partition repeats before the exchange carries 8-byte
  hashes (16-byte strings under the md5-checkable twin).
- The dup-hash set is unbounded (boilerplate cardinality grows with
  the corpus), so the join back is a plain shuffled hash join — no
  forced broadcast; AQE broadcasts when the set is actually small
  (the VERDICT-r4 tfidf lesson).
- Per-doc removal state is a sorted int array of dup positions —
  bytes per doc, not paragraphs per doc.

The paragraphizer is pluggable: the default splits on newline runs
(the real-corpus convention); callers can pass any in-row
``array<string>`` expression via ``paragraphs`` (the registered query
uses fixed 20-token windows because the synthetic corpus has no
newlines — see queries.docs_paragraph_dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.plans.partitioning import ensure_parallelism


def split_paragraphs(text: Column, sep_regex: str = r"\n+") -> Column:
    """Default paragraphizer: split on separator runs, drop
    empty/whitespace-only segments (leading/trailing separators and
    blank lines produce empties under ``F.split``)."""
    return F.filter(
        F.split(text, sep_regex), lambda p: F.trim(p) != F.lit("")
    )


def token_window_paragraphs(text: Column, width: int = 20) -> Column:
    """Fixed-width non-overlapping token windows as paragraphs — the
    paragraphizer for corpora without newline structure (and the
    line-free fallback CCNet applies to single-block pages). In-row:
    tokenize, slice every ``width`` tokens, re-join each window."""
    from irclogbot_spark.operators.dedup import tokens

    toks = tokens(text)
    n = F.size(toks)
    starts = F.when(
        n >= 1, F.sequence(F.lit(1), n, F.lit(width))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts, lambda st: F.array_join(F.slice(toks, st, width), " ")
    )


def paragraph_dedup(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    paragraphs: Column | None = None,
    hash_fn=None,
    out_sep: str = "\n",
) -> DataFrame:
    """Remove paragraphs occurring in >= ``min_docs`` distinct docs.

    Returns one row per input doc: ``(id_col, n_paras, n_removed,
    text_clean)`` where ``text_clean`` is the surviving paragraphs
    re-joined in original order with ``out_sep`` (empty string when
    every paragraph was boilerplate). A paragraph repeated WITHIN one
    document only is not removed (the count is distinct-doc, matching
    CCNet's definition); ``min_docs=2`` removes anything shared by two
    or more documents.

    ``hash_fn`` maps a paragraph Column to its hash Column; default
    xxhash64 (8-byte shuffles, the scale path), pass ``F.md5`` for the
    DuckDB-checkable twin.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    hash_fn = hash_fn or F.xxhash64
    paras = (
        paragraphs
        if paragraphs is not None
        else split_paragraphs(F.col(text_col))
    )
    base = ensure_parallelism(df).select(
        F.col(id_col), paras.alias("_paras")
    )
    # Narrow triple (doc_id, pos, hash): the ONLY thing that explodes.
    hx = base.select(
        id_col,
        F.posexplode(F.transform("_paras", lambda p: hash_fn(p))).alias(
            "pos", "h"
        ),
    )
    dup_hashes = (
        hx.groupBy("h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    dup_pos = (
        hx.join(dup_hashes, "h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_dup_pos"))
    )
    dp = F.coalesce(F.col("_dup_pos"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("_paras"), lambda p, i: ~F.array_contains(dp, i)
    )
    return (
        base.join(dup_pos, id_col, "left")
        .select(
            id_col,
            F.size("_paras").cast("long").alias("n_paras"),
            F.size(dp).cast("long").alias("n_removed"),
            F.array_join(kept, out_sep).alias("text_clean"),
        )
    )
