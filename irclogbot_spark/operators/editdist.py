"""Edit-distance near-duplicate detection (q-gram count-filter join).

The fourth near-dup modality beside MinHash-Jaccard (operators/
dedup.py), SimHash (ibid.) and embedding-cosine (operators/
semdedup.py): find pairs within Levenshtein distance d — the signal
that catches small in-place corruptions (OCR noise, template fills,
encoding mangling) that token-set measures dilute and embeddings
smooth over.

Design is the classic approximate-string-join pipeline (Gravano et
al., VLDB 2001: "Approximate String Joins in a Database (Almost) for
Free"; count filter after Sutinen & Tarhio):

1. distinct positional q-grams per document, computed IN-ROW
   (sequence -> transform -> array_distinct -> explode) — only
   (doc_id, gram) pairs ever enter a shuffle, never text;
2. stop-gram cull: grams appearing in > max_df documents are dropped
   (the winnow stop-fingerprint / LSH max_bucket convention) — this
   caps the per-gram pair fan-out at max_df^2 no matter how
   boilerplate-heavy the corpus;
3. candidates: pairs whose shared surviving-gram count passes the
   count filter (one gram-keyed shuffle + one pair-keyed partial-agg
   shuffle of bare (id, id) pairs);
4. verify: exact Levenshtein over the candidate pairs only — the
   THREE-ARG `F.levenshtein(l, r, threshold)` so the JVM runs the
   banded O(len*d) DP, not the full O(len^2); texts are joined back
   ONLY for the (tiny) candidate set, un-hinted so AQE broadcasts
   the candidate frame when small.

The count-filter threshold is length-dependent, not a constant:

    shared >= max(min_shared, min(n_kept_a, n_kept_b) - q*d)

This bound is EXACT, not heuristic: an edit overlaps at most q
positional grams, so at most q*d distinct gram strings of A are
absent from B's gram set; and because the cull is by global gram
string (df is a property of g, not of the doc), any kept gram of A
that survives in B's gram set is kept for B too — hence
|kept_a ∩ kept_b| >= n_kept - q*d. A constant threshold is either
too loose for long boilerplate-heavy docs (at sf0.01 a flat 10
admits 58k candidate pairs; the dynamic rule admits 11k with
identical final output) or kills short-doc recall (a flat 40 loses
163 of 218 true pairs at sf0.1). `min_shared` is only the floor for
docs shorter than (min_shared + q*d + q - 1) chars, where the
subtraction goes nonpositive — those are best-effort, as any
blocked scheme must be.

Never an all-pairs comparison: the quadratic form exists only in the
DuckDB oracle's eyes (the oracle replicates the same candidate
generation, so engine and oracle agree exactly — `docs_editdist_
neardup` in queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def qgrams(text: Column | str, q: int = 8) -> Column:
    """Distinct positional q-grams of ``text`` as an in-row array.
    Texts shorter than q contribute their whole (single) prefix gram
    — substring clamps identically in Spark and DuckDB."""
    col = F.col(text) if isinstance(text, str) else text
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - (q - 1), F.lit(1))),
            lambda i: col.substr(i, F.lit(q)),
        )
    )


def editdist_neardup(
    docs: DataFrame,
    *,
    q: int = 8,
    max_df: int = 50,
    min_shared: int = 10,
    max_dist: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs of documents within Levenshtein distance ``max_dist``,
    blocked by the exact q-gram count filter (see module docstring).
    Returns (id_a, id_b, shared, dist), id_a < id_b."""
    d = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    grams = d.select("_id", F.explode(qgrams("_text", q)).alias("g"))
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    kept = grams.join(df_counts, "g").filter(F.col("_df") <= max_df)
    n_kept = kept.groupBy("_id").agg(F.count(F.lit(1)).alias("n_kept"))
    a = kept.select(F.col("_id").alias("id_a"), "g")
    b = kept.select(F.col("_id").alias("id_b"), "g")
    cand = (
        a.join(b, (a.g == b.g) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    nka = n_kept.select(F.col("_id").alias("id_a"), F.col("n_kept").alias("_nka"))
    nkb = n_kept.select(F.col("_id").alias("id_b"), F.col("n_kept").alias("_nkb"))
    cand = (
        cand.join(nka, "id_a")
        .join(nkb, "id_b")
        .filter(
            F.col("shared")
            >= F.greatest(
                F.lit(min_shared), F.least("_nka", "_nkb") - F.lit(q * max_dist)
            )
        )
        .select("id_a", "id_b", "shared")
    )
    ta = d.select(F.col("_id").alias("id_a"), F.col("_text").alias("_ta"))
    tb = d.select(F.col("_id").alias("id_b"), F.col("_text").alias("_tb"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("dist", F.levenshtein("_ta", "_tb", max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", "shared", "dist")
    )
