"""Per-document n-gram novelty — the memorization/duplication audit
column of a training-data release.

For each document: how many of its distinct word n-grams occur in at
least ``min_docs`` documents corpus-wide? Novelty is the surviving
share. This is the per-doc readout of the SAME corpus-level signal
the exact-substring pass (operators/crossdup.py) acts on and the data
card (queries.docs_data_card) summarizes: a low-novelty doc is mostly
memorized boilerplate; the corpus-level novelty histogram is the
standard pre-release duplication audit (Lee et al. 2022 report it as
"% of tokens in duplicated n-grams").

Scale shape (the paragraph_dedup convention, operators/paragraphs.py):
- Shingling + hashing are IN-ROW; only narrow (doc_id, hash) pairs
  explode — text never rides a shuffle.
- Document frequency is a groupBy(hash) with map-side partial
  aggregation (a boilerplate gram present in every doc collapses to
  one row per map task before the exchange — the skew crusher).
- The duplicated-hash set joins back un-hinted: AQE broadcasts it
  when small, falls back to a skew-aware shuffle join when not.
- Per-doc readout is one more narrow aggregation; totals come from
  the shingle array size in-row, so docs with zero duplicated grams
  never appear in the join at all (left join + coalesce).

``hash_fn`` defaults to xxhash31 (scale path); pass
``dedup.md5_hash31`` for the DuckDB-checkable pipeline (the
decontamination convention).

Deliberate non-checkpoint: the lazy plan recomputes the in-row
shingle pass for each of its three consumers (df aggregate, dup
join probe, per-doc totals). Measured at sf0.1 the whole query is
0.6 s warm — the recompute is map-side CPU that parallelizes
perfectly, while a localCheckpoint would materialize ~300 hashes/doc
to disk. On a 100 TB run where the scan itself dominates, persist
the narrow (doc_id, h) frame once (`hx.localCheckpoint()`) — the
prep-pipeline multiply-consumed-frame rule — at the cost of one
corpus-sized narrow write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import hashed_shingles
from irclogbot_spark.plans.partitioning import ensure_parallelism


def ngram_novelty(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """One row per input doc: ``(id_col, n_grams, dup_grams,
    novelty_milli)``.

    n_grams counts the doc's DISTINCT hashed n-grams; dup_grams how
    many of those occur in >= ``min_docs`` docs (distinct-doc count,
    the CCNet/paragraph definition — in-doc repeats don't inflate
    it); novelty_milli = floor(1000 * (n_grams - dup_grams) /
    n_grams), with too-short docs (no n-gram) reporting (0, 0, 1000)
    — a doc that duplicates nothing is fully novel by convention.
    Integer DIV keeps the rate bit-identical across engines.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    base = ensure_parallelism(df).select(
        F.col(id_col),
        hashed_shingles(text_col, n, hash_fn).alias("_hs"),
    )
    hx = base.select(id_col, F.explode("_hs").alias("h"))
    dup_hashes = (
        hx.groupBy("h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    dup_counts = (
        hx.join(dup_hashes, "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_dup"))
    )
    ng = F.size("_hs").cast("long")
    dup = F.coalesce(F.col("_dup"), F.lit(0)).cast("long")
    counted = base.join(dup_counts, id_col, "left").select(
        F.col(id_col), ng.alias("n_grams"), dup.alias("dup_grams")
    )
    # integer DIV (DuckDB //): exact floor rate with no float division
    rate = F.expr("(1000 * (n_grams - dup_grams)) DIV n_grams")
    return counted.select(
        id_col,
        "n_grams",
        "dup_grams",
        F.when(F.col("n_grams") > 0, rate)
        .otherwise(F.lit(1000))
        .cast("long")
        .alias("novelty_milli"),
    )
