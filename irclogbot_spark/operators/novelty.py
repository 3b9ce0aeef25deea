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
- Per-doc totals re-aggregate the CHECKPOINTED narrow frame (16
  bytes/row) rather than re-deriving the shingle array in-row —
  reading the checkpoint is cheaper than a second shingle+hash pass
  over the text (measured; see the checkpoint note below). Docs with
  zero grams re-enter via a column-pruned id scan + left join.

``hash_fn`` defaults to xxhash31 (scale path); pass
``dedup.md5_hash31`` for the DuckDB-checkable pipeline (the
decontamination convention).

Checkpoint-once discipline (the prep-pipeline multiply-consumed-
frame rule): the narrow (doc_id, h) frame is localCheckpointed
EAGERLY because three consumers read it (per-doc totals, the
doc-frequency aggregate, the dup-join probe) — without it the lazy
plan re-runs the shingle+hash projection per consumer. Measured at
sf0.1 under the noop-write bench (NOT count() — Catalyst's join
elimination makes count() skip the shingle work entirely and
under-reports 10x): 5.8 s lazy -> ~2 s checkpointed. The
materialized bytes are 16/row — strictly cheaper than recomputing
the md5-over-8-gram projection twice more at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import hashed_shingles
from irclogbot_spark.plans.partitioning import ensure_parallelism


def source_overlap(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    hash_fn=None,
) -> DataFrame:
    """Pairwise n-gram-set overlap between corpus groups (sources) —
    the cross-corpus accounting sheet: how much of source A's content
    is contained in source B (directional containment) and how
    similar the two are overall (Jaccard). The corpus-level twin of
    per-doc novelty; release pipelines run it to price a new source's
    marginal contribution before mixing it in.

    Returns ONE row per unordered group pair (src_a < src_b):
    ``(src_a, src_b, n_a, n_b, n_common, contain_a_milli,
    contain_b_milli, jaccard_milli)`` where n_* are distinct hashed
    n-gram counts, contain_a = |A∩B|/|A| etc., all integer DIV milli
    rates. Zero-overlap pairs ARE emitted (the full matrix comes from
    a bounded groups x groups expansion, not from co-occurrence).

    Scale shape: distinct (group, h) is one exchange with map-side
    partial dedup; per-group sizes and per-pair intersections are
    partial-agg shuffles of the same narrow frame; the final matrix
    assembly joins the n_groups-row size table to the
    C(n_groups, 2)-row pair-count table — both bounded by group
    cardinality, never by corpus size (broadcast; the
    log_nick_cooccurrence capped-expansion family). The group-pair
    self-join runs over (h, group) pairs whose per-h fan-out is
    bounded by n_groups, so the intersection stage moves at most
    n_groups x the distinct-gram count.
    """
    # NO checkpoint here, unlike ngram_novelty: gh ends in the
    # distinct's hash exchange, which Catalyst re-reads as a
    # ReusedExchange for all three consumers (sizes + both self-join
    # sides) — measured identical at sf0.1 with an eager checkpoint.
    # novelty's frame was a pure map projection (no exchange to
    # reuse), which is why IT needs one.
    gh = (
        ensure_parallelism(df)
        .select(
            F.col(group_col).alias("g"),
            F.explode(hashed_shingles(text_col, n, hash_fn)).alias("h"),
        )
        .distinct()
    )
    # groups enumerate from the INPUT (a shingle-less source still
    # owns matrix rows — explode drops its empty gram array from gh)
    groups = df.select(F.col(group_col).alias("g")).distinct()
    sizes = groups.join(
        gh.groupBy("g").agg(F.count(F.lit(1)).alias("_n")), "g", "left"
    ).select("g", F.coalesce(F.col("_n"), F.lit(0)).alias("n_grams"))
    common = (
        gh.alias("a")
        .join(
            gh.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.g") < F.col("b.g")),
        )
        .groupBy(
            F.col("a.g").alias("src_a"), F.col("b.g").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("g").alias("src_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col("g").alias("src_b"), F.col("n_grams").alias("n_b"))
    matrix = sa.join(F.broadcast(sb), F.col("src_a") < F.col("src_b"))
    out = matrix.join(F.broadcast(common), ["src_a", "src_b"], "left").select(
        "src_a",
        "src_b",
        F.col("n_a").cast("long"),
        F.col("n_b").cast("long"),
        F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
    )
    return out.select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        "n_common",
        # CASE guards: a shingle-less group (all docs shorter than n
        # tokens) must not trip ANSI division-by-zero — report 0
        # overlap (the docs_lsh_recall degenerate-input rule)
        F.expr("CASE WHEN n_a > 0 THEN (1000 * n_common) DIV n_a ELSE 0 END")
        .cast("long")
        .alias("contain_a_milli"),
        F.expr("CASE WHEN n_b > 0 THEN (1000 * n_common) DIV n_b ELSE 0 END")
        .cast("long")
        .alias("contain_b_milli"),
        F.expr(
            "CASE WHEN n_a + n_b - n_common > 0"
            " THEN (1000 * n_common) DIV (n_a + n_b - n_common) ELSE 0 END"
        )
        .cast("long")
        .alias("jaccard_milli"),
    )


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
    hx = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(hashed_shingles(text_col, n, hash_fn)).alias("h"),
        )
        .localCheckpoint(eager=True)
    )
    totals = hx.groupBy(id_col).agg(F.count(F.lit(1)).alias("_ng"))
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
    # ids re-enumerate from the input so gram-less docs keep their
    # row; the scan is column-pruned to the id alone
    counted = (
        df.select(F.col(id_col))
        .join(totals, id_col, "left")
        .join(dup_counts, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_ng"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("_dup"), F.lit(0)).cast("long").alias("dup_grams"),
        )
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
