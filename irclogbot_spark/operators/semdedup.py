"""Semantic deduplication over an embedding column — the SemDeDup
direction (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540):
k-means-cluster the embeddings, then deduplicate WITHIN each cluster
by pairwise cosine, keeping per duplicate group the example least
similar to its centroid (the paper's keep-priority — extreme points
preserve diversity).

Relational formulation (no iterative grouping): rank each cluster's
members by (cosine-to-centroid ASC, id ASC); a document is a
duplicate iff some LOWER-ranked member of its cluster has cosine >=
threshold with it, and its ``dup_of`` is the closest such member
(highest cosine, smallest id on ties). This reproduces the paper's
policy exactly for pairwise groups and resolves non-transitive
chains deterministically (B can shadow C while A shadows B — the
same smaller-wins convention the dedup operators use).

100 TB shape:
* assignment is MAP-ONLY against plan-constant unit centroids
  (operators/similarity.py's trainer — integer-quantized, a pure
  function of the corpus, so the learned centroids inline into a
  DuckDB oracle bit-identically);
* ONE shuffle on the cell id serves both the rank window and the
  within-cell pair join (co-partitioned);
* the pair join is the paper's O(m^2/k) within-cluster cost; cells
  larger than ``max_cell`` are skipped wholesale (every member kept,
  dedup skipped) — the same degenerate-bucket guard as the LSH
  ``max_bucket``: a cluster holding a corpus-scale fraction of rows
  is a clustering pathology to re-train, not to pair-expand.

Reference scope: absent from the reference (SURVEY §2I) — BASELINE
north-star operator for embedding-era corpus prep, alongside
exact/MinHash/SimHash dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from irclogbot_spark.operators.similarity import (
    _argmax_cell,
    _cell_dots,
    as_double,
    dot,
)
from irclogbot_spark.plans.partitioning import ensure_parallelism


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int = 10_000,
) -> DataFrame:
    """One row per corpus vector: (id, cell, cent_cos, keep, dup_of,
    dup_cosine). ``keep`` is false iff a lower-ranked member of the
    same cell is >= threshold cosine-similar; ``dup_of`` is then the
    closest such member. ``centroids`` must be unit vectors (the
    trainer's output)."""
    a = (
        ensure_parallelism(corpus)
        .select(F.col(id_col), as_double(vec_col).alias("v"))
        .select(
            F.col(id_col), F.col("v"), _cell_dots(F.col("v"), centroids).alias("dots")
        )
        .select(
            F.col(id_col),
            F.col("v"),
            _argmax_cell(F.col("dots")).alias("cell"),
            F.col("dots"),
        )
        .select(
            F.col(id_col),
            F.col("v"),
            F.col("cell"),
            F.col("dots"),
            # per-row norm computed ONCE: the pair join below scores
            # O(m^2/k) pairs, and recomputing sqrt(dot(v,v)) per pair
            # would triple the fold work (2 extra 64-dim folds/pair);
            # dividing by the precomputed norms is bit-identical
            F.sqrt(dot(F.col("v"), F.col("v"))).alias("vnorm"),
        )
        .select(
            F.col(id_col),
            F.col("v"),
            F.col("cell"),
            F.col("vnorm"),
            # cosine to own (unit) centroid: dot / |v|
            (
                F.element_at(F.col("dots"), F.col("cell") + F.lit(1)) / F.col("vnorm")
            ).alias("cent_cos"),
        )
    )
    wc = Window.partitionBy("cell")
    a = a.withColumn("cell_n", F.count(F.lit(1)).over(wc))
    rank_w = Window.partitionBy("cell").orderBy(F.asc("cent_cos"), F.asc(id_col))
    # rank only eligible cells; oversized cells skip dedup wholesale
    a = a.withColumn(
        "rnk",
        F.when(F.col("cell_n") <= max_cell, F.row_number().over(rank_w)),
    ).localCheckpoint(eager=True)  # consumed by both sides of the pair join

    lo, hi = a.alias("lo"), a.alias("hi")
    pairs = (
        hi.join(
            lo,
            (F.col("hi.cell") == F.col("lo.cell"))
            & (F.col("lo.rnk") < F.col("hi.rnk")),
        )
        .select(
            F.col(f"hi.{id_col}").alias("dup_id"),
            F.col(f"lo.{id_col}").alias("partner"),
            (
                dot(F.col("hi.v"), F.col("lo.v"))
                / (F.col("hi.vnorm") * F.col("lo.vnorm"))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    best = pairs.groupBy("dup_id").agg(
        F.min(F.struct((-F.col("cos")).alias("neg"), F.col("partner"))).alias("m")
    ).select(
        F.col("dup_id").alias(id_col),
        F.col("m.partner").alias("dup_of"),
        (-F.col("m.neg")).alias("dup_cosine"),
    )
    return (
        a.join(best, id_col, "left")
        .select(
            id_col,
            "cell",
            "cent_cos",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            "dup_cosine",
        )
    )
