"""Random-projection dimensionality reduction for embedding columns
(Johnson-Lindenstrauss; Achlioptas 2003 sparse signed variant).

The step before every downstream embedding pass at 100 TB: a 64-dim
float column costs 8x the bytes of an 8-dim sketch in every shuffle
the ANN / semantic-dedup / clustering tiers pay. JL guarantees
pairwise distances survive (within 1±eps) under a data-independent
random linear map, so the reduction needs NO training pass — the
matrix is a seeded driver-side constant, part of the plan like the
SRP hyperplanes (similarity.random_planes) and the IVF centroids.

Exactness contract: inputs are floor-quantized to integer milli-units
first, and the Achlioptas matrix entries are {-1, 0, +1}, so every
projected coordinate is an exact BIGINT sum — bit-identical across
engines, partitionings, and evaluation orders (the float-sum
order-dependence rule from the anomaly/percentile operators).

Scale shape: ONE map-only projection — zero exchanges, zero joins
(plan-asserted in tests/test_plans.py). Magnitudes: |milli| <= ~1e5
per element and 64 terms keep |p_j| < 1e7 — no BIGINT headroom risk.

No counterpart in the reference (EdLeafe/irclogbot has no vector
tier); this extends the engine's LLM-data-pipeline surface the same
way operators/similarity.py does.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.functions.lits import lit_long_matrix
from irclogbot_spark.operators.similarity import as_double
from irclogbot_spark.plans.partitioning import ensure_parallelism


def achlioptas_matrix(dim: int, k: int, seed: int = 7) -> list[list[int]]:
    """Deterministic sparse signed projection matrix (k rows x dim
    cols), entries in {-1, 0, +1} with P = {1/6, 2/3, 1/6}
    (Achlioptas 2003, "Database-friendly random projections").
    Driver-side plan constant — the random_planes convention."""
    rng = np.random.RandomState(seed)
    return rng.choice([-1, 0, 1], size=(k, dim), p=[1 / 6, 2 / 3, 1 / 6]).tolist()


def quantize_milli(vec: Column | str) -> Column:
    """array<long> of floor(x * 1000) per element — the exact-integer
    gateway every cross-engine float aggregate in this repo uses
    (floor on BOTH engines; CAST alone rounds in DuckDB)."""
    return F.transform(as_double(vec), lambda x: F.floor(x * F.lit(1000.0)))


def project_embeddings(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """(id_col, proj array<long>[k], *carry_cols): exact signed-sum
    projection of the milli-quantized vector. Map-only; the matrix
    ships as ONE parsed literal (functions/lits.py — a py4j-call-free
    plan constant)."""
    carry_cols = carry_cols or []
    q = quantize_milli(vec_col)
    rows = lit_long_matrix(achlioptas_matrix(dim, k, seed))
    proj = F.transform(
        rows,
        lambda r: F.aggregate(
            F.zip_with(q, r, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return ensure_parallelism(df).select(
        F.col(id_col), proj.alias("proj"), *carry_cols
    )


def projected_knn_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    r: int = 50,
    k_dims: int = 8,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Stage 1 of two-stage retrieval: top-``r`` candidates per query
    by SKETCH cosine (the 8-long exact-integer projection), to be
    exact-reranked downstream — what the reduction buys: the scan
    compares k_dims longs per pair instead of ``dim`` floats, and at
    rest a projected index is 1/8 the bytes. Same broadcast-queries /
    one-scan / per-query-top-k shape as similarity.knn_join; sketch
    cosine divides by stored norms with the same association, so the
    oracle can replicate it bit-for-bit."""
    from irclogbot_spark.operators.similarity import _cos_pre, dot, norm

    cp = project_embeddings(corpus, k_dims, corpus_id, vec_col, dim, seed)
    qp = project_embeddings(queries, k_dims, query_id, vec_col, dim, seed)
    to_d = lambda c: F.col(c).cast("array<double>")  # noqa: E731
    q = F.broadcast(
        qp.select(
            query_id,
            to_d("proj").alias("qv"),
            norm(to_d("proj")).alias("qn"),
        )
    )
    scored = (
        cp.select(
            corpus_id,
            to_d("proj").alias("cv"),
            norm(to_d("proj")).alias("cn"),
        )
        .join(q, F.col(corpus_id) != F.col(query_id))
        .select(
            query_id,
            corpus_id,
            _cos_pre(
                dot(F.col("cv"), F.col("qv")), F.col("cn"), F.col("qn")
            ).alias("sketch_cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.desc("sketch_cosine"), F.asc(corpus_id)
    )
    return scored.withColumn("cand_rank", F.row_number().over(w)).filter(
        F.col("cand_rank") <= r
    )
