"""Embedding similarity search — brute-force exact kNN and a
signed-random-projection (LSH) approximate path.

Brute force is the correctness baseline: one broadcast of the query
set, one scan of the corpus, a per-query top-k. The LSH path trades
recall for touching only same-bucket candidates — the shape that
survives a 100 TB corpus where a full scan per query does not.

All dot products are sequential left-folds over array<double>
(deterministic element order → bit-stable doubles, oracle-matchable).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from irclogbot_spark.plans.partitioning import ensure_parallelism


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k join: every query row against every corpus row.

    queries is broadcast (query sets are small relative to corpora);
    the corpus is scanned once. Returns (query_id, vec_id, cosine,
    knn_rank) with a deterministic vec_id tiebreak.
    """
    q = F.broadcast(
        queries.select(F.col(query_id), as_double(vec_col).alias("qv"))
    )
    scored = ensure_parallelism(corpus).select(F.col(corpus_id), as_double(vec_col).alias("cv")).join(
        q, F.col(corpus_id) != F.col(query_id)
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cosine"), F.asc(corpus_id)
    )
    return (
        scored.select(
            query_id, corpus_id, cosine(F.col("cv"), F.col("qv")).alias("cosine")
        )
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )


def random_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side constants —
    they are part of the plan, not data)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: bit j = (vec . plane_j) > 0."""
    out = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        out = out.bitwiseOR(F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long")))
    return out


def _probe_buckets(bucket: Column, n_planes: int, probes: int) -> Column:
    """The bucket itself plus (optionally) all hamming-1 neighbors —
    multi-probe LSH recovers recall lost at bucket boundaries."""
    buckets = [bucket]
    if probes > 1:
        buckets += [bucket.bitwiseXOR(F.lit(1 << j).cast("long")) for j in range(n_planes)]
    return F.array(*buckets[:probes])


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (d1, d2, cosine) for
    every pair with cosine >= threshold — the semantic-dedup family
    of an LLM training pipeline (near-identical meaning, different
    bytes, invisible to MinHash/SimHash).

    Scale shape mirrors the MinHash path: SRP buckets are the
    candidate generator (same-bucket pairs only — high-cosine pairs
    land in the same bucket with probability (1 - theta/pi)^planes),
    the exact cosine runs only on candidates, and the in-bucket pair
    expansion is capped (a bucket holding a corpus-scale fraction is
    a projection pathology, not a dup cluster). One shuffle on the
    bucket key; no all-pairs join anywhere.
    """
    from irclogbot_spark.operators.dedup import _bucket_pairs

    planes = random_planes(dim, n_planes, seed)
    keyed = ensure_parallelism(corpus).select(
        F.col(id_col), srp_bucket(as_double(vec_col), planes).alias("bucket")
    )
    cand = _bucket_pairs(keyed, id_col, ["bucket"], max_bucket=max_bucket)
    vecs = corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
    s1 = vecs.select(F.col(id_col).alias("d1"), F.col("v").alias("v1"))
    s2 = vecs.select(F.col(id_col).alias("d2"), F.col("v").alias("v2"))
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", cosine(F.col("v1"), F.col("v2")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    probes: int = 9,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only corpus rows sharing one of the
    query's probed SRP buckets.

    At scale the corpus side is a hash-partitioned bucket table
    (bucketBy-able for repeated querying); each query touches
    ~probes/2^n_planes of the corpus instead of all of it.
    """
    planes = random_planes(dim, n_planes, seed)
    c = ensure_parallelism(corpus).select(
        F.col(corpus_id),
        as_double(vec_col).alias("cv"),
        srp_bucket(as_double(vec_col), planes).alias("bucket"),
    )
    # bucket lands in its own projection and the probes XOR the
    # COLUMN: passing the srp_bucket expression straight into
    # _probe_buckets would inline the whole 8-plane fold tree once
    # per probe (9x), and Catalyst pays that both in optimizer time
    # and per-row evaluation (expensive expressions referenced N
    # times are not re-deduplicated)
    qb = queries.select(
        F.col(query_id),
        as_double(vec_col).alias("qv"),
        srp_bucket(as_double(vec_col), planes).alias("b"),
    )
    q = qb.select(
        F.col(query_id),
        F.col("qv"),
        F.explode(_probe_buckets(F.col("b"), n_planes, probes)).alias("bucket"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col(corpus_id) != F.col(query_id))
        .select(query_id, corpus_id, cosine(F.col("cv"), F.col("qv")).alias("cosine"))
        .distinct()
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )
