"""Similarity / semantic-dedup / PQ operator tests."""

import pytest


def test_semantic_dedup_planted_duplicates(spark):
    """operators/semdedup.py: two planted near-identical vectors in
    the same cell collapse to one keeper; the kept one is the LESS
    centroid-similar of the pair only via rank — i.e. the
    lower-ranked (less central) doc shadows the higher-ranked one.
    Orthogonal vectors all survive."""
    import math

    from irclogbot_spark.operators.semdedup import semantic_dedup
    from irclogbot_spark.operators.similarity import train_ivf_centroids

    dim = 8

    def unit(i):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    # 45 degrees from the nearest unit vectors: cosine 0.707 < 0.95,
    # so only the planted identical pair clears the threshold
    dup = [0.7, 0.7] + [0.0] * (dim - 2)
    rows = [(i, unit(i)) for i in range(4)] + [(10, dup), (11, list(dup))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(emb, n_cells=4, n_iter=3)
    out = {
        r.vec_id: r
        for r in semantic_dedup(emb, cents, threshold=0.95).collect()
    }
    assert len(out) == 6
    kept = {i for i, r in out.items() if r.keep}
    dropped = {i for i, r in out.items() if not r.keep}
    # exactly one of the identical pair survives; ties in cent_cos
    # break by id, so 10 (lower id -> lower rank) shadows 11
    assert dropped == {11}
    assert out[11].dup_of == 10
    assert math.isclose(out[11].dup_cosine, 1.0)
    assert kept == {0, 1, 2, 3, 10}


def test_semantic_dedup_oversized_cell_skipped(spark):
    """Cells above max_cell skip dedup wholesale (degenerate-cluster
    guard): every member kept, rank NULL semantics internal."""
    from irclogbot_spark.operators.semdedup import semantic_dedup
    from irclogbot_spark.operators.similarity import train_ivf_centroids

    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(emb, n_cells=2, n_iter=2)
    out = semantic_dedup(emb, cents, threshold=0.99, max_cell=5).collect()
    assert all(r.keep for r in out)


def test_pq_trainer_replica_bit_identical(spark):
    """operators/pq.py: the distributed trainer and the local replica
    produce the SAME codebooks bit-for-bit (the property the oracle's
    inlined literals depend on)."""
    from irclogbot_spark.operators.pq import (
        train_pq_codebooks,
        train_pq_codebooks_local,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dist = train_pq_codebooks(emb, n_sub=8, n_codes=16, n_iter=3)
    rows = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.select("vec_id", "embedding").collect()
    ]
    local = train_pq_codebooks_local(rows, n_sub=8, n_codes=16, n_iter=3)
    assert dist == local


def test_pq_encode_shape_and_range(spark):
    """Codes: one per subspace, each in [0, n_codes); identical
    vectors encode identically."""
    from irclogbot_spark.operators.pq import pq_encode, train_pq_codebooks

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq_codebooks(emb, n_sub=8, n_codes=16, n_iter=2)
    codes = {r.vec_id: r.codes for r in pq_encode(emb, books).collect()}
    assert len(codes) == emb.count()
    for cs in codes.values():
        assert len(cs) == 8
        assert all(0 <= c < 16 for c in cs)


def test_pq_rerank_recall_and_planted_twin(spark):
    """Exact-cosine rerank of the ADC candidates: (a) a planted
    near-identical twin is the rank-1 neighbor; (b) recall@5 vs exact
    kNN clears the floor measured for 32-bit codes on this corpus
    (ADC-only ~0.2, rerank=50 ~0.78 at sf0.001)."""
    from pyspark.sql import functions as F

    from irclogbot_spark.operators.pq import pq_topk, train_pq_codebooks
    from irclogbot_spark.operators.similarity import knn_join

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant a twin of vec 7 (tiny perturbation on one dim)
    twin = emb.filter(F.col("vec_id") == 7).select(
        F.lit(100007).cast("long").alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 1.000001
        ).cast("array<float>").alias("embedding"),
        F.col("label"),
    )
    emb2 = emb.select("vec_id", "embedding", "label").unionByName(twin)
    books = train_pq_codebooks(emb2, n_sub=8, n_codes=16, n_iter=3)
    qs = emb2.filter(F.col("vec_id").isin(list(range(20)))).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq = pq_topk(emb2, qs, books, k=5, rerank=50).collect()
    top1 = {r.query_id: r.vec_id for r in pq if r.pq_rank == 1}
    assert top1[7] == 100007
    exact = {(r.query_id, r.vec_id) for r in knn_join(emb2, qs, k=5).collect()}
    hits = sum((r.query_id, r.vec_id) in exact for r in pq)
    assert hits / len(exact) >= 0.6, hits / len(exact)


def test_pq_validation_guards(spark):
    from irclogbot_spark.operators.pq import pq_topk, train_pq_codebooks

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError):
        train_pq_codebooks(emb, n_sub=7)  # 64 % 7 != 0
    books = train_pq_codebooks(emb, n_sub=8, n_codes=16, n_iter=1)
    qs = emb.limit(1).selectExpr("vec_id AS query_id", "embedding")
    with pytest.raises(ValueError):
        pq_topk(emb, qs, books, k=5, rerank=3)  # rerank < k


def test_kmeans_clusters_partition_all_vectors(spark, sf_dir):
    """emb_kmeans_clusters invariants: cells partition the corpus
    (sizes sum to N), every cell id is in range, reps are members."""
    import __spark_entry__ as e

    rows = e.queries()["emb_kmeans_clusters"](spark, sf_dir).collect()
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_vecs"] for r in rows) == emb_n
    assert all(0 <= r["cell"] < 16 for r in rows)
    assert all(r["n_vecs"] >= 1 for r in rows)


def test_anchor_gate_ranks_aligned_vectors_first(spark):
    from irclogbot_spark.operators.similarity import (
        anchor_centroid_milli,
        anchor_gate,
    )

    # anchors point along +e0; planted vec 100 aligns, 101 is
    # orthogonal, 102 anti-aligned
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (100, [5.0, 0.1, 0.0]),
        (101, [0.0, 3.0, 0.0]),
        (102, [-2.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = anchor_centroid_milli(emb.filter("vec_id < 2"))
    assert cent == [1900, 100, 0]  # exact integer milli sums
    out = [r.vec_id for r in anchor_gate(emb, cent, k=5).collect()]
    # aligned first (anchors + 100), orthogonal next, anti-aligned last
    assert set(out[:3]) == {0, 1, 100}
    assert out[3] == 101 and out[4] == 102


def test_anchor_gate_is_map_only_until_topk(spark):
    from irclogbot_spark.operators.similarity import anchor_gate
    from irclogbot_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    plan = (
        anchor_gate(emb, [1000] * 64, k=10)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # no join anywhere: the centroid is a literal, scoring is in-row
    assert "Join" not in plan
