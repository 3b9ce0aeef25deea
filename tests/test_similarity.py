

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
