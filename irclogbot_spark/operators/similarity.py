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


def norm(a: Column) -> Column:
    """sqrt(a . a). Pair-scoring operators precompute this per ROW so
    the per-pair cost is one fold instead of three — dividing by the
    stored norms is bit-identical to cosine() (same association:
    dot / (norm_a * norm_b))."""
    return F.sqrt(dot(a, a))


def _cos_pre(d: Column, na: Column, nb: Column) -> Column:
    return d / (na * nb)


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
        queries.select(
            F.col(query_id),
            as_double(vec_col).alias("qv"),
            norm(as_double(vec_col)).alias("qn"),
        )
    )
    scored = (
        ensure_parallelism(corpus)
        .select(
            F.col(corpus_id),
            as_double(vec_col).alias("cv"),
            norm(as_double(vec_col)).alias("cn"),
        )
        .join(q, F.col(corpus_id) != F.col(query_id))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cosine"), F.asc(corpus_id)
    )
    return (
        scored.select(
            query_id,
            corpus_id,
            _cos_pre(
                dot(F.col("cv"), F.col("qv")), F.col("cn"), F.col("qn")
            ).alias("cosine"),
        )
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    ceiling: float = 0.95,
) -> DataFrame:
    """Contrastive hard-negative mining: per anchor (query), the top-k
    most-similar corpus rows with a DIFFERENT label, below a cosine
    ``ceiling`` — the standard semi-hard band of contrastive /
    embedding training (most informative negatives; the ceiling fences
    out mislabeled near-duplicates that would poison the loss as
    false negatives).

    Same scale shape as knn_join (the anchor set is bounded and
    broadcast; ONE corpus scan; per-anchor partial top-k via
    TakeOrderedAndProject-able window) — at 100 TB swap the scan arm
    for the IVF/PQ candidate generator and keep this exact ranking
    stage, the hybrid_search index-swap convention.

    Returns (query_id, corpus_id, label, cosine, neg_rank),
    deterministic corpus_id tiebreak.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id),
            F.col(label_col).alias("_qlabel"),
            as_double(vec_col).alias("qv"),
            norm(as_double(vec_col)).alias("qn"),
        )
    )
    scored = (
        ensure_parallelism(corpus)
        .select(
            F.col(corpus_id),
            F.col(label_col),
            as_double(vec_col).alias("cv"),
            norm(as_double(vec_col)).alias("cn"),
        )
        .join(
            q,
            (F.col(corpus_id) != F.col(query_id))
            & (F.col(label_col) != F.col("_qlabel")),
        )
        .select(
            query_id,
            corpus_id,
            label_col,
            _cos_pre(
                dot(F.col("cv"), F.col("qv")), F.col("cn"), F.col("qn")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") < F.lit(float(ceiling)))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return scored.withColumn("neg_rank", F.row_number().over(w)).filter(
        F.col("neg_rank") <= k
    )


def random_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side constants —
    they are part of the plan, not data)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: bit j = (vec . plane_j) > 0.

    The plane table ships as one parsed SQL literal and the per-plane
    bits come from a single transform lambda + bitwise-OR fold —
    identical bucket values to the old unrolled per-plane expressions
    at a fraction of the plan-construction cost (see
    functions/lits.py)."""
    from irclogbot_spark.functions.lits import lit_double_matrix, lit_long_array

    flags = F.transform(
        lit_double_matrix(planes),
        lambda p: F.when(dot(vec, p) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    pows = lit_long_array([1 << j for j in range(len(planes))])
    # sum of disjoint powers of two == the bitwise OR of the old
    # unrolled form — same bucket ids
    return F.aggregate(
        F.zip_with(flags, pows, lambda f, w: f * w),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def _probe_buckets(bucket: Column, n_planes: int, probes: int) -> Column:
    """The bucket itself plus (optionally) all hamming-1 neighbors —
    multi-probe LSH recovers recall lost at bucket boundaries."""
    buckets = [bucket]
    if probes > 1:
        buckets += [bucket.bitwiseXOR(F.lit(1 << j).cast("long")) for j in range(n_planes)]
    return F.array(*buckets[:probes])


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical-ish k-means centroids for an IVF index: assignment is
    argmax cosine (= argmax dot against UNIT centroids — data vectors
    need no normalization, cosine cell choice is scale-invariant, so
    the hot path stays one fold per cell); the update step averages
    raw member vectors and re-normalizes the mean.

    Distributed shape: assignment and the per-dimension mean are
    DataFrame ops (posexplode -> groupBy(cell, dim) -> sum); only the
    k x dim centroid table itself returns to the driver each round —
    metadata-sized (16x64 doubles here), the same driver traffic every
    iterative ML trainer pays. Init is deterministic: the first
    n_cells vectors by id (reproducible plans beat random restarts for
    an index whose cells only need to be balanced, not optimal).

    FULLY deterministic, partitioning included: the per-cell
    accumulation sums floor(x * 2^30) as BIGINT — integer addition is
    associative, so the result is identical under any partitioning /
    visit order, unlike a double SUM (the 2^-30 quantization is noise
    at clustering granularity). That makes the whole trainer a pure
    function of the corpus, replicable bit-for-bit on the driver
    (``train_ivf_centroids_local``) — which is what lets ivf_topk
    carry a value-hashed DuckDB oracle with the learned centroids
    inlined as literals.
    """
    import numpy as np

    # ONE materialization of the slim (id, vector) projection for the
    # whole training loop (round-13 optimization): each of the n_iter
    # assignment+update rounds (and the seed collect) otherwise re-ran
    # the scan + repartition. O(corpus embeddings) on local disk — the
    # iterative-trainer trade prep.py budgets.
    vecs = (
        ensure_parallelism(corpus)
        .select(F.col(id_col), as_double(vec_col).alias("v"))
        .localCheckpoint(eager=True)
    )
    seed_rows = vecs.orderBy(id_col).limit(n_cells).collect()
    centroids = [
        (np.array(r.v) / (np.linalg.norm(r.v) or 1.0)).tolist() for r in seed_rows
    ]
    dim = len(centroids[0])
    for _ in range(n_iter):
        assigned = vecs.select(
            "v", _cell_dots(F.col("v"), centroids).alias("dots")
        ).select("v", _argmax_cell(F.col("dots")).alias("cell"))
        sums = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(
                F.sum(F.floor(F.col("x") * F.lit(float(_IVF_QUANT))).cast("long")).alias(
                    "s"
                )
            )
            .collect()
        )
        acc = np.zeros((n_cells, dim))
        for r in sums:
            acc[r.cell][r.dim] = r.s / _IVF_QUANT
        for j in range(n_cells):
            norm = float(np.linalg.norm(acc[j]))
            if norm > 0:
                centroids[j] = (acc[j] / norm).tolist()
            # empty cell: keep the previous centroid (deterministic)
    return centroids


#: fixed-point scale for the trainer's order-free integer accumulation
_IVF_QUANT = 1 << 30


def train_ivf_centroids_local(
    rows: list[tuple[int, list[float]]], n_cells: int = 16, n_iter: int = 5
) -> list[list[float]]:
    """Driver-side replica of ``train_ivf_centroids`` — bit-identical
    by construction, for oracle-building and trainer verification.

    ``rows`` is the full (id, vector) corpus. Every float operation
    mirrors the Spark expression tree exactly: dot products are
    sequential left-folds of per-element products (the F.aggregate /
    zip_with order), assignment takes the FIRST argmax
    (array_position semantics), accumulation sums floor(x * 2^30) in
    exact integers, and normalization runs the same numpy calls on
    the same float64 values.
    """
    import math

    import numpy as np

    rows = sorted(rows, key=lambda r: r[0])
    centroids = [
        (np.array(v) / (np.linalg.norm(v) or 1.0)).tolist() for _, v in rows[:n_cells]
    ]
    dim = len(centroids[0])
    for _ in range(n_iter):
        sums = [[0] * dim for _ in range(n_cells)]
        for _, v in rows:
            dots = []
            for c in centroids:
                acc = 0.0
                for x, y in zip(v, c):
                    acc = acc + x * y  # left fold, F.aggregate order
                dots.append(acc)
            cell = dots.index(max(dots))  # first argmax, array_position order
            srow = sums[cell]
            for d, x in enumerate(v):
                srow[d] += math.floor(x * float(_IVF_QUANT))
        acc2 = np.zeros((n_cells, dim))
        for j in range(n_cells):
            for d in range(dim):
                acc2[j][d] = sums[j][d] / _IVF_QUANT
        for j in range(n_cells):
            norm = float(np.linalg.norm(acc2[j]))
            if norm > 0:
                centroids[j] = (acc2[j] / norm).tolist()
    return centroids


def _cell_dots(v: Column, centroids: list[list[float]]) -> Column:
    """Per-cell dot products as one array: F.transform over ONE
    plan-constant array-of-arrays centroid literal — a single fold
    lambda evaluated k times at runtime, identical arithmetic to k
    unrolled dot expressions but a k-times smaller plan (the unrolled
    form's optimizer/codegen time dominated small-SF latency; see
    pq._book_lit for the measured version of the same lesson)."""
    from irclogbot_spark.functions.lits import lit_double_matrix

    return F.transform(lit_double_matrix(centroids), lambda c: dot(v, c))


def _argmax_cell(dots: Column) -> Column:
    """argmax over a MATERIALIZED dots column. Callers must alias
    _cell_dots into its own projection first: array_position +
    array_max reference the operand twice, and inlining the 16-fold
    dots expression here would evaluate it twice per row."""
    return (F.array_position(dots, F.array_max(dots)) - F.lit(1)).cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score only corpus rows in the query's
    n_probe nearest cells — the inverted-file alternative to SRP-LSH
    (ann_topk). Same output shape (query_id, vec_id, cosine,
    knn_rank).

    At scale the cell id is a precomputed partition/bucket column
    (write once, probe forever); each query touches ~n_probe/n_cells
    of the corpus. Centroids are plan constants after training, so
    assignment is map-only — no shuffle until the per-query top-k.
    """
    c = ensure_parallelism(corpus).select(
        F.col(corpus_id),
        as_double(vec_col).alias("cv"),
        norm(as_double(vec_col)).alias("cn"),
        _cell_dots(as_double(vec_col), centroids).alias("dots"),
    ).select(
        F.col(corpus_id),
        F.col("cv"),
        F.col("cn"),
        _argmax_cell(F.col("dots")).alias("cell"),
    )
    # per-query probe cells: (-dot, cell) structs sorted ascending,
    # sliced to n_probe — computed on the broadcast query side.
    # dot ordering == cosine ordering (unit centroids, fixed query
    # norm), so no normalization anywhere in the plan
    qn = queries.select(
        F.col(query_id),
        as_double(vec_col).alias("qv"),
        norm(as_double(vec_col)).alias("qnorm"),
    )
    from irclogbot_spark.functions.lits import lit_double_matrix

    cl = lit_double_matrix(centroids)
    cell_dots = F.transform(
        cl,
        lambda c, j: F.struct(
            (-dot(F.col("qv"), c)).alias("negdot"), j.cast("int").alias("cell")
        ),
    )
    qcells = qn.select(
        F.col(query_id),
        F.col("qv"),
        F.col("qnorm"),
        F.explode(F.slice(F.array_sort(cell_dots), 1, n_probe)).alias("p"),
    ).select(query_id, "qv", "qnorm", F.col("p.cell").alias("cell"))
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        c.join(F.broadcast(qcells), "cell")
        .filter(F.col(corpus_id) != F.col(query_id))
        .select(
            query_id,
            corpus_id,
            _cos_pre(
                dot(F.col("cv"), F.col("qv")), F.col("cn"), F.col("qnorm")
            ).alias("cosine"),
        )
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )


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
    vecs = corpus.select(
        F.col(id_col),
        as_double(vec_col).alias("v"),
        norm(as_double(vec_col)).alias("vn"),
    )
    s1 = vecs.select(
        F.col(id_col).alias("d1"), F.col("v").alias("v1"), F.col("vn").alias("n1")
    )
    s2 = vecs.select(
        F.col(id_col).alias("d2"), F.col("v").alias("v2"), F.col("vn").alias("n2")
    )
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            _cos_pre(
                dot(F.col("v1"), F.col("v2")), F.col("n1"), F.col("n2")
            ).alias("cosine"),
        )
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
        norm(as_double(vec_col)).alias("cn"),
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
        norm(as_double(vec_col)).alias("qn"),
        srp_bucket(as_double(vec_col), planes).alias("b"),
    )
    q = qb.select(
        F.col(query_id),
        F.col("qv"),
        F.col("qn"),
        F.explode(_probe_buckets(F.col("b"), n_planes, probes)).alias("bucket"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col(corpus_id) != F.col(query_id))
        .select(
            query_id,
            corpus_id,
            _cos_pre(
                dot(F.col("cv"), F.col("qv")), F.col("cn"), F.col("qn")
            ).alias("cosine"),
        )
        .distinct()
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )


# ------------------------------------------------ anchor-score quality gate
def anchor_centroid_milli(
    anchors: DataFrame, vec_col: str = "embedding"
) -> list[int]:
    """Integer-milli anchor centroid DIRECTION: coordinate j =
    SUM over anchors of round(x_j * 1000) — an exact, order-free
    BIGINT (cross-engine reproducible: float summation order can
    never perturb it). The vector is deliberately left UN-divided by
    the anchor count: cosine scoring is scale-invariant, so the raw
    integer sum IS the centroid direction and no float division ever
    enters the learned constant. The collect is dimension-sized (the
    _IVF_CENTROIDS convention), never corpus data."""
    cent = (
        anchors.select(F.posexplode(as_double(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum(F.round(F.col("x") * 1000).cast("long")).alias("c"))
        .orderBy("pos")
        .collect()
    )
    return [int(r.c) for r in cent]


def anchor_gate(
    emb: DataFrame,
    centroid_milli: list[int],
    k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """CLIP-score-style data filtering (the DataComp/LAION recipe —
    keep the k corpus items best aligned with a trusted anchor set):
    score every vector by cosine against the anchor centroid and keep
    the deterministic top-k (score desc, id asc tiebreak).

    Scale shape: the centroid is a plan constant (a literal array),
    so scoring is MAP-ONLY over the corpus — one in-row fold per
    vector, no join, no shuffle until the single top-k aggregation
    of (id, score) pairs; vectors never move. At 100 TB this is the
    cheapest possible full-corpus pass, the same economics as the
    JL-projection scorer."""
    cvec = F.array(*[F.lit(float(c)) for c in centroid_milli])
    scored = emb.select(
        F.col(id_col),
        cosine(as_double(vec_col), cvec).alias("anchor_cos"),
    )
    return scored.orderBy(F.desc("anchor_cos"), F.asc(id_col)).limit(k)
