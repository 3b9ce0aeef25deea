"""Hybrid retrieval — lexical (BM25) and vector (cosine kNN) hit
lists fused by Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
SIGIR 2009): score(d) = sum over lists of 1 / (c + rank_d).

This is the modern search-stack shape the reference's ES surface
evolves into (ES exposes exactly this as `rrf` retriever ranking):
two independent top-k retrievers — each already scale-shaped (BM25:
one broadcast stats row, no corpus shuffle; kNN: broadcast queries,
one corpus scan or an ANN index probe) — joined only over their tiny
top-R candidate lists. The fusion itself touches 2R rows; corpus
cost is entirely inside the retrievers, which can be swapped for
their index-backed forms (inverted index / PQ / IVF) without
changing the fusion.

Determinism: RRF is RANK-based — the fused score is a sum of exact
double divisions 1.0 / (c + rank), no corpus-dependent float chains
— so the whole operator value-hashes against an ANSI twin as long as
each retriever's ranking is deterministic (both here break ties on
doc id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    text_hits: DataFrame,
    vec_hits: DataFrame,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    text_rank_col: str = "text_rank",
    vec_rank_col: str = "vec_rank",
) -> DataFrame:
    """Fuse two ranked hit lists (id, rank) into RRF top-k.

    A full outer join keeps docs found by only one retriever (they
    score on that list alone — the standard RRF convention); the
    final top-k is a TakeOrdered over the fused candidate set, which
    is at most |text_hits| + |vec_hits| rows — driver-bounded by the
    retrievers' own R, never corpus-sized.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    t = text_hits.select(F.col(id_col), F.col(text_rank_col).cast("long").alias("_tr"))
    v = vec_hits.select(F.col(id_col), F.col(vec_rank_col).cast("long").alias("_vr"))
    fused = t.join(v, id_col, "full_outer").select(
        F.col(id_col),
        F.col("_tr").alias(text_rank_col),
        F.col("_vr").alias(vec_rank_col),
        (
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("_tr")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("_vr")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec_id: int,
    k: int = 10,
    r: int = 20,
    c: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """BM25 top-r + exact-cosine top-r (query = the embedding row
    with ``query_vec_id``; embeddings join docs on vec_id == doc_id)
    fused by RRF. The vector retriever here is the exact scan — swap
    in pq_topk / ivf_topk / ann_topk for the index-backed forms at
    scale; the fusion is retriever-agnostic.
    """
    from irclogbot_spark.functions.text import bm25_rank
    from irclogbot_spark.operators.similarity import knn_join

    text_top = bm25_rank(docs, terms, id_col=id_col, k=r)
    # bm25_rank returns the sorted top-r; rank it explicitly (the
    # window moves only r rows — a single tiny task, not a corpus sort)
    wt = Window.orderBy(F.desc("score"), F.asc(id_col))
    text_ranked = text_top.select(
        F.col(id_col), F.row_number().over(wt).alias("text_rank")
    )
    qs = embeddings.filter(F.col(vec_id_col) == query_vec_id).select(
        F.col(vec_id_col).alias("query_id"), "embedding"
    )
    vec_ranked = knn_join(embeddings, qs, k=r).select(
        F.col(vec_id_col).alias(id_col), F.col("knn_rank").alias("vec_rank")
    )
    return rrf_fuse(text_ranked, vec_ranked, k=k, c=c, id_col=id_col)


def hybrid_search_indexed(
    postings,
    doclens,
    ann_index,
    terms: list[str],
    query_vec_id: int,
    centroids: list[list[float]],
    books: list[list[list[float]]],
    k: int = 10,
    r: int = 20,
    c: int = 60,
    n_probe: int = 4,
    rerank: int = 20,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """The INDEX-BACKED form of ``hybrid_search``: BM25 over the
    materialized inverted index (``functions.text.build_text_index``
    frames — the postings scan filters to the query terms, pruning
    at rest; the corpus text is never touched) fused with IVF-PQ ANN
    over a pre-encoded index (``operators.pq.encode_ivfpq`` rows /
    ``streaming.annindex.load_index`` — cell probes prune partitions
    at rest). The fusion is the identical retriever-agnostic
    ``rrf_fuse``; with exhaustive ANN parameters (n_probe = n_cells,
    rerank >= corpus) the result is bit-identical to
    ``hybrid_search``'s exact scans (pinned by test), and with
    production parameters it degrades only by ANN recall.

    The query vector is fetched from the ANN index itself (it
    stores raw vectors for the rerank stage), so no separate
    embeddings table is needed at probe time."""
    from irclogbot_spark.functions.text import bm25_rank_indexed
    from irclogbot_spark.operators.pq import ivfpq_search

    text_top = bm25_rank_indexed(postings, doclens, terms, id_col=id_col, k=r)
    wt = Window.orderBy(F.desc("score"), F.asc(id_col))
    text_ranked = text_top.select(
        F.col(id_col), F.row_number().over(wt).alias("text_rank")
    )
    qs = ann_index.filter(F.col(vec_id_col) == query_vec_id).select(
        F.col(vec_id_col).alias("query_id"), "embedding"
    )
    vec_ranked = ivfpq_search(
        ann_index,
        qs,
        centroids,
        books,
        k=r,
        n_probe=n_probe,
        rerank=max(rerank, r),
        corpus_id=vec_id_col,
    ).select(F.col(vec_id_col).alias(id_col), F.col("pq_rank").alias("vec_rank"))
    return rrf_fuse(text_ranked, vec_ranked, k=k, c=c, id_col=id_col)
