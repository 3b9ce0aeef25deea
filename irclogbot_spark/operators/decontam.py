"""Train/test contamination detection over n-gram overlap.

The standard eval-decontamination pass of an LLM data pipeline: a
test/eval document is contaminated if it shares (enough) long n-grams
with any training document. Reference pipelines (Dolma, RedPajama,
GPT-3 appendix C) all reduce to the same relational shape, which Spark
expresses natively:

    train --shingle+hash--> distinct hashes --+
                                              |--- hash-equality join
    test  --shingle+hash--> (doc, hash) ------+        |
                                                 groupBy test doc
                                                 overlap counts

Scale design (the 100 TB path):
- Both sides shingle map-side via ``dedup.hashed_shingles`` (the same
  tokenizer/shingler the MinHash family uses), so the join moves
  8-byte hashes, never shingle strings.
- The train side collapses to DISTINCT hashes before the join: partial
  aggregation prunes in-partition repeats map-side, and the joined
  payload is one column. At candidates ≪ corpus the train side
  dominates; nothing else touches it.
- The join output is immediately re-aggregated per test doc — no
  row explosion survives the stage boundary.
- With a small eval set (the common case) Spark's AQE converts the
  hash join to broadcast automatically; the train scan then runs
  join+count in ONE map pass with no shuffle of the corpus at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import hashed_shingles
from irclogbot_spark.plans.partitioning import ensure_parallelism


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
    eval_gate: bool = True,
) -> DataFrame:
    """Per test-document contamination stats vs a training corpus.

    Returns one row per test doc: ``(id_col, n_ngrams, n_shared,
    contaminated)`` where n_ngrams counts the doc's distinct hashed
    n-grams, n_shared counts how many also occur anywhere in train,
    and contaminated = n_shared > 0. Docs too short to form a single
    n-gram report (0, 0, false).

    ``hash_fn`` defaults to xxhash31 (scale path); pass
    ``dedup.md5_hash31`` for the DuckDB-checkable pipeline.

    ``eval_gate`` (round 9 — default on): semi-join the TRAIN gram
    stream against the broadcast distinct EVAL gram set BEFORE the
    train-side distinct. Exact — a train gram that matches no eval
    gram can't contribute to any overlap count — and it converts the
    pipeline's one corpus-sized exchange (distinct over ALL train
    grams) into a matched-grams-sized one: at 100 TB the train
    corpus sheds ~everything map-side and only eval-colliding hashes
    ever enter an exchange. Requires the eval gram set to be
    broadcastable (eval suites are dimension-sized by nature); pass
    ``eval_gate=False`` for a rare corpus-sized "eval"."""
    # ensure_parallelism: the shingle+hash projection is the dominant
    # CPU stage; a single-file scan would otherwise run it on one core
    # (at cluster scale the scan already has many partitions and this
    # is a no-op).
    te = ensure_parallelism(test).select(
        F.col(id_col), hashed_shingles(F.col(text_col), n, hash_fn).alias("hs")
    ).select(id_col, F.explode_outer("hs").alias("h"))
    tr = (
        ensure_parallelism(train)
        .select(hashed_shingles(F.col(text_col), n, hash_fn).alias("hs"))
        .select(F.explode("hs").alias("h"))
    )
    if eval_gate:
        # The gate makes `te` a TWO-consumer frame (broadcast probe
        # build + the final left join): without a materialization
        # barrier the eval shingle/hash pipeline re-executes per
        # consumer. Lazy localCheckpoint — computed at the probe
        # build (the first action), reused by the join; eval suites
        # are dimension-sized so the local copy is bounded.
        te = te.localCheckpoint(eager=False)
        probe = te.select("h").filter(F.col("h").isNotNull()).distinct()
        tr = tr.join(F.broadcast(probe), "h", "leftsemi")
    tr = tr.distinct()
    hit = F.when(F.col("h").isNotNull() & F.col("hit").isNotNull(), 1).otherwise(0)
    return (
        te.join(tr.withColumn("hit", F.lit(1)), "h", "left")
        .groupBy(id_col)
        .agg(
            F.count("h").alias("n_ngrams"),
            F.sum(hit).cast("long").alias("n_shared"),
        )
        .withColumn("contaminated", F.col("n_shared") > 0)
    )


def semantic_decontamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.99,
    corpus_id: str = "vec_id",
    eval_id: str = "eval_id",
    vec_col: str = "embedding",
    eval_vec_col: str | None = None,
) -> DataFrame:
    """Embedding-space decontamination: flag every corpus vector
    whose cosine to ANY eval-set vector reaches ``threshold`` — the
    semantic complement of the n-gram pass (catches paraphrased or
    reformatted eval leakage that shares no 8-gram).

    Returns one row per corpus vector: ``(corpus_id, max_sim,
    flagged)``; with an empty eval set max_sim is NULL and nothing is
    flagged.

    Scale shape: the eval set aggregates into ONE row of
    (id, vector, norm) structs that broadcasts (eval sets are
    bounded); the corpus scan then computes its max-similarity
    IN-ROW over that packed array — zero shuffles of the corpus, no
    per-pair row explosion, row count preserved by construction.
    Per-row cost is |eval| dot products, the inherent work. The
    1-row broadcast crossJoin is the sanctioned bounded pattern
    (sampling.py's totals frame); corpus rows never move.
    """
    from irclogbot_spark.operators.similarity import _cos_pre, as_double, dot, norm

    ev = F.broadcast(
        eval_df.select(
            F.struct(
                F.col(eval_id).alias("eid"),
                as_double(eval_vec_col or vec_col).alias("qv"),
                norm(as_double(eval_vec_col or vec_col)).alias("qn"),
            ).alias("e")
        ).agg(F.collect_list("e").alias("_evs"))
    )
    sims = F.transform(
        F.col("_evs"),
        lambda e: _cos_pre(
            dot(F.col("cv"), e["qv"]), F.col("cn"), e["qn"]
        ),
    )
    return (
        ensure_parallelism(corpus)
        .select(
            F.col(corpus_id),
            as_double(vec_col).alias("cv"),
            norm(as_double(vec_col)).alias("cn"),
        )
        .crossJoin(ev)
        .select(
            corpus_id,
            F.array_max(sims).alias("max_sim"),
        )
        .withColumn(
            "flagged",
            F.coalesce(F.col("max_sim") >= threshold, F.lit(False)),
        )
    )
