"""Incremental corpus dedup: a NEW batch of documents against an
already-ingested HISTORY (north-star extension).

A production training-data pipeline never re-dedups the whole corpus
when a crawl lands; it checks the new batch against the accumulated
index. This operator implements that shape end to end:

1. **Exact layer** — md5 content fingerprints. Batch docs whose
   fingerprint exists in history are `exact_dup_history`; among the
   remainder, non-first copies of a fingerprint within the batch are
   `exact_dup_batch` (keep-smallest-id, same convention as
   dedup.dedup_corpus).
2. **Near layer** — MinHash signatures (operators/dedup.py
   machinery) for the exact-survivors and for history, banded; the
   ONLY pair join is batch-bands x history-bands: new data probes
   the historical banded index, history never self-joins. Candidates
   are verified with exact Jaccard over hashed shingle sets
   (candidate ids only, both sides left-semi pruned). Matches are
   `near_dup_history` with the smallest-id partner and its exact
   Jaccard.
3. Everything else is `new`.

At 100 TB: the fingerprint index and the banded signature index are
exactly the two tables a deployment materializes once and appends
per batch — both joins here hash on the index key with the new batch
(small side) driving, so incremental cost scales with the batch, not
the corpus. Within-batch NEAR-dups are deliberately out of scope
(the full-corpus pass — dedup.dedup_corpus — owns that); the exact
layer does handle within-batch copies since they are free on the
fingerprint shuffle.

Reference scope note: the irclogbot reference's whole dedup story is
the content-keyed idempotent upsert (SURVEY §2D H2/H3) — this module
is its corpus-scale generalization from BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import (
    hashed_shingles,
    minhash_signature,
    tokens,
)
from irclogbot_spark.plans.partitioning import ensure_parallelism


def content_fp(text_col: str = "text") -> Column:
    """Exact-layer content fingerprint (md5 — ANSI-portable)."""
    return F.md5(F.col(text_col).cast("binary"))


def _banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int,
    bands: int,
    n: int,
    seed: int,
    hash_fn,
) -> DataFrame:
    """(id, band_idx, band_sig) rows — the banded signature index.
    Shingle-less docs (< n tokens) are excluded (their signature
    lanes would be the sentinel)."""
    if num_perm % bands != 0:
        # same invariant minhash_lsh (dedup.py) enforces: a
        # non-divisible combination would silently drop the trailing
        # signature lanes and degrade recall with no error
        raise ValueError(f"num_perm={num_perm} must be divisible by bands={bands}")
    rows = num_perm // bands
    eligible = ensure_parallelism(df).filter(F.size(tokens(text_col)) >= n)
    sigd = eligible.select(
        F.col(id_col),
        minhash_signature(text_col, num_perm, n, seed, hash_fn).alias("sig"),
    )
    return sigd.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.slice(F.col("sig"), j * rows + 1, rows).alias("band_sig"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(F.col(id_col), F.col("bk.band_idx"), F.col("bk.band_sig"))


def incremental_dedup(
    history: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 16,
    n: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    hash_fn=None,
    max_bucket: int = 1000,
) -> DataFrame:
    """One row per batch doc: (id, verdict, dup_of, jaccard).

    verdict ∈ {exact_dup_history, exact_dup_batch, near_dup_history,
    new}; dup_of is the smallest-id duplicate partner (NULL for new);
    jaccard is the partner's exact Jaccard for the near verdict, NULL
    otherwise. History buckets larger than ``max_bucket`` are skipped
    (degenerate-hash skew guard, same rationale as _bucket_pairs)."""
    keys = ["band_idx", "band_sig"]

    # ---- exact layer ----------------------------------------------------
    hfp = (
        history.select(content_fp(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("hist_dup_of"))
    )
    bfp = batch.select(F.col(id_col), content_fp(text_col).alias("fp"))
    exact_hist = bfp.join(hfp, "fp").select(id_col, "hist_dup_of")
    rem = bfp.join(hfp, "fp", "left_anti")
    w = Window.partitionBy("fp")
    rem = rem.withColumn("keep_id", F.min(id_col).over(w))
    exact_batch = rem.filter(F.col(id_col) != F.col("keep_id")).select(
        id_col, F.col("keep_id").alias("batch_dup_of")
    )
    survivors = batch.join(
        rem.filter(F.col(id_col) == F.col("keep_id")).select(id_col), id_col, "left_semi"
    )

    # ---- near layer: batch survivors probe the history band index -------
    bh = _banded(history, id_col, text_col, num_perm, bands, n, seed, hash_fn)
    bsz = bh.groupBy(*keys).agg(F.count(F.lit(1)).alias("nb"))
    bh_capped = bh.join(bsz.filter(F.col("nb") <= max_bucket).select(*keys), keys, "left_semi")
    bb = _banded(survivors, id_col, text_col, num_perm, bands, n, seed, hash_fn)
    cand = (
        bb.alias("b")
        .join(bh_capped.alias("h"), keys)
        .select(
            F.col(f"b.{id_col}").alias("bid"), F.col(f"h.{id_col}").alias("hid")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    need_ids = cand.select(F.col("bid").alias(id_col)).union(
        cand.select(F.col("hid").alias(id_col))
    ).distinct()
    corpus = history.select(id_col, text_col).unionByName(
        batch.select(id_col, text_col)
    )
    sets = (
        ensure_parallelism(corpus)
        .join(need_ids, id_col, "left_semi")
        .select(
            F.col(id_col),
            F.array_distinct(hashed_shingles(text_col, n, hash_fn)).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    inter = F.size(F.array_intersect(F.col("s1.sh"), F.col("s2.sh")))
    union = F.size(F.col("s1.sh")) + F.size(F.col("s2.sh")) - inter
    jac = inter.cast("double") / union
    near_pairs = (
        cand.join(sets.alias("s1"), F.col("bid") == F.col(f"s1.{id_col}"))
        .join(sets.alias("s2"), F.col("hid") == F.col(f"s2.{id_col}"))
        .select("bid", "hid", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    # smallest-id partner, deterministically carrying ITS jaccard
    near = near_pairs.groupBy("bid").agg(
        F.min(F.struct(F.col("hid"), F.col("jaccard"))).alias("m")
    ).select(
        F.col("bid").alias(id_col),
        F.col("m.hid").alias("near_dup_of"),
        F.col("m.jaccard").alias("near_jaccard"),
    )

    # ---- assemble -------------------------------------------------------
    out = (
        batch.select(id_col)
        .join(exact_hist, id_col, "left")
        .join(exact_batch, id_col, "left")
        .join(near, id_col, "left")
    )
    verdict = (
        F.when(F.col("hist_dup_of").isNotNull(), F.lit("exact_dup_history"))
        .when(F.col("batch_dup_of").isNotNull(), F.lit("exact_dup_batch"))
        .when(F.col("near_dup_of").isNotNull(), F.lit("near_dup_history"))
        .otherwise(F.lit("new"))
    )
    return out.select(
        id_col,
        verdict.alias("verdict"),
        F.coalesce("hist_dup_of", "batch_dup_of", "near_dup_of").alias("dup_of"),
        F.when(F.col("near_dup_of").isNotNull() & F.col("hist_dup_of").isNull()
               & F.col("batch_dup_of").isNull(), F.col("near_jaccard")).alias("jaccard"),
    )
