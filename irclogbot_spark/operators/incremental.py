"""Incremental corpus dedup: a NEW batch of documents against an
already-ingested HISTORY (north-star extension).

A production training-data pipeline never re-dedups the whole corpus
when a crawl lands; it checks the new batch against the accumulated
index. Round 4 makes that index a first-class, persistable artifact:

* ``fingerprint_index(df)``  -> (fp, doc_id)            — exact layer
* ``band_index(df, ...)``    -> (doc_id, band_idx, band_sig) — near layer
* ``dedup_against_index(batch, fp_index, band_index, history_text)``
  — verdicts the batch by PROBING the two indexes; history TEXT is
  touched only to verify near-dup candidates (left-semi pruned to
  candidate ids). Nothing re-derives fingerprints or MinHash
  signatures from history text.
* ``incremental_dedup(history, batch)`` — the one-shot form: builds
  the two indexes from the history frame and delegates. Output and
  semantics unchanged from rounds 2-3 (same oracle).

Verdict classes:

1. **Exact layer** — md5 content fingerprints. Batch docs whose
   fingerprint exists in the index are `exact_dup_history`; among the
   remainder, non-first copies of a fingerprint within the batch are
   `exact_dup_batch` (keep-smallest-id, same convention as
   dedup.dedup_corpus).
2. **Near layer** — MinHash signatures (operators/dedup.py
   machinery) for the exact-survivors, banded; the ONLY pair join is
   batch-bands x index-bands: new data probes the banded index,
   history never self-joins. Candidates are verified with exact
   Jaccard over hashed shingle sets (candidate ids only, both sides
   left-semi pruned). Matches are `near_dup_history` with the
   smallest-id partner and its exact Jaccard.
3. With ``within_batch=True``, exact-survivors are additionally
   banded against EACH OTHER; a doc with a verified >= threshold
   partner of smaller id is `near_dup_batch` (pairwise smaller-id
   rule — full transitive clustering stays dedup.dedup_corpus's job).
4. Everything else is `new`.

At 100 TB: the fingerprint index (~24 bytes/doc) and the band index
are append-only side tables a deployment materializes once and
appends per admitted batch (streaming/corpus.py does exactly this).
Probing is a map-side scan of the narrow index joined against the
small batch side — no shuffle of the index, no re-hash of history
text; per-batch cost = O(index scan) + O(batch), with history text
read only for candidate verification.

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


def fingerprint_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(fp, doc_id) — the exact-layer index rows for ``df``. For a
    deduplicated history the fp values are unique; the probe in
    ``dedup_against_index`` still min-aggregates matches, so an index
    with duplicate fps (or replay-duplicated rows) stays correct."""
    return df.select(content_fp(text_col).alias("fp"), F.col(id_col))


def band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 16,
    n: int = 5,
    seed: int = 42,
    hash_fn=None,
) -> DataFrame:
    """(id, band_idx, band_sig) rows — the banded MinHash signature
    index. Shingle-less docs (< n tokens) are excluded (their
    signature lanes would be the sentinel)."""
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
    # one expr() parse instead of `bands` struct Column builds (the
    # py4j construction-cost rule — see minhash_signature); the
    # transform produces the identical (band_idx, band_sig) structs
    return sigd.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), j -> "
                f"struct(j AS band_idx, slice(sig, j * {rows} + 1, {rows}) AS band_sig))"
            )
        ).alias("bk"),
    ).select(F.col(id_col), F.col("bk.band_idx"), F.col("bk.band_sig"))


def _ckpt(df: DataFrame, materialize: bool) -> DataFrame:
    return df.localCheckpoint(eager=True) if materialize else df


def dedup_against_index(
    batch: DataFrame,
    fp_index: DataFrame,
    band_index_df: DataFrame,
    history_text: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 16,
    n: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    hash_fn=None,
    max_bucket: int = 1000,
    within_batch: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """One row per batch doc: (id, verdict, dup_of, jaccard).

    verdict ∈ {exact_dup_history, exact_dup_batch, near_dup_history,
    near_dup_batch (opt-in), new}; dup_of is the smallest-id duplicate
    partner (NULL for new); jaccard is the partner's exact Jaccard for
    the near verdicts, NULL otherwise.

    ``fp_index``/``band_index_df`` must carry the schemas produced by
    :func:`fingerprint_index` / :func:`band_index` with the SAME
    (num_perm, bands, n, seed, hash_fn); ``history_text`` is the
    (id, text) corpus, read ONLY to verify candidates. Index buckets
    larger than ``max_bucket`` distinct history docs are skipped
    (degenerate-hash skew guard, same rationale as _bucket_pairs) —
    measured on the PROBED buckets only, so no index-wide groupBy.

    ``materialize=False`` skips the eager localCheckpoints so the full
    lazy plan stays inspectable (plan-shape tests); production keeps
    the default to evaluate the multiply-consumed frames once.
    """
    keys = ["band_idx", "band_sig"]

    # ---- exact layer: probe the fingerprint index -----------------------
    bfp = batch.select(F.col(id_col), content_fp(text_col).alias("fp"))
    # join-then-aggregate: only MATCHED index rows reach the groupBy,
    # so the index itself is never shuffled (vs. grouping all of it)
    hfp = (
        fp_index.join(bfp.select("fp").distinct(), "fp")
        .groupBy("fp")
        .agg(F.min(id_col).alias("hist_dup_of"))
    )
    # ONE left join replaces the former inner + left_anti pair
    # (round-13 optimization): the matched/unmatched split is a
    # NULL-flag filter over the same joined frame, so the batch
    # fingerprint projection meets hfp once instead of twice.
    bj = bfp.join(hfp, "fp", "left")
    exact_hist = bj.filter(F.col("hist_dup_of").isNotNull()).select(
        id_col, "hist_dup_of"
    )
    rem = bj.filter(F.col("hist_dup_of").isNull()).select(id_col, "fp")
    w = Window.partitionBy("fp")
    rem = rem.withColumn("keep_id", F.min(id_col).over(w))
    exact_batch = rem.filter(F.col(id_col) != F.col("keep_id")).select(
        id_col, F.col("keep_id").alias("batch_dup_of")
    )
    survivors = batch.join(
        rem.filter(F.col(id_col) == F.col("keep_id")).select(id_col), id_col, "left_semi"
    )

    # ---- near layer: batch survivors probe the band index ---------------
    bb = band_index(survivors, id_col, text_col, num_perm, bands, n, seed, hash_fn)
    if within_batch:
        # the wb arm references bb three more times (both self-join
        # sides + the bucket-size cap), and band_index is a pure
        # projection — no exchange for Spark to reuse — so without a
        # barrier the 32-permutation signature fold runs 3-4x per
        # call (round 8: measured ~1.4x on the _wb query). One eager
        # materialization of the narrow (id, band) rows fixes it;
        # the non-wb path keeps its single lazy reference.
        bb = _ckpt(bb, materialize)
    # bucket-size cap over PROBED buckets: every history doc in a
    # probed bucket appears in the joined frame, so countDistinct(hid)
    # there equals the full history bucket size — same cap semantics
    # as the r2/r3 index-wide count, without an index-wide groupBy
    # (the probe path must not pay O(index) shuffles per batch). The
    # count rides WINDOW functions over the band join's own hash
    # partitioning (dense_rank then max == countDistinct — exact, and
    # unlike collect_set it never materializes a degenerate bucket as
    # one in-memory array), so the cap costs NO new exchange and no
    # separate aggregate+semi-join subtree (round-14 optimization,
    # guide §2.4: two operations keyed the same way share one
    # exchange).
    def _capped_distinct(joined: DataFrame, partner: str) -> DataFrame:
        return (
            joined.withColumn(
                "_dr",
                F.dense_rank().over(Window.partitionBy(*keys).orderBy(partner)),
            )
            .withColumn("nb", F.max("_dr").over(Window.partitionBy(*keys)))
            .filter(F.col("nb") <= max_bucket)
            .select("bid", F.col(partner).alias("pid"))
            .distinct()
        )

    # history arm: batch bands probe the index; the distinct also
    # collapses replay-duplicated index rows
    probe = _capped_distinct(
        bb.alias("b")
        .join(band_index_df.alias("h"), keys)
        .select(
            *keys,
            F.col(f"b.{id_col}").alias("bid"),
            F.col(f"h.{id_col}").alias("hid"),
        ),
        "hid",
    ).withColumn("_arm", F.lit("h"))
    if within_batch:
        # within-batch arm: survivors band against each other; larger
        # id is the potential dup, smaller the partner
        # (keep-smallest-id). Same window cap as the history arm,
        # applied to the batch's own bucket sizes.
        bb_capped = (
            bb.withColumn(
                "_dr",
                F.dense_rank().over(Window.partitionBy(*keys).orderBy(id_col)),
            )
            .withColumn("nb", F.max("_dr").over(Window.partitionBy(*keys)))
            .filter(F.col("nb") <= max_bucket)
            .select(*keys, id_col)
        )
        wb_arm = (
            bb_capped.alias("x")
            .join(bb_capped.alias("y"), keys)
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(
                F.col(f"y.{id_col}").alias("bid"),
                F.col(f"x.{id_col}").alias("pid"),
            )
            .distinct()
            .withColumn("_arm", F.lit("b"))
        )
        probe = probe.unionByName(wb_arm)
    # ONE checkpoint materializes BOTH candidate arms (round-14
    # optimization, VERDICT r13 next #1: the pairs and wb barriers
    # merge — 4 blocking jobs -> 3 in within_batch mode); downstream
    # consumers (need_ids x2-4, each _verified join) read the tiny
    # materialized rows instead of re-deriving the band joins
    probe = _ckpt(probe, materialize)
    cand = probe.filter(F.col("_arm") == "h").select(
        "bid", F.col("pid").alias("hid")
    )
    wb = (
        probe.filter(F.col("_arm") == "b").select(
            "bid", F.col("pid").alias("partner")
        )
        if within_batch
        else None
    )

    # ---- candidate verification: exact Jaccard on candidate ids only ----
    need_ids = cand.select(F.col("bid").alias(id_col)).union(
        cand.select(F.col("hid").alias(id_col))
    )
    if wb is not None:
        need_ids = need_ids.union(wb.select(F.col("bid").alias(id_col))).union(
            wb.select(F.col("partner").alias(id_col))
        )
    need_ids = need_ids.distinct()
    corpus = history_text.select(id_col, text_col).unionByName(
        batch.select(id_col, text_col)
    )
    sets = _ckpt(
        ensure_parallelism(corpus)
        .join(need_ids, id_col, "left_semi")
        .select(
            F.col(id_col),
            F.array_distinct(hashed_shingles(text_col, n, hash_fn)).alias("sh"),
        ),
        materialize,
    )
    inter = F.size(F.array_intersect(F.col("s1.sh"), F.col("s2.sh")))
    union = F.size(F.col("s1.sh")) + F.size(F.col("s2.sh")) - inter
    jac = inter.cast("double") / union

    def _verified(pairs: DataFrame, partner_col: str, out_of: str, out_j: str) -> DataFrame:
        scored = (
            pairs.join(sets.alias("s1"), F.col("bid") == F.col(f"s1.{id_col}"))
            .join(sets.alias("s2"), F.col(partner_col) == F.col(f"s2.{id_col}"))
            .select("bid", partner_col, jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )
        # smallest-id partner, deterministically carrying ITS jaccard
        return scored.groupBy("bid").agg(
            F.min(F.struct(F.col(partner_col), F.col("jaccard"))).alias("m")
        ).select(
            F.col("bid").alias(id_col),
            F.col(f"m.{partner_col}").alias(out_of),
            F.col("m.jaccard").alias(out_j),
        )

    near = _verified(cand, "hid", "near_dup_of", "near_jaccard")

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
    )
    partners = ["hist_dup_of", "batch_dup_of", "near_dup_of"]
    if wb is not None:
        near_b = _verified(wb, "partner", "wb_dup_of", "wb_jaccard")
        out = out.join(near_b, id_col, "left")
        verdict = verdict.when(
            F.col("wb_dup_of").isNotNull(), F.lit("near_dup_batch")
        )
        partners.append("wb_dup_of")
    verdict = verdict.otherwise(F.lit("new"))
    no_exact = F.col("hist_dup_of").isNull() & F.col("batch_dup_of").isNull()
    jaccard_out = F.when(
        F.col("near_dup_of").isNotNull() & no_exact, F.col("near_jaccard")
    )
    if wb is not None:
        jaccard_out = F.when(
            F.col("near_dup_of").isNotNull() & no_exact, F.col("near_jaccard")
        ).when(
            F.col("wb_dup_of").isNotNull() & no_exact & F.col("near_dup_of").isNull(),
            F.col("wb_jaccard"),
        )
    return out.select(
        id_col,
        verdict.alias("verdict"),
        F.coalesce(*partners).alias("dup_of"),
        jaccard_out.alias("jaccard"),
    )


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
    within_batch: bool = False,
) -> DataFrame:
    """One-shot batch-vs-history dedup: derives the fingerprint and
    band indexes from ``history`` and probes them. Deployments that
    ingest continuously persist those indexes instead and call
    :func:`dedup_against_index` directly (streaming/corpus.py)."""
    return dedup_against_index(
        batch,
        fingerprint_index(history, id_col, text_col),
        band_index(history, id_col, text_col, num_perm, bands, n, seed, hash_fn),
        history.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        n=n,
        threshold=threshold,
        seed=seed,
        hash_fn=hash_fn,
        max_bucket=max_bucket,
        within_batch=within_batch,
    )
