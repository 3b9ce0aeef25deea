"""Cross-document duplicate-span detection (north-star extension).

The exact-substring dedup signal of Lee et al. 2021 ("Deduplicating
Training Data Makes Language Models Better"): long token spans that
appear in MORE THAN ONE document are memorization risks and dedup
targets, even when the documents as wholes are not near-duplicates.
The suffix-array construction of the paper is replaced by the
relational shape Spark executes well:

    doc --distinct n-gram hashes--> (doc, h)
                                      |  groupBy h -> #docs containing h
                                      |  join back on h (co-partitioned)
                                      v
                    per doc: fraction of spans shared with ANY other doc

Scale: one partially-aggregated shuffle on the 8-byte hash, a
co-partitioned join back (same key, no second shuffle of the big
side), and a per-doc reduce. No pairwise comparison anywhere — cost
is linear in corpus spans, the property that made the paper's method
practical at C4 scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import hashed_shingles, tokens, xxhash31
from irclogbot_spark.plans.partitioning import ensure_parallelism


def cross_doc_duplication(
    df: DataFrame,
    n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """Per-doc span-sharing stats: (id, n_spans, n_shared_spans,
    cross_dup_frac) where n_spans counts the doc's DISTINCT n-token
    spans, n_shared_spans those occurring in at least one other doc,
    and cross_dup_frac their ratio (0.0 for span-less docs — kept).

    ``hash_fn`` defaults to xxhash31 (scale path); pass
    ``dedup.md5_hash31`` for the DuckDB-checkable pipeline.
    """
    spans = ensure_parallelism(df).select(
        F.col(id_col), F.explode(hashed_shingles(F.col(text_col), n, hash_fn)).alias("h")
    )
    # hashed_shingles de-duplicates within a doc, so COUNT(*) per hash
    # is the number of documents containing the span.
    docs_per_span = spans.groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
    per = (
        spans.join(docs_per_span, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_spans"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_shared_spans", F.lit(0)).cast("long").alias("n_shared_spans"),
            F.when(
                F.coalesce(F.col("n_spans"), F.lit(0)) > 0,
                F.col("n_shared_spans").cast("double") / F.col("n_spans").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("cross_dup_frac"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """The REMOVAL step of Lee et al. 2021: every n-token span that
    also occurs in a lower-id document is cut from this document's
    text (the lowest-id occurrence is the keeper — all its copies
    survive, including within-doc repeats). Returns (id, text_clean,
    n_tokens, n_removed) for every input row.

    Relational shape (no suffix array, no pairwise compare):
    POSITIONAL span hashes (doc, pos, h) — unlike
    cross_doc_duplication's distinct-span stats, positions matter
    here — one partially-aggregated shuffle on the 8-byte hash for
    the per-span owner (min doc id), a co-partitioned join back, and
    a per-doc collect of the (typically few) covered start
    positions; the rebuild is an IN-ROW filter over the token array.
    Covered starts are first MERGED into disjoint [s, e) intervals
    (an in-row fold over the sorted starts — overlapping/adjacent
    n-token spans collapse), so the per-token probe is
    O(merged_intervals), not O(covered_starts): on a heavily
    duplicated document whose spans chain into one long run the
    probe list is 1 interval instead of hundreds of starts, and the
    result is identical (the merged set covers exactly the union).
    Document text shuffles only as the final per-doc
    (id, covered-positions) join — the token arrays themselves never
    leave their scan partitions.

    ``hash_fn`` defaults to xxhash31; pass ``dedup.md5_hash31`` for
    the DuckDB-checkable pipeline.
    """
    hash_fn = hash_fn or xxhash31
    base = ensure_parallelism(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    k = F.size("_toks") - F.lit(n - 1)
    span_hashes = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: hash_fn(F.concat_ws(" ", F.slice(F.col("_toks"), i, n))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    sp = base.select(F.col(id_col), F.posexplode(span_hashes).alias("pos", "h"))
    owners = sp.groupBy("h").agg(F.min(id_col).alias("_owner"))
    covered = (
        sp.join(owners, "h")
        .filter(F.col(id_col) != F.col("_owner"))
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_cov"))
    )
    joined = base.join(covered, id_col, "left").select(
        F.col(id_col),
        F.col("_toks"),
        F.coalesce(F.col("_cov"), F.array().cast("array<int>")).alias("_cov"),
    )
    # merge sorted covered starts into disjoint [s, e) intervals:
    # spans are fixed length n, so after sorting, p overlaps/abuts
    # the open interval ending at e iff p <= e, and the merged end is
    # simply p + n (>= e whenever p >= the interval's start)
    empty_iv = F.array().cast("array<struct<s:int,e:int>>")
    merged = F.aggregate(
        F.array_sort("_cov"),
        empty_iv,
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        (p + F.lit(n)).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(p.alias("s"), (p + F.lit(n)).alias("e"))))
        ),
    )
    joined = joined.select(F.col(id_col), F.col("_toks"), merged.alias("_iv"))
    kept_expr = F.filter(
        F.transform(F.col("_toks"), lambda x, i: F.struct(x.alias("x"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("_iv"), lambda v: (s["i"] >= v["s"]) & (s["i"] < v["e"])
        ),
    )
    # materialize the filtered array once: text_clean and n_removed
    # both consume it, and re-evaluating the exists() scan per
    # reference would double the in-row work
    mat = joined.select(F.col(id_col), F.col("_toks"), kept_expr.alias("_kept"))
    return mat.select(
        F.col(id_col),
        F.array_join(F.transform(F.col("_kept"), lambda s: s["x"]), " ").alias(
            "text_clean"
        ),
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size("_kept")).cast("long").alias("n_removed"),
    )
