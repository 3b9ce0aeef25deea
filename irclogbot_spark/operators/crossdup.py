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

from irclogbot_spark.operators.dedup import hashed_shingles
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
