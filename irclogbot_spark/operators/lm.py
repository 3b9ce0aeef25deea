"""N-gram language-model familiarity scoring (north-star extension).

The perplexity-filter step of CCNet/RedPajama-style pipelines scores
each document under a language model trained on a trusted corpus and
drops the tails. The Spark-native, oracle-exact proxy here keeps the
two-pass structure but stays in exact integer space (log-probs differ
across libms by ulps and could never value-hash):

  pass 1 (train): corpus bigram counts -> top-K vocabulary table
  pass 2 (score): per doc, how much of its bigram stream the
                  vocabulary covers, and the total corpus frequency
                  mass its bigrams carry.

Low ``familiar_frac`` == the doc is built from bigrams the corpus has
rarely/never seen — the same tail a perplexity filter cuts.

Scale shape: pass 1 is one partially-aggregated shuffle on gram plus
a TakeOrderedAndProject (only K rows ever leave the aggregate); pass
2 is map-only — the K-row vocabulary broadcasts, so the corpus is
never shuffled to be scored. Two corpus scans total, inherent to
train-then-score. At 100 TB the vocabulary table is the only global
state, and it is O(K), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.operators.repetition import ngrams
from irclogbot_spark.plans.partitioning import ensure_parallelism


def bigram_vocab(
    df: DataFrame, vocab_k: int, text_col: str = "text"
) -> DataFrame:
    """Top-K corpus bigrams by count, (cnt DESC, gram ASC) total
    order so the K-boundary is deterministic: (gram, cnt)."""
    g = ensure_parallelism(df).select(
        F.explode(ngrams(F.col(text_col), 2)).alias("gram")
    )
    counts = g.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.desc("cnt"), F.asc("gram")).limit(vocab_k)


def lm_familiarity(
    df: DataFrame,
    vocab: DataFrame | None = None,
    vocab_k: int = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc familiarity under the (given or self-trained) bigram
    vocabulary: (id, n_bigrams, n_familiar, familiar_frac,
    avg_gram_freq). Docs with < 2 tokens score (0, 0, 0.0, 0.0).

    Pass a ``vocab`` trained on a TRUSTED corpus to score a candidate
    corpus against it (the CCNet setup); default trains on ``df``
    itself (self-familiarity — flags within-corpus outliers).
    """
    if vocab is None:
        vocab = bigram_vocab(df, vocab_k, text_col)
    dg = ensure_parallelism(df).select(
        F.col(id_col), F.explode_outer(ngrams(F.col(text_col), 2)).alias("gram")
    )
    j = dg.join(F.broadcast(vocab), "gram", "left")
    per = j.groupBy(id_col).agg(
        F.count("gram").alias("n_bigrams"),
        F.sum(F.when(F.col("cnt").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_familiar"),
        F.sum(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("freq_mass"),
    )
    nb = F.col("n_bigrams")
    return per.select(
        id_col,
        "n_bigrams",
        "n_familiar",
        F.when(nb > 0, F.col("n_familiar").cast("double") / nb.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("familiar_frac"),
        F.when(nb > 0, F.col("freq_mass").cast("double") / nb.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("avg_gram_freq"),
    )
