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


def surprisal_tables(
    df: DataFrame,
    text_col: str = "text",
    bigram_k: int = 500,
    unigram_k: int = 200,
) -> tuple[list[tuple[str, int]], list[tuple[str, int]], int, int]:
    """The bounded learned tables of the backoff scorer: top-K
    bigrams, top-K unigrams (both (cnt DESC, gram ASC) deterministic
    K-boundaries) and the EXACT corpus gram totals. Two partial-agg
    shuffles; collects are K rows + two scalars (the learned-table
    rule)."""
    # ONE corpus scan + ONE gram shuffle for both orders: unigrams
    # and bigrams explode together and the order is recoverable from
    # the gram itself (bigrams contain the join space). The two
    # TakeOrdered top-Ks and the two totals union into a SINGLE
    # collect job (round-13 optimization — was an eager checkpoint
    # plus three collect jobs): all three subtrees read the counts
    # aggregate's one exchange, which ReuseExchange dedupes within
    # the job, so the checkpoint barrier bought nothing. Each subtree
    # keeps its scale shape (TakeOrderedAndProject / partial-agg sum
    # — only K rows + 2 scalars ever reach the driver).
    g = ensure_parallelism(df).select(
        F.explode(
            F.concat(ngrams(F.col(text_col), 1), ngrams(F.col(text_col), 2))
        ).alias("gram")
    )
    counts = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn("is_bigram", F.col("gram").contains(" "))
    )
    top_b = (
        counts.filter("is_bigram")
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(bigram_k)
        .select(F.lit("b").alias("kind"), "gram", "cnt")
    )
    top_u = (
        counts.filter(~F.col("is_bigram"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(unigram_k)
        .select(F.lit("u").alias("kind"), "gram", "cnt")
    )
    tot = counts.groupBy("is_bigram").agg(F.sum("cnt").alias("cnt")).select(
        F.when(F.col("is_bigram"), F.lit("tb")).otherwise(F.lit("tu")).alias("kind"),
        F.lit(None).cast("string").alias("gram"),
        "cnt",
    )
    rows = top_b.unionByName(top_u).unionByName(tot).collect()
    big = [(r.gram, r.cnt) for r in rows if r.kind == "b"]
    uni = [(r.gram, r.cnt) for r in rows if r.kind == "u"]
    totals = {r.kind: r.cnt for r in rows if r.kind in ("tb", "tu")}
    return big, uni, int(totals.get("tb", 0)), int(totals.get("tu", 0))


#: stupid backoff alpha = 0.4 -> -ln(0.4) in milli-nats
BACKOFF_PENALTY_MILLI = 916


def train_backoff_costs(
    big: list[tuple[str, int]],
    uni: list[tuple[str, int]],
    n2: int,
    n1: int,
) -> tuple[dict[str, int], dict[str, int], int]:
    """Integer milli-nat surprisals -ln(cnt/total), quantized ONCE
    driver-side (half-up floor — the unigram/DSIR plan-constant
    convention) so engine and oracle share identical tables; the
    unknown-unigram floor is max unigram cost + 1000."""
    import math

    if not big or not uni:
        raise ValueError("empty gram tables")
    q = lambda x: int(math.floor(1000.0 * x + 0.5))  # noqa: E731
    bc = {g: q(math.log(n2 / c)) for g, c in big}
    uc = {g: q(math.log(n1 / c)) for g, c in uni}
    return bc, uc, max(uc.values()) + 1000


def backoff_surprisal(
    df: DataFrame,
    big_costs: dict[str, int],
    uni_costs: dict[str, int],
    unk_cost: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc stupid-backoff surprisal (Brants et al. 2007 — the
    CCNet/KenLM-style LM quality signal): each bigram costs its
    corpus surprisal if in-table, else backoff penalty (-ln 0.4)
    plus the second word's unigram surprisal (unknown floor for OOV)
    — integer milli-nats end to end, so the score value-hashes.
    Map-only scoring: both cost tables ride the plan as map literals
    (try_element_at — no join, no shuffle beyond the doc partial
    agg); docs with < 2 tokens keep a row at (0, 0, 0)."""
    bmap = F.create_map(
        *[F.lit(x) for g, c in sorted(big_costs.items()) for x in (g, int(c))]
    )
    umap = F.create_map(
        *[F.lit(x) for g, c in sorted(uni_costs.items()) for x in (g, int(c))]
    )
    g = ensure_parallelism(df).select(
        F.col(id_col), F.explode_outer(ngrams(F.col(text_col), 2)).alias("gram")
    )
    w2 = F.element_at(F.split(F.col("gram"), " "), 2)
    cost = F.coalesce(
        F.try_element_at(bmap, F.col("gram")).cast("long"),
        F.lit(BACKOFF_PENALTY_MILLI)
        + F.coalesce(
            F.try_element_at(umap, w2).cast("long"),
            F.lit(int(unk_cost)).cast("long"),
        ),
    )
    per = g.groupBy(id_col).agg(
        F.count("gram").cast("long").alias("n_grams"),
        F.coalesce(
            F.sum(F.when(F.col("gram").isNotNull(), cost)), F.lit(0)
        )
        .cast("long")
        .alias("cost_milli"),
    )
    return per.select(
        id_col,
        "n_grams",
        "cost_milli",
        F.when(F.col("n_grams") > 0, F.expr("cost_milli DIV n_grams"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("avg_cost_milli"),
    )
