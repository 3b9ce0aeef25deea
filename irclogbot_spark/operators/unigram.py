"""Unigram-LM subword segmentation (SentencePiece's apply step,
Kudo 2018) — Viterbi minimum-cost segmentation of every word against
a fixed subword inventory with integer costs, expressed in PURE
Catalyst: the per-word dynamic program is an ``F.aggregate`` fold
over character positions (no UDF, no Python in the hot path), so
whole-stage codegen keeps it JVM-side and the plan is map-only on
the distinct-word frame.

Pipeline shape (the tokenizer-application pattern of an LLM data
pipeline at 100 TB):

1. **Inventory training** (``char_gram_counts`` + ``train_unigram_costs``):
   character n-grams (len 1..4) of the corpus's normalized words,
   weighted by word frequency — ONE gram shuffle whose output is
   bounded by gram diversity, then a top-K bounded collect (the
   learned-table rule: a ~200-row model artifact, never corpus
   data). Costs are integer milli-nats ``round(1000*ln(total/cnt))``
   quantized ONCE driver-side, so engine and oracle share the exact
   same table (the DSIR plan-constant convention,
   operators/importance.py).
2. **Viterbi DP** (``viterbi_costs``): per distinct word,
   ``best[p] = min over start s in [p-3, p]: best[s-1] +
   cost(word[s..p])`` with an unknown-character fallback at length
   1. The (cost, piece-count) pair rides ONE BIGINT
   ``cost_milli*10000 + pieces`` — addition-linear, so the fold is a
   plain integer min and the lexicographic (cost, pieces) order is
   preserved. Exact, float-free, partitioning-invariant.
3. **Reassembly** (``unigram_segment_stats``): words dedupe before
   the DP (Zipf: the DP runs once per TYPE, not per token), then one
   word-keyed join and one doc-keyed partial agg.

The DuckDB oracle replays the SAME DP as a recursive CTE carrying
the best-cost list forward (list_append per iteration) with the cost
table inlined as a CASE — the fold machinery itself is value-hashed.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.functions.text import normalize_text
from irclogbot_spark.operators.dedup import tokens
from irclogbot_spark.plans.partitioning import ensure_parallelism

#: longest subword piece considered by the DP (and gram trainer)
MAX_PIECE = 4
#: words truncate to this many chars before segmentation — bounds the
#: DP depth (and the oracle's recursion) on pathological "words"
WORD_CAP = 24
#: pieces-per-word rides the low digits of the combined cost; WORD_CAP
#: keeps it < 10000 with room to spare
_PIECES_BASE = 10_000


def _words(df: DataFrame, text_col: str) -> Column:
    """Normalized whitespace words, truncated to WORD_CAP chars."""
    return F.transform(
        tokens(normalize_text(F.col(text_col))),
        lambda w: F.substring(w, 1, WORD_CAP),
    )


def char_gram_counts(
    df: DataFrame, text_col: str = "text", max_len: int = MAX_PIECE
) -> DataFrame:
    """(gram, cnt): every substring of length 1..max_len at every
    position of every word TYPE, weighted by the word's corpus
    frequency. Two partial-agg shuffles (word freq, then gram sum);
    output bounded by gram diversity, not corpus size."""
    wf = (
        df.select(F.explode(_words(df, text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
    )
    grams = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_len), F.length("word") - i + 1),
                ),
                lambda l: F.substring(F.col("word"), i, l),
            ),
        )
    )
    return (
        wf.select("wf", F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.sum("wf").cast("long").alias("cnt"))
    )


def top_grams(df: DataFrame, text_col: str = "text", k: int = 200) -> list[tuple[str, int]]:
    """The bounded learned table: top-k grams by (cnt DESC, gram ASC)
    — a deterministic K-boundary, collected driver-side (k rows)."""
    rows = (
        char_gram_counts(df, text_col)
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
        .collect()
    )
    return [(r.gram, r.cnt) for r in rows]


def train_unigram_costs(pairs: list[tuple[str, int]]) -> tuple[dict[str, int], int]:
    """Integer milli-nat costs from (gram, cnt) pairs — the ONE place
    floats exist, shared verbatim by engine and oracle so both carry
    identical plan constants: cost = floor(1000*ln(total/cnt) + 0.5)
    (explicit half-up, not banker's round); unk = max cost + 1000."""
    if not pairs:
        raise ValueError("empty gram table")
    total = sum(c for _, c in pairs)
    costs = {
        g: int(math.floor(1000.0 * math.log(total / c) + 0.5)) for g, c in pairs
    }
    return costs, max(costs.values()) + 1000


def viterbi_costs(
    words: DataFrame, costs: dict[str, int], unk_cost: int, word_col: str = "word"
) -> DataFrame:
    """word -> (word, word_cost_milli, word_pieces): the minimum-cost
    segmentation against the inventory, as a single F.aggregate fold
    (map-only; whole-stage codegen). Combined encoding
    cost*10000+pieces makes (cost, pieces)-lexicographic min a plain
    long min, and addition composes both components at once."""
    vocab = F.create_map(
        *[
            F.lit(x)
            for g, c in sorted(costs.items())
            for x in (g, int(c) * _PIECES_BASE + 1)
        ]
    )
    unk_combined = int(unk_cost) * _PIECES_BASE + 1
    word = F.col(word_col)

    def piece_cost(j: Column, i: Column) -> Column:
        sub = F.substring(word, j, i - j + 1)
        hit = F.try_element_at(vocab, sub).cast("long")
        return F.coalesce(
            hit,
            F.when(i == j, F.lit(unk_combined).cast("long")),
        )

    def step(acc: Column, i: Column) -> Column:
        cands = F.transform(
            F.sequence(F.greatest(F.lit(1), i - F.lit(MAX_PIECE - 1)), i),
            lambda j: F.element_at(acc, j) + piece_cost(j, i),
        )
        best = F.array_min(F.filter(cands, lambda v: v.isNotNull()))
        return F.concat(acc, F.array(best))

    folded = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(F.lit(0).cast("long")),
        step,
    )
    comb = F.element_at(folded, F.length(word) + 1)
    return (
        words.withColumn("_comb", comb)
        .select(
            word_col,
            F.expr(f"_comb DIV {_PIECES_BASE}").cast("long").alias(
                "word_cost_milli"
            ),
            F.pmod(F.col("_comb"), F.lit(_PIECES_BASE))
            .cast("long")
            .alias("word_pieces"),
        )
    )


def unigram_segment_stats(
    df: DataFrame,
    costs: dict[str, int],
    unk_cost: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document segmentation totals (n_words, cost_milli,
    n_pieces): the DP runs once per word TYPE (distinct words — the
    Zipf trick that makes tokenizer application cheap at 100 TB),
    then one word-keyed join and one doc-keyed partial agg carry the
    totals back. Docs with no words after normalization drop (no
    segmentation exists for them)."""
    occ = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(_words(df, text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )
    seg = viterbi_costs(occ.select("word").distinct(), costs, unk_cost)
    return (
        occ.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("long").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("word_cost_milli"))
            .cast("long")
            .alias("cost_milli"),
            F.sum(F.col("n_occ") * F.col("word_pieces"))
            .cast("long")
            .alias("n_pieces"),
        )
    )
