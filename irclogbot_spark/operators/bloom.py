"""Bloom-filter eval decontamination — the zero-shuffle scale path.

The exact contamination pass (``decontam.ngram_contamination``) joins
the corpus's hashed n-grams against the eval set's — correct, but the
corpus side still explodes into a join. The production design every
100 TB pipeline converges on (Dolma's bloom-filter dedup/decontam
tagger, CCNet's paragraph filters) is: compress the SMALL side (the
eval set) into an m-bit Bloom filter, ship it to every task, and scan
the corpus MAP-ONLY — each document answers "does any of my n-grams
maybe-hit the eval set?" in-row, with a false-positive rate set by
(m, k) and ZERO false negatives.

Spark realization:
- The filter is built with one narrow aggregation over the eval side:
  shingle -> k bit positions (double hashing, Kirsch-Mitzenmacher:
  pos_j = (h1 + j*h2) mod m) -> ``bit_or`` per 32-bit word. m/32
  words, a design constant (8 KiB at the default m = 2^18) —
  metadata-sized by construction, like the IVF/PQ codebooks.
- The words ship as ONE parsed SQL literal (functions/lits.py — a
  per-element F.lit table would cost a py4j round trip per word), so
  the probe is a pure projection: ``F.filter`` over the in-row
  shingle array testing all k bits against the plan-constant word
  array. No join, no exchange, no text movement — the corpus scan IS
  the decontamination (plan-asserted in tests/test_plans.py).
- Guarantee: maybe-hits are a SUPERSET of the exact pass's hits
  (differential-tested); flagged docs go to the exact pass or are
  dropped outright, per pipeline policy.

Word width is 32 bits inside a BIGINT: every ``1 << bit`` stays
positive, so the same arithmetic is exact in Spark (no ANSI overflow)
and DuckDB (no BIGINT overflow check trips, no sign divergence).

Hash pair: the portable pair derives h1/h2 from disjoint 15-hex-digit
windows of one md5 (both < 2^60, re-derivable in ANSI SQL); the scale
pair is two xxhash64 lanes. Positions reduce h1, h2 mod m BEFORE the
multiply-add so no intermediate exceeds ~k*m (exact under ANSI mode
and DuckDB's checked BIGINT arithmetic alike).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.functions.lits import lit_long_array
from irclogbot_spark.operators.dedup import shingles
from irclogbot_spark.plans.partitioning import ensure_parallelism

WORD_BITS = 32


def portable_hash_pair(c: Column) -> tuple[Column, Column]:
    """(h1, h2) from disjoint hex windows of one md5 — ANSI twin:
    ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`` /
    ``substr(md5(s), 17, 15)``."""
    md = F.md5(c)
    h1 = F.conv(F.substring(md, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(md, 17, 15), 16, 10).cast("long")
    return h1, h2


def xxhash_pair(c: Column) -> tuple[Column, Column]:
    """Scale-path pair: two xxhash64 lanes (the seed lane folds in a
    constant second column). May be negative — positions pmod-fold."""
    return F.xxhash64(c), F.xxhash64(c, F.lit(1))


def _positions(s: Column, m_bits: int, k: int, hash_pair_fn) -> Column:
    h1, h2 = hash_pair_fn(s)
    m = F.lit(m_bits).cast("long")
    a = F.pmod(h1, m)
    b = F.pmod(h2, m)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.pmod(a + j.cast("long") * b, m),
    )


def bloom_words_df(
    eval_df: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 18,
    k: int = 3,
    text_col: str = "text",
    hash_pair_fn=None,
) -> DataFrame:
    """The filter as a DataFrame: ``(word_idx, word)``, at most
    m_bits/32 rows. One partial-aggregating ``bit_or`` shuffle of
    (int, long) pairs — the eval text never leaves its partition."""
    if m_bits % WORD_BITS:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    hash_pair_fn = hash_pair_fn or xxhash_pair
    pos = (
        ensure_parallelism(eval_df)
        .select(F.explode(shingles(F.col(text_col), n)).alias("s"))
        .select(
            F.explode(_positions(F.col("s"), m_bits, k, hash_pair_fn)).alias(
                "pos"
            )
        )
    )
    return (
        pos.select(
            (F.col("pos") / WORD_BITS).cast("int").alias("word_idx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))").alias(
                "wb"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("wb").alias("word"))
    )


def build_bloom(
    eval_df: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 18,
    k: int = 3,
    text_col: str = "text",
    hash_pair_fn=None,
) -> list[int]:
    """Materialize the filter driver-side as a dense word list —
    m_bits/32 longs (8 KiB at the default), the bounded
    plan-constant the probe inlines. The ONLY collect in the
    operator, and it is of the filter itself (metadata-sized by
    design), never of corpus data."""
    dense = [0] * (m_bits // WORD_BITS)
    for r in bloom_words_df(
        eval_df, n, m_bits, k, text_col, hash_pair_fn
    ).collect():
        dense[r["word_idx"]] = r["word"]
    return dense


# 1L << b for b in 0..31 as a plan constant: F.shiftleft only takes a
# Python int for the shift amount, so the per-position bit value is an
# element_at into this 32-long lookup instead (identical arithmetic in
# the oracle: 1::BIGINT << CAST(pos % 32 AS INT)).
_POW2 = [1 << b for b in range(WORD_BITS)]


def bloom_maybe(
    s: Column, words: list[int], m_bits: int, k: int, hash_pair_fn=None
) -> Column:
    """In-row membership test: all k bits set in the plan-constant
    word array. Pure projection — usable inside F.filter/F.exists."""
    hash_pair_fn = hash_pair_fn or xxhash_pair
    w = lit_long_array(words)
    p2 = lit_long_array(_POW2)
    return F.forall(
        _positions(s, m_bits, k, hash_pair_fn),
        lambda p: F.element_at(w, (p / WORD_BITS).cast("int") + 1)
        .bitwiseAND(
            F.element_at(p2, F.pmod(p, F.lit(WORD_BITS)).cast("int") + 1)
        )
        != 0,
    )


def bloom_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 18,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_pair_fn=None,
) -> DataFrame:
    """Per corpus-document contamination stats vs a Bloom of the eval
    set: ``(id_col, n_ngrams, n_maybe, flagged)`` where n_maybe counts
    the doc's distinct n-grams that maybe-hit the eval filter and
    flagged = n_maybe > 0. Superset guarantee: every doc the exact
    pass flags is flagged here (no false negatives); FP rate is the
    standard (1 - e^{-kN/m})^k.

    MAP-ONLY over the corpus: shingle, position, and bit test are all
    in-row against the inlined filter — zero corpus shuffles.
    """
    hash_pair_fn = hash_pair_fn or xxhash_pair
    words = build_bloom(eval_df, n, m_bits, k, text_col, hash_pair_fn)
    sh = shingles(F.col(text_col), n)
    hit = F.size(
        F.filter(sh, lambda s: bloom_maybe(s, words, m_bits, k, hash_pair_fn))
    )
    return (
        ensure_parallelism(corpus)
        .select(
            F.col(id_col),
            F.size(sh).cast("long").alias("n_ngrams"),
            hit.cast("long").alias("n_maybe"),
        )
        .withColumn("flagged", F.col("n_maybe") > 0)
    )
