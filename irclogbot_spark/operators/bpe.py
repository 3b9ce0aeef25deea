"""BPE tokenizer training — the iterative merge loop, Spark-shaped.

Byte-pair encoding (Sennrich et al. 2016, the tokenizer-training
workhorse behind GPT-2/RoBERTa-family vocabularies): start from
characters, repeatedly find the most frequent adjacent symbol pair
and merge it into one symbol. The classic implementation is a
single-machine dict loop; the Spark shape exploits the observation
real trainers rely on: BPE never needs the corpus after the first
pass — it trains on the WORD-FREQUENCY TABLE, whose size is bounded
by vocabulary growth (Heaps' law: ~millions of distinct words at ANY
corpus size), not by corpus bytes.

Scale design (the 100 TB path):
- ONE corpus-sized job: the word count (explode \\S+ tokens, one
  partial-aggregating shuffle of (word, 1)). Everything after runs on
  the vocab-bounded word table, cached in executor memory.
- Each merge iteration is one tiny job over that table: in-row pair
  extraction (split + transform), a partial-agg pair count, and a
  1-ROW TakeOrdered argmax — the only driver traffic per iteration
  (the k-means-trainer convention). The merge itself is an in-row
  literal string replace.
- Lineage is truncated per iteration (localCheckpoint) so iteration
  N's plan does not replay merges 1..N-1 — the neardup-clusters
  lesson applied to the other iterative operator family.

Determinism contract (oracle-matched): words are \\S+ tokens;
symbols are the word's characters plus a trailing ``</w>``
end-of-word marker (words containing U+001F are dropped — impossible
for \\S+ tokens to contain spaces but control bytes are filtered
explicitly); pair counts include overlapping occurrences (Sennrich's
counting); the winning pair is (count DESC, "l\\x1fr" ASC) — the
concat-with-low-separator order equals tuple order because 0x1F
sorts below every printable byte. Training stops early if the best
pair's count falls below ``min_freq``.

Symbol-boundary safety (the WRAPPED representation): the symbol
sequence is stored as ``\\x1f sym1 \\x1f\\x1f sym2 \\x1f\\x1f ... \\x1f``
— ONE separator at each end, TWO between adjacent symbols. A merge
of (lhs, rhs) is then the literal replace of
``\\x1f lhs \\x1f\\x1f rhs \\x1f`` with ``\\x1f lhs+rhs \\x1f``. Because
symbols never contain U+001F, the pattern can only match at symbol
boundaries (a naive single-separator join would let ``b\\x1fc``
match inside the symbols ``ab | c`` or ``b | cd``), the replacement
restores the wrapped invariant, and consecutive disjoint pairs still
both match (each match consumes only one half of the double
separator on each side). Plain ``replace()`` is left-to-right
non-overlapping and byte-identical between Java (Spark) and DuckDB,
so the oracle needs no regex lookaround (RE2 has none). Matches the
pure-Python Sennrich reference in tests/test_bpe.py exactly,
including ADVICE r5's cross-boundary repro {bc:20, ab:15, abc:5}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import tokens
from irclogbot_spark.plans.partitioning import ensure_parallelism

SEP = "\x1f"
SEP2 = SEP + SEP
EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over \\S+ tokens — the one corpus-sized pass."""
    return (
        ensure_parallelism(df)
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word) -> F.Column:
    """Wrapped form: \\x1f c1 \\x1f\\x1f c2 ... \\x1f\\x1f </w> \\x1f."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(
        F.lit(SEP), F.array_join(chars, SEP2), F.lit(SEP2 + EOW + SEP)
    )


def _symbol_list(syms) -> F.Column:
    """Wrapped string -> array of symbols (strip edge seps, split on
    the double internal separator)."""
    return F.split(F.btrim(syms, F.lit(SEP)), SEP2)


def _pairs(syms) -> F.Column:
    """Adjacent (lhs \\x1f rhs) pair keys; single-separator key keeps
    the (cnt DESC, pair ASC) tie-break identical to tuple order. A
    fully-merged word (one symbol) yields the empty array — the
    guard matters because F.sequence(1, 0) would DESCEND."""
    s = _symbol_list(syms)
    return F.when(
        F.size(s) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda j: F.concat_ws(
                SEP, F.element_at(s, j), F.element_at(s, j + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_bpe(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_freq: int = 2,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges; returns the merge table as a
    list of dicts ``(step, lhs, rhs, merged, pair_freq)`` in learn
    order. Stops early when the best pair's frequency drops below
    ``min_freq`` (nothing left worth merging)."""
    vocab = (
        word_counts(df, text_col)
        .select(_initial_symbols(F.col("word")).alias("syms"), "freq")
        .localCheckpoint()
    )
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        best = (
            vocab.select(F.col("freq"), F.explode(_pairs(F.col("syms"))).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .first()
        )
        if best is None or best["cnt"] < min_freq:
            break
        lhs, rhs = best["pair"].split(SEP)
        merged = lhs + rhs
        merges.append(
            {
                "step": step,
                "lhs": lhs,
                "rhs": rhs,
                "merged": merged,
                "pair_freq": int(best["cnt"]),
            }
        )
        # NO per-step checkpoint (round-13 optimization): each step's
        # vocab is ONE narrow string replace over the previous, so
        # after k steps the lineage is k map-only expressions over the
        # initial checkpointed word table — re-running them inside the
        # next argmax job is far cheaper than a blocking
        # materialization job per merge (the checkpoint halved nothing
        # but doubled the job count: 2 jobs/merge -> 1).
        vocab = vocab.select(
            F.replace(
                F.col("syms"),
                F.lit(SEP + lhs + SEP2 + rhs + SEP),
                F.lit(SEP + merged + SEP),
            ).alias("syms"),
            "freq",
        )
        # ...but cap the recompute depth for large-n_merges callers
        # (ADVICE r13): a LAZY checkpoint every 16 merges rides the
        # NEXT argmax job (no extra blocking job — still 1 job/merge),
        # so step k re-runs at most 16 prior replaces instead of k-1,
        # bounding total work at O(n_merges) replace passes and plan
        # depth at 16. The suite's n_merges=8 never reaches it.
        if step % 16 == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Segment every \\S+ token of ``text_col`` with a learned merge
    table: replay the merges in learn order (the classic greedy
    apply), emitting the final symbol sequence per document. Pure
    projection — merges are plan constants, the corpus never
    shuffles."""
    toks = tokens(F.col(text_col))

    def encode(word):
        syms = _initial_symbols(word)
        for m in merges:
            syms = F.replace(
                syms,
                F.lit(SEP + m["lhs"] + SEP2 + m["rhs"] + SEP),
                F.lit(SEP + m["merged"] + SEP),
            )
        return _symbol_list(syms)

    return df.withColumn(
        out_col, F.flatten(F.transform(toks, encode))
    )
