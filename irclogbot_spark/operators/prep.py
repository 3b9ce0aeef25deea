"""End-to-end training-corpus preparation — the composition the whole
operator library exists for, as ONE lazy DataFrame plan:

    quality gate  ->  exact dedup  ->  split  ->  decontaminate
                  ->  sequence packing

Per surviving doc the result carries its split label and its packed
training-sequence assignment. Every stage is one of the library's
scale-shaped operators; composing them adds NO new shuffles beyond
what each stage already pays, and Catalyst sees the whole pipeline as
a single plan (filters push through, column pruning crosses stage
boundaries).

Stage semantics (and the 100 TB cost of each):
1. quality gate — min token count + Gopher top-2-gram repetition cap
   (repetition_signals: one (doc,n,gram) partial-agg shuffle).
2. exact dedup — keep-first on md5(text) (one hash shuffle).
3. split — content-hash train/val/test labels (map-only).
4. decontaminate — drop TRAIN docs sharing an n-token shingle with
   any TEST doc (the GPT-3 appendix-C direction: eval stays intact,
   contaminated training text goes); hash-equality join against the
   test side's distinct shingle hashes, AQE-broadcastable.
5. pack — concat-then-chunk sequence layout per (split, shard)
   (one window per shard group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.operators.decontam import ngram_contamination
from irclogbot_spark.operators.dedup import exact_dedup, tokens
from irclogbot_spark.operators.packing import pack_sequences
from irclogbot_spark.operators.repetition import repetition_stats
from irclogbot_spark.operators.sampling import train_test_split
from irclogbot_spark.plans.partitioning import ensure_parallelism


def prep_corpus(
    df: DataFrame,
    budget: int = 512,
    shards: int = 8,
    min_tokens: int = 5,
    max_top2gram_frac: float = 0.12,
    contam_n: int = 8,
    weights: dict[str, float] | None = None,
    salt: str = "prep",
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
    draw_fn=None,
) -> DataFrame:
    """Prepared-corpus manifest: one row per surviving doc —
    (id, lang, split, shard, n_tokens, seq_id, seq_offset)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}

    # 1. quality gate: cheap token-count filter first (map-only,
    # prunes before the repetition shuffle), then the repetition cap
    # as a left-semi join on ids that pass. The lean repetition_stats
    # (no keep-all join) suffices: every post-gate doc has >= 2
    # tokens, so it has a stats row — one corpus scan saved.
    # `enough` feeds TWO consumers (the repetition gate and the
    # left-semi join back), so materialize it once: re-scanning +
    # re-tokenizing the corpus per consumer measured ~10% slower with
    # a 2x wider spread at sf0.1 (VERDICT r3 #6). The cost is local
    # disk for one gated copy of the text — the same order as the
    # `labeled` checkpoint below, which a 100 TB run already budgets.
    # ensure_parallelism BEFORE the checkpoint: a localCheckpoint
    # freezes the physical layout, so checkpointing a single-partition
    # input (the sf0.1 one-file layout) would serialize not just this
    # write but EVERY downstream stage that inherits it — decontam's
    # 8-gram explode and the packing windows ran (0+1)/1 until round 7
    # (~8.5s -> ~3.5s at sf0.1). At 100 TB input splits are already
    # wide and this is a no-op.
    enough = ensure_parallelism(
        df.filter(F.size(tokens(F.col(text_col))) >= min_tokens)
    ).localCheckpoint(eager=True)
    # families=("top",): the gate thresholds only top2gram_frac, so
    # skip the dup-5-gram family — it would double the exploded
    # (doc, n, gram) exchange, the gate's dominant shuffle.
    rep_ok = (
        repetition_stats(enough, id_col=id_col, text_col=text_col, families=("top",))
        .filter(F.col("top2gram_frac") <= max_top2gram_frac)
        .select(id_col)
    )
    gated = enough.join(rep_ok, id_col, "left_semi")

    # 2-3. exact dedup, then split labels. labeled fans out to THREE
    # consumers (train side, held-out side, decontamination's test
    # corpus) — materialize it once or the gate+dedup subtree (incl.
    # the repetition shuffle) re-executes per consumer (the
    # multiply-referenced-frame trap; see simhash_neardup_pairs).
    # same pre-checkpoint widening: AQE coalesces the dedup shuffle's
    # output to 1 partition at small SFs, and a 1-partition `labeled`
    # would serialize decontam + packing downstream
    labeled = ensure_parallelism(
        train_test_split(
            exact_dedup(gated, text_col=text_col, id_col=id_col),
            weights,
            [id_col],
            salt=salt,
            draw_fn=draw_fn,
        )
    ).localCheckpoint(eager=True)
    tr = labeled.filter(F.col("split") == "train")
    held = labeled.filter(F.col("split") != "train")

    # 4. decontaminate the TRAIN side against the test split: the
    # contamination operator's per-doc stats frame, filtered to clean.
    # eval_gate=False: the gate broadcasts the distinct gram set of
    # the TEST-param side, which here is `tr` — the 90% train corpus.
    # A corpus-proportional gram set is not broadcastable (driver OOM
    # at 100 TB) and the gate's extra broadcast-build job is pure
    # overhead in this composition (measured 3.1->6.1 s at sf0.1,
    # VERDICT r9 #1). The ungated AQE-broadcast shape — train-side
    # distinct first, AQE picks the join strategy — is the right one
    # when the "eval" side is corpus-proportional.
    clean_ids = (
        ngram_contamination(
            labeled.filter(F.col("split") == "test"),
            tr,
            n=contam_n,
            id_col=id_col,
            text_col=text_col,
            hash_fn=hash_fn,
            eval_gate=False,
        )
        .filter(~F.col("contaminated"))
        .select(id_col)
    )
    survivors = tr.join(clean_ids, id_col, "left_semi").unionByName(held)

    # 5. pack each (split, shard) independently; lang rides through as
    # a carried column — survivors stays singly-referenced, so no
    # second checkpoint and no join-back.
    return pack_sequences(
        survivors,
        budget=budget,
        shards=shards,
        id_col=id_col,
        text_col=text_col,
        partition_cols=["split"],
        carry_cols=["lang"],
    )
