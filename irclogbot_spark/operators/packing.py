"""Sequence packing: assign documents to fixed-token-budget training
sequences (north-star extension — the step between a filtered corpus
and a training dataloader).

Semantics: GPT-style concat-then-chunk. Documents are laid out in a
deterministic order, their token streams concatenated, and the stream
cut every ``budget`` tokens; a document's ``seq_id`` is the chunk its
first token lands in, ``seq_offset`` the position within that chunk.
Downstream consumers that forbid straddling can re-cut from these
offsets; the expensive part — a stable global layout — is done here.

Scale shape: a single global ordering would serialize into one task,
so the layout is sharded: ``shard = pmod(id, shards)`` (content-
derived — stable under retry/repartition, unlike a random or
partition-index shard), and packing runs per shard via ONE window
(partitionBy shard, orderBy id) — one shuffle + per-shard sort, all
shards in parallel. Each shard yields seqs [0..ceil(shard_tokens/
budget)); global seq ids are (shard, seq_id) pairs. At 100 TB, pick
shards ≈ cluster cores × small constant; each sort is 1/shards of
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from irclogbot_spark.functions.text import WORD_RE
from irclogbot_spark.plans.partitioning import ensure_parallelism


def batch_by_length(
    df: DataFrame,
    batch_size: int = 8,
    shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-bucketed batching (the fairseq/dataloader padding
    optimization): within each content-derived shard, sort docs by
    token length and cut consecutive runs of ``batch_size`` into
    batches, so a batch pads every member to a max length close to
    its mean. Returns per-batch stats: ``(shard, batch_id, n_docs,
    max_tokens, sum_tokens, pad_waste)`` where pad_waste =
    max_tokens * n_docs - sum_tokens — the tokens burned on padding
    (the number this operator exists to minimize; random batching
    pays the corpus-max per batch).

    Same scale shape as pack_sequences: shard = pmod(id, shards)
    (stable under retry/repartition), ONE window shuffle whose
    partitions are rows/shards, per-batch stats partial-aggregate on
    the same keys. The trailing short batch per shard is emitted
    honestly (n_docs < batch_size).
    """
    from irclogbot_spark.functions.text import token_count

    base = ensure_parallelism(df).select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(shards)).cast("long").alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("n_tokens", id_col)
    per_doc = base.select(
        "shard",
        "n_tokens",
        F.row_number().over(w).alias("_rn"),
    ).select(
        "shard",
        "n_tokens",
        # integer DIV (DuckDB //): the repo's exact floor-rate rule
        F.expr(f"(_rn - 1) DIV {int(batch_size)}").cast("long").alias("batch_id"),
    )
    stats = per_doc.groupBy("shard", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    return stats.select(
        "shard",
        "batch_id",
        "n_docs",
        "max_tokens",
        "sum_tokens",
        (F.col("max_tokens") * F.col("n_docs") - F.col("sum_tokens"))
        .cast("long")
        .alias("pad_waste"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_cols: list[str] | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-doc packing assignment: (*partition_cols, id, shard,
    n_tokens, seq_id, seq_offset, *carry_cols), whitespace tokens.
    Empty docs occupy zero tokens and pack at the current cursor like
    any zero-length doc. ``partition_cols`` (e.g. a train/val/test
    split label) scope the layout: each (partition, shard) packs its
    own independent sequence space. ``carry_cols`` are projected
    through untouched — cheaper than a join-back when the caller
    wants per-doc metadata beside the assignment.
    """
    partition_cols = partition_cols or []
    carry_cols = carry_cols or []
    toks = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(WORD_RE), F.lit(0))
    ).cast("long")
    base = ensure_parallelism(df).select(
        *partition_cols,
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(shards)).cast("long").alias("shard"),
        toks.alias("n_tokens"),
        *carry_cols,
    )
    w = (
        Window.partitionBy(*partition_cols, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tok_start")
    return base.select(
        *partition_cols, id_col, "shard", "n_tokens", start, *carry_cols
    ).select(
        *partition_cols,
        id_col,
        "shard",
        "n_tokens",
        F.floor(F.col("tok_start") / budget).cast("long").alias("seq_id"),
        F.pmod(F.col("tok_start"), F.lit(budget).cast("long")).alias("seq_offset"),
        *carry_cols,
    )


def chunk_documents(
    df: DataFrame,
    chunk: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunks per document — the
    context-window splitter that feeds long documents to a
    fixed-window model (and the retrieval-index chunker): windows of
    ``chunk`` whitespace tokens starting every ``chunk - overlap``
    tokens, the final window short. One row per chunk:
    (id, chunk_idx, start_token, n_tokens, chunk_text).

    MAP-ONLY: tokenize -> per-row start positions (sequence) ->
    posexplode -> slice/join. Zero shuffles at any scale; the output
    is ~(1 + overlap/(chunk-overlap))x the corpus text, the inherent
    chunking cost. Empty docs yield no rows (sequence guard: Spark's
    3-arg sequence needs start <= stop for a positive step)."""
    if not 0 <= overlap < chunk:
        raise ValueError(f"need 0 <= overlap < chunk, got chunk={chunk} overlap={overlap}")
    step = chunk - overlap
    from irclogbot_spark.operators.dedup import tokens

    t = ensure_parallelism(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), F.col("_toks"), F.size("_toks").alias("_n"))
    starts = F.when(
        F.col("_n") >= 1, F.sequence(F.lit(1), F.col("_n"), F.lit(step))
    ).otherwise(F.array().cast("array<int>"))
    return t.select(
        F.col(id_col), "_toks", "_n", F.posexplode(starts).alias("chunk_idx", "st")
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long"),
        F.col("st").cast("long").alias("start_token"),
        F.least(F.lit(chunk), F.col("_n") - F.col("st") + 1)
        .cast("long")
        .alias("n_tokens"),
        F.array_join(F.slice("_toks", F.col("st"), F.lit(chunk)), " ").alias(
            "chunk_text"
        ),
    )
