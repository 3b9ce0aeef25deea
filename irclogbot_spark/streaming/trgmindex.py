"""Continuous trigram-index maintenance: a document stream posting-
indexed per micro-batch and appended to a batch_id-partitioned
parquet index — operators/trgm.py's write-once/probe-forever layout
made continuous, the substring-search twin of streaming/annindex.py
(ANN cells) and streaming/corpus.py (dedup indexes).

All layout, idempotence, compaction-generation, and loading
semantics live in streaming/postingindex.py (shared with the
positional text index, round 9); this module binds them to the
trigram posting projection:

    <index_dir>/index/batch_id=N/         live per-batch appends
                                          (tri_bkt is a DATA column)
    <index_dir>/buckets/gen=G/tri_bkt=K/  compacted generations
                                          (tri_bkt is a PARTITION dir)

Per-batch work is MAP-ONLY (the in-row trigram explode + a crc32
bucket column — no shuffle, no state): cost is O(batch) regardless
of accumulated index size; the bucket function is frozen at index
creation (changing n_buckets re-buckets the corpus — a rebuild, not
maintenance). ``load_trgm`` returns a frame that plugs straight into
``operators.trgm.trgm_search(index=..., index_buckets=...)`` and
serves exactly what the one-shot persisted index serves (pinned
bit-equal by test, across compaction and crash replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irclogbot_spark.operators.trgm import trgm_index
from irclogbot_spark.streaming import postingindex as _pi

DOC_SCHEMA = "doc_id long, text string"
_POSTING_SCHEMA = "doc_id long, tri string, tri_bkt int"
_COLS = ["doc_id", "tri", "tri_bkt"]
_META = "_trgm_meta.json"


def _bucketed_postings(batch: DataFrame, n_buckets: int) -> DataFrame:
    return trgm_index(batch).withColumn(
        "tri_bkt",
        F.pmod(F.crc32(F.encode(F.col("tri"), "UTF-8")), F.lit(n_buckets)).cast(
            "int"
        ),
    )


def trgm_ingest_batch(
    batch: DataFrame, batch_id: int, index_dir: str, n_buckets: int = 64
) -> None:
    """foreachBatch body: post the arriving docs (map-only) and
    overwrite this batch's index partition — idempotent on replay;
    a DIFFERENT n_buckets against an existing index raises."""
    _pi.ingest_batch(
        _bucketed_postings(batch, n_buckets),
        batch_id,
        index_dir,
        {"n_buckets": n_buckets},
        _META,
    )


def continuous_trgm(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
):
    """Wire a (doc_id, text) stream into the posting index. Returns
    the started StreamingQuery (caller manages lifecycle)."""
    return (
        stream.writeStream.foreachBatch(
            lambda b, i: trgm_ingest_batch(b, i, index_dir, n_buckets)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact(spark: SparkSession, index_dir: str, upto_batch_id: int) -> None:
    """Fold batch partitions into ``buckets/gen = upto + 1`` laid
    out partitionBy("tri_bkt"); crash-safe max-gen rule (see
    postingindex.compact)."""
    _pi.compact(
        spark, index_dir, upto_batch_id, _POSTING_SCHEMA, _COLS, "tri_bkt"
    )


def load_trgm(spark: SparkSession, index_dir: str) -> tuple[DataFrame, int]:
    """(postings, n_buckets) over everything ingested so far —
    plugs into ``trgm_search(df, patterns, index=postings,
    index_buckets=n_buckets)``."""
    data, meta = _pi.load(spark, index_dir, _POSTING_SCHEMA, _COLS, _META)
    return data, int(meta["n_buckets"])
