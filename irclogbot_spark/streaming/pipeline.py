"""Structured Streaming twin of the batch ingest path (SURVEY.md §3 E1).

The reference's live topology — socket recv loop -> per-line operator
chain -> idempotent keyed ES write, supervised by heartbeat watchdogs
(E3) — maps to:

  readStream (socket for live, file/text for tests and replay)
    -> ingest.parse_pipeline          (identical code to batch)
    -> withWatermark + dropDuplicates (H2 under bounded state)
    -> foreachBatch idempotent keyed upsert (H3)

Effectively-once = replayable source + checkpoint + content-keyed
idempotent sink — the Spark recipe for the reference's restart-must-
not-duplicate invariant (runbots.py/keep_alive.py supervision;
heartbeats become StreamingQueryListener progress events).

Deliberate, documented divergence (SURVEY.md §4): the reference
dedups against the *entire history* via ES PUT-by-id; a stream must
bound state, so in-stream dedup holds within the watermark horizon
and whole-history convergence happens at the keyed sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from irclogbot_spark.ingest import DEDUP_KEY, parse_pipeline


def read_raw_lines_stream(
    spark: SparkSession,
    path: str | None = None,
    host: str | None = None,
    port: int | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1: streaming raw-line source. File/text directory for tests &
    replay; socket for live IRC-shaped feeds. Rate control (the
    reference's join pacing, D4) = maxFilesPerTrigger / trigger
    intervals instead of sleeps."""
    if path is not None:
        reader = spark.readStream.format("text")
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.load(path)
    if host is not None and port is not None:
        return (
            spark.readStream.format("socket").option("host", host).option("port", port).load()
        )
    raise ValueError("need path= (file source) or host=/port= (socket source)")


def streaming_irclog(
    raw: DataFrame,
    watermark: str = "10 minutes",
    dedup_in_stream: bool = True,
) -> DataFrame:
    """The batch transform chain, unchanged, under streaming semantics.

    Event time is processing wall-clock exactly like the reference
    (P4 captures utcnow at parse). dropDuplicatesWithinWatermark
    bounds H2 state to the watermark horizon.
    """
    log = parse_pipeline(raw)
    # watermarks require TIMESTAMP (with zone): the canonical NTZ
    # posted is cast back for streaming — value-preserving under the
    # engine's pinned UTC session
    log = log.withColumn("posted", F.col("posted").cast("timestamp"))
    log = log.withWatermark("posted", watermark)
    if dedup_in_stream:
        log = log.dropDuplicatesWithinWatermark(DEDUP_KEY)
    return log


def keyed_upsert_batch(batch: DataFrame, batch_id: int, target_dir: str) -> None:
    """H3 stand-in for the ES keyed index: MERGE-by-content-id into a
    keyed parquet table. Duplicate re-deliveries across restarts
    resolve here, exactly like ES PUT by _id (irclogbot.py:50-51).

    Parquet has no MERGE, so the upsert is read-union-dedup-rewrite —
    fine for a test sink; production would target Delta MERGE or the
    es-spark connector with es.mapping.id=id. Dedup prefers the
    earliest posted (deterministic winner).
    """
    spark = batch.sparkSession
    incoming = batch.dropDuplicates(["id"])
    tmp = target_dir.rstrip("/") + ".staging"
    if os.path.isdir(target_dir) and any(
        f.endswith(".parquet") for f in os.listdir(target_dir)
    ):
        existing = spark.read.parquet(target_dir)
        merged = (
            existing.unionByName(incoming)
            .withColumn(
                "_rn", F.row_number().over(Window.partitionBy("id").orderBy("posted"))
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(target_dir)
    else:
        incoming.write.mode("overwrite").parquet(target_dir)


def start_irclog_stream(
    spark: SparkSession,
    source_path: str,
    target_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    trigger_once: bool = True,
):
    """Wire source -> transforms -> idempotent keyed sink, checkpointed.

    trigger_once=True gives deterministic drain-everything semantics
    for tests; production uses a processingTime trigger.
    """
    log = streaming_irclog(read_raw_lines_stream(spark, path=source_path), watermark)
    writer = (
        log.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda b, i: keyed_upsert_batch(b, i, target_dir))
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
