"""Continuous corpus ingestion: a document stream deduplicated
against the accumulated history per micro-batch (north-star
composition — the streaming twin of operators/incremental.py).

Each micro-batch runs the batch-vs-history incremental dedup and
appends only the genuinely-new docs to the history table, so the
history stays exactly-deduplicated under continuous arrival. The
verdict audit trail (one row per arriving doc, including its
duplicate partner) lands beside it — the corpus-scale analog of the
reference's content-keyed idempotent ES upsert (SURVEY §2D H2/H3:
re-delivery converges at the sink; here re-delivery converges at the
history check).

Scale/correctness notes:
* foreachBatch gives at-least-once batch delivery; dedup-vs-history
  makes re-processing idempotent for `new` admission (a replayed doc
  is exact_dup_history the second time) — the same
  replay + content-key = effectively-once recipe the streaming
  pipeline uses for the irclog sink.
* The history existence probe uses the Hadoop FS API
  (pipeline.table_layout's rationale: os.path lies on HDFS/S3).
* Per batch, incremental cost scales with the batch (the banded
  index probe), not the corpus — see operators/incremental.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irclogbot_spark.operators.incremental import incremental_dedup

DOC_SCHEMA = "doc_id long, text string"


def _history(spark: SparkSession, history_dir: str, schema: str) -> DataFrame:
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(history_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path) and fs.listStatus(path):
        return spark.read.parquet(history_dir)
    return spark.createDataFrame([], schema)


def ingest_batch(
    batch: DataFrame,
    batch_id: int,
    history_dir: str,
    audit_dir: str,
    threshold: float = 0.8,
    hash_fn=None,
) -> None:
    """foreachBatch body: verdict every arriving doc against history,
    append the `new` ones, record the audit trail."""
    spark = batch.sparkSession
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in batch.schema)
    hist = _history(spark, history_dir, schema)
    verdicts = incremental_dedup(
        hist, batch, threshold=threshold, hash_fn=hash_fn
    ).localCheckpoint(eager=True)  # one evaluation: audit write + admission filter
    verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
        audit_dir
    )
    new_ids = verdicts.filter(F.col("verdict") == "new").select("doc_id")
    batch.join(new_ids, "doc_id", "left_semi").write.mode("append").parquet(
        history_dir
    )


def continuous_ingest(
    stream: DataFrame,
    history_dir: str,
    audit_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    hash_fn=None,
    trigger_available_now: bool = True,
):
    """Wire a document stream into the per-batch dedup-and-admit
    loop. Returns the started StreamingQuery."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: ingest_batch(b, i, history_dir, audit_dir, threshold, hash_fn)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
