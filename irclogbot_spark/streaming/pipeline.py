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


#: id-hash bucket count for the keyed parquet table. At 100 TB this
#: is the merge granularity: a micro-batch rewrites only the buckets
#: its ids hash into, never the whole table — the per-key PUT cost
#: model of the reference's ES sink (irclogbot.py:50-51), not
#: O(table) per batch. Size so one bucket ~= a few GB at target SF.
N_ID_BUCKETS = 16


def table_layout(spark: SparkSession, target_dir: str) -> str:
    """Classify the upsert target via the Hadoop FileSystem API (NOT
    os.path — on HDFS/S3, where a 100 TB table actually lives, a
    local-FS probe would silently report "no table" and the first
    merge would overwrite from scratch).

    Returns 'absent' | 'bucketed' (id_bucket= partition dirs) |
    'flat' (bare .parquet files from a pre-bucketing layout) |
    'mixed' (both — a corrupted half-migrated state).
    """
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(target_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return "absent"
    names = [st.getPath().getName() for st in fs.listStatus(path)]
    bucketed = any(n.startswith("id_bucket=") for n in names)
    flat = any(
        n.endswith(".parquet") and not n.startswith(("_", ".")) for n in names
    )
    if bucketed and flat:
        return "mixed"
    if bucketed:
        return "bucketed"
    if flat:
        return "flat"
    return "absent"


def migrate_flat_to_bucketed(
    spark: SparkSession, target_dir: str, n_buckets: int = N_ID_BUCKETS
) -> None:
    """One-time migration of a legacy flat parquet table into the
    id-bucket-partitioned layout keyed_upsert_batch merges into.

    Reads the whole flat table once (O(table) — a migration, not a
    merge), rewrites it under id_bucket= partitions, then removes the
    flat files. Crash between write and delete leaves a 'mixed'
    layout that keyed_upsert_batch refuses loudly — re-running this
    migration is NOT safe on 'mixed' (the bucketed rows would double);
    recover by deleting the id_bucket= dirs and re-running.
    """
    layout = table_layout(spark, target_dir)
    if layout != "flat":
        raise RuntimeError(
            f"migrate_flat_to_bucketed expects a flat layout, found '{layout}' "
            f"at {target_dir}"
        )
    flat = spark.read.parquet(target_dir).withColumn(
        "id_bucket", F.pmod(F.xxhash64("id"), F.lit(n_buckets)).cast("int")
    )
    flat = flat.localCheckpoint(eager=True)  # sever lineage from the files we replace
    flat.write.mode("append").partitionBy("id_bucket").parquet(target_dir)
    path_cls = spark._jvm.org.apache.hadoop.fs.Path
    root = path_cls(target_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            fs.delete(st.getPath(), False)


def keyed_upsert_batch(
    batch: DataFrame, batch_id: int, target_dir: str, n_buckets: int = N_ID_BUCKETS
) -> None:
    """H3 stand-in for the ES keyed index: MERGE-by-content-id into an
    id-bucket-partitioned parquet table. Duplicate re-deliveries
    across restarts resolve here, exactly like ES PUT by _id
    (irclogbot.py:50-51). Dedup prefers the earliest posted
    (deterministic winner).

    Merge shape (the Delta-MERGE pattern on plain parquet):
    * incoming rows get ``id_bucket = pmod(xxhash64(id), n_buckets)``;
    * only the touched buckets of the existing table are read back —
      a broadcast left-semi join on the partition column, which
      dynamic partition pruning turns into a partition-pruned scan
      (no driver-side collect of data);
    * the write uses dynamic partitionOverwriteMode: Spark stages new
      files and commits them per partition, replacing ONLY partitions
      present in the output — untouched buckets' files are never
      rewritten (asserted byte-for-byte in tests/test_streaming.py).

    Crash-safety: files stage under _temporary until commit, so an
    interrupted batch leaves previous bucket generations in place
    except at most a bucket mid-promotion; checkpoint replay re-runs
    the batch and the merge is idempotent (same ids, same winners).
    Production targets Delta MERGE or the es-spark connector with
    es.mapping.id=id; this sink keeps the same contract offline.
    """
    spark = batch.sparkSession
    incoming = batch.dropDuplicates(["id"]).withColumn(
        "id_bucket", F.pmod(F.xxhash64("id"), F.lit(n_buckets)).cast("int")
    )
    layout = table_layout(spark, target_dir)
    if layout in ("flat", "mixed"):
        # a legacy flat table (or a half-migrated one): merging would
        # write id_bucket= dirs beside the flat files — subsequent
        # reads would see a conflicting mixed layout. Fail loudly;
        # migrate_flat_to_bucketed is the explicit one-time fix.
        raise RuntimeError(
            f"keyed_upsert_batch: target {target_dir} has a '{layout}' layout; "
            "run migrate_flat_to_bucketed(spark, target_dir) first"
        )
    if layout == "bucketed":
        touched = incoming.select("id_bucket").distinct()
        existing = spark.read.parquet(target_dir).join(
            F.broadcast(touched), "id_bucket", "left_semi"
        )
        merged = (
            existing.unionByName(incoming)
            .withColumn(
                "_rn", F.row_number().over(Window.partitionBy("id").orderBy("posted"))
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # materialize the merged buckets BEFORE the overwrite: severs
        # the lineage to the very files the write replaces (Spark
        # refuses a self-overwriting scan) and bounds the staging to
        # the touched buckets only
        merged = merged.localCheckpoint(eager=True)
    else:
        merged = incoming
    conf = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf, "static")
    spark.conf.set(conf, "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("id_bucket").parquet(target_dir)
    finally:
        spark.conf.set(conf, prev)


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
