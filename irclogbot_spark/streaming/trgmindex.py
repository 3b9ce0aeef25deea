"""Continuous trigram-index maintenance: a document stream posting-
indexed per micro-batch and appended to a batch_id-partitioned
parquet index — operators/trgm.py's write-once/probe-forever layout
made continuous, the substring-search twin of streaming/annindex.py
(ANN cells) and streaming/corpus.py (dedup indexes).

    <index_dir>/index/batch_id=N/         live per-batch appends
                                          (tri_bkt is a DATA column)
    <index_dir>/buckets/gen=G/tri_bkt=K/  compacted generations
                                          (tri_bkt is a PARTITION dir)

Per-batch work is MAP-ONLY (the in-row trigram explode + a crc32
bucket column — no shuffle, no state): cost is O(batch) regardless
of accumulated index size; nothing is ever re-indexed, because the
bucket function is frozen at index creation (changing n_buckets
re-buckets the corpus — a rebuild, not maintenance, the same
contract as annindex's frozen codebooks).

Effectively-once at any crash point, by the corpus.py recipe: the
one write per batch is an OVERWRITE of this batch's own partition
directory, so a foreachBatch replay rewrites identical rows.

``compact`` folds the accumulated per-batch files into ONE
generation laid out ``partitionBy("tri_bkt")`` — generation id =
upto_batch_id + 1, the annindex crash-safe max-gen rule — so a
probe's literal bucket list lands as storage-level PartitionFilters
on the generation directories (the write_trgm_index layout) while
still seeing not-yet-compacted batches through a logical filter.
``load_trgm`` returns a frame that plugs straight into
``operators.trgm.trgm_search(index=..., index_buckets=...)`` and
serves exactly what the one-shot persisted index serves (pinned
bit-equal by test, across compaction and crash replay).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irclogbot_spark.operators.trgm import trgm_index

DOC_SCHEMA = "doc_id long, text string"
_POSTING_SCHEMA = "doc_id long, tri string, tri_bkt int"


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
    overwrite this batch's index partition — idempotent on replay.
    The sidecar meta is rewritten with identical content each batch
    (same n_buckets by contract), so replay can't tear it; a
    DIFFERENT n_buckets against an existing index raises — the
    bucket function is frozen at creation (changing it silently
    would mix bucketings and break probe pruning; re-bucketing is a
    rebuild, not maintenance)."""
    os.makedirs(index_dir, exist_ok=True)
    meta_path = os.path.join(index_dir, "_trgm_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            existing = int(json.load(f)["n_buckets"])
        if existing != n_buckets:
            raise ValueError(
                f"index at {index_dir} was created with n_buckets="
                f"{existing}; got {n_buckets} — rebucketing requires a "
                "rebuild, not an ingest"
            )
    with open(meta_path, "w") as f:
        json.dump({"n_buckets": n_buckets}, f)
    _bucketed_postings(batch, n_buckets).write.mode("overwrite").parquet(
        f"{index_dir}/index/batch_id={batch_id}"
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


def _part_ids(spark: SparkSession, path: str, prefix: str) -> list[int]:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith(prefix + "="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def compact(spark: SparkSession, index_dir: str, upto_batch_id: int) -> None:
    """Fold batch partitions [prev_gen, upto_batch_id] (plus the
    previous generation) into ``buckets/gen = upto_batch_id + 1``
    laid out partitionBy("tri_bkt"); delete the folded sources.
    Crash-safe by the annindex max-gen rule: a crash between the
    generation write and the deletes leaves both on disk, the loader
    excludes the covered batches, and re-running converges."""
    gen = upto_batch_id + 1
    gens = [g for g in _part_ids(spark, f"{index_dir}/buckets", "gen") if g != gen]
    prev = max(gens) if gens else 0
    all_batches = _part_ids(spark, f"{index_dir}/index", "batch_id")
    stale = [b for b in all_batches if b < prev]
    batches = [b for b in all_batches if prev <= b <= upto_batch_id]
    frames = []
    if gens:
        frames.append(
            spark.read.schema(_POSTING_SCHEMA)
            .parquet(f"{index_dir}/buckets/gen={prev}")
            .select("doc_id", "tri", "tri_bkt")
        )
    for b in batches:
        frames.append(
            spark.read.schema(_POSTING_SCHEMA)
            .parquet(f"{index_dir}/index/batch_id={b}")
            .select("doc_id", "tri", "tri_bkt")
        )
    if not frames:
        return
    data = frames[0]
    for fr in frames[1:]:
        data = data.unionByName(fr)
    # sever lineage before overwriting directories being read
    data = data.localCheckpoint(eager=True)
    data.write.mode("overwrite").partitionBy("tri_bkt").parquet(
        f"{index_dir}/buckets/gen={gen}"
    )
    path_cls = spark._jvm.org.apache.hadoop.fs.Path
    p = path_cls(index_dir)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    for b in batches + stale:
        fs.delete(path_cls(f"{index_dir}/index/batch_id={b}"), True)
    for g in gens:
        fs.delete(path_cls(f"{index_dir}/buckets/gen={g}"), True)


def load_trgm(spark: SparkSession, index_dir: str) -> tuple[DataFrame, int]:
    """(postings, n_buckets) over everything ingested so far: the
    max generation (partition-pruned on tri_bkt when the caller
    filters — trgm_search's literal bucket isin lands as
    PartitionFilters there) unioned with batch dirs the generation
    does not cover (batch_id >= gen; tri_bkt is a data column
    there, pruned by the same filter logically). Plugs into
    ``trgm_search(df, patterns, index=postings,
    index_buckets=n_buckets)``."""
    with open(os.path.join(index_dir, "_trgm_meta.json")) as f:
        n_buckets = int(json.load(f)["n_buckets"])
    gens = _part_ids(spark, f"{index_dir}/buckets", "gen")
    gen = max(gens) if gens else 0
    frames = []
    if gens:
        frames.append(
            spark.read.schema(_POSTING_SCHEMA)
            .parquet(f"{index_dir}/buckets/gen={gen}")
            .select("doc_id", "tri", "tri_bkt")
        )
    for b in _part_ids(spark, f"{index_dir}/index", "batch_id"):
        if b >= gen:
            frames.append(
                spark.read.schema(_POSTING_SCHEMA)
                .parquet(f"{index_dir}/index/batch_id={b}")
                .select("doc_id", "tri", "tri_bkt")
            )
    if not frames:
        empty = spark.createDataFrame([], _POSTING_SCHEMA)
        return empty, n_buckets
    data = frames[0]
    for fr in frames[1:]:
        data = data.unionByName(fr)
    return data, n_buckets
