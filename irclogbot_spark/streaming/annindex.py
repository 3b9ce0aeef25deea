"""Continuous ANN index maintenance: an embedding stream encoded per
micro-batch against FROZEN learned tables (IVF cell + PQ codes,
plan constants) and appended to a batch_id-partitioned parquet index
— operators/pq.py's write-once/probe-forever story made continuous,
the embedding twin of streaming/corpus.py's dedup-index maintenance.

    <index_dir>/index/batch_id=N/   (vec_id, cell, codes, embedding)

Encoding is MAP-ONLY (no shuffle, no state): per-batch cost is
O(batch) regardless of accumulated index size — nothing is ever
re-encoded, because the codebooks/centroids are frozen at index
creation (re-training would re-code the whole corpus; that is a
rebuild, not maintenance, exactly as in FAISS/Lucene deployments).

Effectively-once at any crash point, by the corpus.py recipe: the
one write per batch is an OVERWRITE of this batch's own partition
directory, so a foreachBatch replay rewrites identical rows.

Probing: ``load_index`` reads the accumulated rows back (a real
deployment re-partitions compacted generations BY CELL so probes
prune partitions); ``operators.pq.ivfpq_search`` runs against the
loaded frame and — both sides deterministic — returns exactly what
``ivfpq_topk`` returns over the union of all ingested batches
(pinned by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irclogbot_spark.operators.pq import encode_ivfpq

EMB_SCHEMA = "vec_id long, embedding array<float>"


def ingest_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    centroids: list[list[float]],
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """foreachBatch body: encode the arriving vectors (map-only) and
    overwrite this batch's index partition — idempotent on replay."""
    enc = encode_ivfpq(batch, centroids, books, id_col=id_col, vec_col=vec_col)
    enc.write.mode("overwrite").parquet(f"{index_dir}/index/batch_id={batch_id}")


def continuous_index(
    spark: SparkSession,
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Wire a streaming frame of (id, vector) rows into the index.
    Returns the StreamingQuery (caller manages lifecycle)."""

    def _body(batch: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch, batch_id, index_dir, centroids, books, id_col=id_col, vec_col=vec_col
        )

    return (
        stream.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def load_index(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The accumulated index rows, sans bookkeeping. Missing/empty
    dir yields an empty frame (explicit schema — a crash-leftover
    partition with no committed files must not break inference)."""
    schema = (
        f"{id_col} long, cell int, codes array<int>, "
        f"{vec_col} array<float>, batch_id long"
    )
    path = f"{index_dir}/index"
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p) and fs.listStatus(p):
        return spark.read.schema(schema).parquet(path).drop("batch_id")
    return spark.createDataFrame([], schema).drop("batch_id")
