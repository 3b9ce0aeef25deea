"""Generic continuous posting-index maintenance — the shared
machinery behind streaming/trgmindex.py (trigram postings) and
streaming/textindex.py (positional term postings).

Layout and guarantees (identical for every instantiation):

    <index_dir>/index/batch_id=N/          live per-batch appends
                                           (bucket is a DATA column)
    <index_dir>/buckets/gen=G/<bkt>=K/     compacted generations
                                           (bucket is a PARTITION dir)

* per-batch work is MAP-ONLY: cost is O(batch) regardless of index
  size; nothing is re-indexed because the bucket function is frozen
  at creation (a different meta against an existing index raises —
  re-bucketing is a rebuild, not maintenance);
* effectively-once at any crash point (the corpus.py recipe): the
  one write per batch OVERWRITES that batch's own partition dir, so
  a foreachBatch replay rewrites identical rows;
* ``compact`` folds batches [prev_gen, upto] plus the previous
  generation into gen = upto + 1 laid out partitionBy(bucket) —
  the annindex crash-safe max-gen rule: a crash between the
  generation write and the deletes leaves both on disk, the loader
  excludes covered batches, re-running converges;
* ``load`` serves the max generation (literal bucket filters land
  as storage-level PartitionFilters there) unioned with batch dirs
  the generation does not cover.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def ingest_batch(
    postings: DataFrame,
    batch_id: int,
    index_dir: str,
    meta: dict,
    meta_name: str,
) -> None:
    """foreachBatch body: overwrite this batch's partition with the
    (already bucketed, map-only) postings. The sidecar meta is
    rewritten with identical content each batch; differing meta
    against an existing index raises."""
    os.makedirs(index_dir, exist_ok=True)
    meta_path = os.path.join(index_dir, meta_name)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            existing = json.load(f)
        if existing != meta:
            raise ValueError(
                f"index at {index_dir} was created with meta={existing}; "
                f"got {meta} — changing the bucket function requires a "
                "rebuild, not an ingest (n_buckets is frozen at creation)"
            )
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    postings.write.mode("overwrite").parquet(
        f"{index_dir}/index/batch_id={batch_id}"
    )


def part_ids(spark: SparkSession, path: str, prefix: str) -> list[int]:
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


def compact(
    spark: SparkSession,
    index_dir: str,
    upto_batch_id: int,
    schema: str,
    cols: list[str],
    bucket_col: str,
) -> None:
    """Fold batch partitions into ``buckets/gen = upto + 1`` laid
    out partitionBy(bucket_col); delete the folded sources."""
    gen = upto_batch_id + 1
    gens = [g for g in part_ids(spark, f"{index_dir}/buckets", "gen") if g != gen]
    prev = max(gens) if gens else 0
    all_batches = part_ids(spark, f"{index_dir}/index", "batch_id")
    stale = [b for b in all_batches if b < prev]
    batches = [b for b in all_batches if prev <= b <= upto_batch_id]
    frames = []
    if gens:
        frames.append(
            spark.read.schema(schema)
            .parquet(f"{index_dir}/buckets/gen={prev}")
            .select(*cols)
        )
    for b in batches:
        frames.append(
            spark.read.schema(schema)
            .parquet(f"{index_dir}/index/batch_id={b}")
            .select(*cols)
        )
    if not frames:
        return
    data = frames[0]
    for fr in frames[1:]:
        data = data.unionByName(fr)
    # sever lineage before overwriting directories being read
    data = data.localCheckpoint(eager=True)
    data.write.mode("overwrite").partitionBy(bucket_col).parquet(
        f"{index_dir}/buckets/gen={gen}"
    )
    path_cls = spark._jvm.org.apache.hadoop.fs.Path
    p = path_cls(index_dir)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    for b in batches + stale:
        fs.delete(path_cls(f"{index_dir}/index/batch_id={b}"), True)
    for g in gens:
        fs.delete(path_cls(f"{index_dir}/buckets/gen={g}"), True)


def load(
    spark: SparkSession,
    index_dir: str,
    schema: str,
    cols: list[str],
    meta_name: str,
) -> tuple[DataFrame, dict]:
    """(postings, meta) over everything ingested so far."""
    with open(os.path.join(index_dir, meta_name)) as f:
        meta = json.load(f)
    gens = part_ids(spark, f"{index_dir}/buckets", "gen")
    gen = max(gens) if gens else 0
    frames = []
    if gens:
        frames.append(
            spark.read.schema(schema)
            .parquet(f"{index_dir}/buckets/gen={gen}")
            .select(*cols)
        )
    for b in part_ids(spark, f"{index_dir}/index", "batch_id"):
        if b >= gen:
            frames.append(
                spark.read.schema(schema)
                .parquet(f"{index_dir}/index/batch_id={b}")
                .select(*cols)
            )
    if not frames:
        return spark.createDataFrame([], schema), meta
    data = frames[0]
    for fr in frames[1:]:
        data = data.unionByName(fr)
    return data, meta
