"""At-rest text index — the ES index as a storage artifact.

One persisted artifact serves every term-level query type the engine
exposes: POSITIONAL postings (id, term, positions — strictly more
general than (id, term, tf): tf = size(positions)) PARTITIONED by a
crc32 term bucket, plus the narrow doclens table. The layout mirrors
operators/trgm.py's bucketed posting convention (round 8): literal
probe terms compute their bucket list DRIVER-side (zlib.crc32 is
bit-identical to Spark's `crc32`), so an exact-term probe — BM25,
match_phrase, span_near — reads only the probed bucket directories
(storage-level PartitionFilters), never the whole index.

Honest pruning boundary, stated once: FUZZY term queries and
more_like_this read the full postings by nature (fuzzy must see
every vocabulary term within edit distance; MLT derives document
frequency over all terms), so bucket pruning cannot help them — they
get the artifact reuse (no corpus re-scan) without the prune. ES has
the same asymmetry: a term query hits one postings list, a fuzzy
query walks the term dictionary.

Streaming maintenance lives in streaming/textindex.py (the
trgmindex.py recipe: per-batch map-only appends into the batch's own
partition dir, generation compaction, replay idempotence).
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irclogbot_spark.functions.text import build_positional_index

META_NAME = "_text_index_meta.json"


def py_term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side bucket of a term — bit-identical to the plan's
    `pmod(crc32(encode(term, 'UTF-8')), n_buckets)`."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_col(term, n_buckets: int):
    col = F.col(term) if isinstance(term, str) else term
    return F.pmod(F.crc32(F.encode(col, "UTF-8")), F.lit(n_buckets))


def write_text_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Persist the positional postings partitioned by term bucket
    (bounded directory fan-out regardless of vocabulary size) and
    the doclens table; a sidecar JSON records n_buckets so probes
    recompute the same buckets."""
    pidx = build_positional_index(df, id_col, text_col).withColumn(
        "term_bkt", term_bucket_col("term", n_buckets)
    )
    pidx.write.partitionBy("term_bkt").mode("overwrite").parquet(
        os.path.join(path, "postings")
    )
    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
    df.select(F.col(id_col), F.size(toks).alias("dl")).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "doclens"))
    with open(os.path.join(path, META_NAME), "w") as f:
        json.dump({"n_buckets": n_buckets, "id_col": id_col}, f)


def read_text_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, int]:
    """(positional postings, doclens, n_buckets) from an at-rest
    index."""
    with open(os.path.join(path, META_NAME)) as f:
        meta = json.load(f)
    return (
        spark.read.parquet(os.path.join(path, "postings")),
        spark.read.parquet(os.path.join(path, "doclens")),
        int(meta["n_buckets"]),
    )


def probe_postings(
    pidx: DataFrame, terms: list[str], n_buckets: int | None = None
) -> DataFrame:
    """Bucket-pruned positional postings for LITERAL probe terms:
    the `term_bkt IN (...)` literals land as PartitionFilters (only
    the probed directories are read), then the exact term filter
    cuts within-bucket hash collisions. With n_buckets=None (an
    in-session frame with no bucket column) only the term filter
    applies — same rows either way."""
    out = pidx
    if n_buckets is not None:
        want = sorted({py_term_bucket(t, n_buckets) for t in terms})
        out = out.filter(F.col("term_bkt").isin(want))
    return out.filter(F.col("term").isin(list(terms)))


def postings_tf(pidx: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The (id, term, tf) projection every count-based consumer
    (bm25_rank_indexed, fuzzy_term_search, more_like_this,
    prefix_suggest) accepts — tf is the position-list size, so the
    positional artifact strictly generalizes the tf one."""
    return pidx.select(
        id_col, "term", F.size("positions").cast("long").alias("tf")
    )
