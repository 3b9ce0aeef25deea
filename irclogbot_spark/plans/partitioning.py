"""Partition-layout guards for CPU-bound operators.

A parquet scan parallelizes at file/row-group granularity. A small
single-row-group file therefore yields ONE input partition — and a
compute-heavy per-row operator (MinHash signatures, SimHash votes,
regex parse + sha over millions of lines) then runs on one core of
the whole cluster. Observed locally: 4.4s single-threaded shingle
hashing on a 32-core session reading one 600 KB file.

``ensure_parallelism`` round-robins the input up to the session's
default parallelism, but ONLY when the scan is under-partitioned —
on a real cluster whose input is already thousands of splits it is a
no-op, so well-laid-out 100 TB inputs never pay a gratuitous
shuffle. The shuffle it does introduce moves the raw source rows
once, which is strictly cheaper than serializing hash work onto one
core whenever per-row compute dominates scan cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition to defaultParallelism iff the current layout has
    fewer than min_fraction * defaultParallelism partitions."""
    try:
        # both accessors raise under Spark Connect, where physical
        # layout introspection isn't available — fall through unchanged
        target = df.sparkSession.sparkContext.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current < max(1, int(target * min_fraction)):
        return df.repartition(target)
    return df
