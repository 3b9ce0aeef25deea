"""Parquet scan layer for the driver corpus (TESTDATA.md / FIXTURES.md §B).

All reads go through ``load_table`` so that (a) the nanosecond-
timestamp quirk of events.parquet is normalized in exactly one place
and (b) every query starts from a plain ``spark.read.parquet`` scan
that Catalyst can push filters/projections into (check for
``PushedFilters`` in .explain output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions worth broadcasting in joins at any scale factor —
# region/nation are bounded by geography; supplier stays tiny in this
# corpus. customer/part/orders/lineitem grow with SF and must shuffle.
BROADCAST_TABLES = {"region", "nation", "supplier"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table, normalizing types.

    events.ts is TIMESTAMP(NANOS) on disk, unreadable by Spark's
    vectorized parquet reader; with spark.sql.legacy.parquet.nanosAsLong
    it arrives as a long which we convert to a timestamp (values are
    whole microseconds, so integer division by 1000 is lossless and
    matches DuckDB's nanos->us coercion bit-for-bit).
    """
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes)["ts"] == "bigint":
            # integer division: epoch-nanos (~1.8e18) far exceeds the
            # 2^53 exact range of a double — '/' would drift by ±1us.
            # timestamp_micros yields LTZ; cast to NTZ (UTC session)
            # to match every other corpus timestamp column.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
