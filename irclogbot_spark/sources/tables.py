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

#: Memo of the ANALYZED scan frame per (applicationId, sf_dir, name).
#: `spark.read.parquet` re-resolves the datasource on every call —
#: file listing + footer schema read + FileIndex construction —
#: measured at ~0.18 s per call on this host (round-13 optimization
#: profile, guide §6 listing cost). A query touching six TPC-H tables
#: paid ~1 s of pure scan *setup* per bench pass. DataFrames are
#: immutable, so returning the same analyzed frame is semantics-free:
#: no data is cached (the scan still reads parquet on every action);
#: only the driver-side relation resolution is reused. Keyed by
#: applicationId so a restarted SparkContext never serves frames
#: bound to a dead session.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table, normalizing types.

    events.ts is TIMESTAMP(NANOS) on disk, unreadable by Spark's
    vectorized parquet reader; with spark.sql.legacy.parquet.nanosAsLong
    it arrives as a long which we convert to a timestamp (values are
    whole microseconds, so integer division by 1000 is lossless and
    matches DuckDB's nanos->us coercion bit-for-bit).

    CONTRACT: corpus directories are immutable for the lifetime of a
    Spark application — the memo holds a resolved FileIndex, so a
    process that regenerates a table under ``sf_dir`` in-application
    MUST call :func:`invalidate_table` first (mirror of the artifact
    memo's writer-side :func:`invalidate_scan` discipline).
    """
    try:
        key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), name)
    except Exception:  # Spark Connect: no sparkContext — skip the memo
        key = None
    if key is not None:
        cached = _TABLE_CACHE.get(key)
        if cached is not None:
            return cached
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
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if key is not None:
        _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def invalidate_table(sf_dir: str, name: str | None = None) -> None:
    """Drop memoized corpus-table frames for ``sf_dir`` (all tables,
    or just ``name``) — the hook any in-application corpus writer
    must call after regenerating files (ADVICE r13: _TABLE_CACHE had
    no invalidation path, unlike the artifact memo)."""
    sf = sf_dir.rstrip("/")
    for k in [
        k for k in _TABLE_CACHE if k[1] == sf and (name is None or k[2] == name)
    ]:
        del _TABLE_CACHE[k]


#: Analyzed-scan memo for WRITE-ONCE on-disk artifacts (text/trgm
#: index directories): same ~0.18 s/call relation-resolution cost as
#: the corpus tables above, paid by every at-rest probe on every
#: bench pass. Writers MUST call :func:`invalidate_scan` after
#: rewriting a memoized path — the memo holds a resolved FileIndex,
#: which would otherwise reference replaced files.
_SCAN_MEMO: dict[tuple[str, str], DataFrame] = {}


def memo_scan(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` memoized per (application, path);
    falls back to a plain read when no sparkContext is reachable
    (Spark Connect)."""
    try:
        key = (spark.sparkContext.applicationId, path)
    except Exception:
        return spark.read.parquet(path)
    df = _SCAN_MEMO.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _SCAN_MEMO[key] = df
    return df


def invalidate_scan(path: str) -> None:
    """Drop every memoized scan at or under ``path`` (writer hook)."""
    for k in [k for k in _SCAN_MEMO if k[1].startswith(path)]:
        del _SCAN_MEMO[k]
