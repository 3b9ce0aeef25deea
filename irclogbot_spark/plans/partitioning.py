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

#: Memo of the measured partition count per (applicationId, analyzed
#: semanticHash). ``df.rdd.getNumPartitions()`` physically plans the
#: frame's RDD pipeline — ~10-50 ms of driver work per call (round-13
#: optimization profile). Semantically equal frames in one
#: application resolve to the same scan splits, so the count is a
#: pure function of the key; re-built frames across bench passes hit
#: the memo instead of re-planning. Checkpointed inputs carry a fresh
#: RDD identity in their analyzed plan, so they can never alias a
#: stale entry. Keyed by applicationId: a restarted context (new scan
#: splits possible) never reads old counts. The schema string rides
#: along as a second discriminator so a 32-bit semanticHash collision
#: between structurally different frames cannot alias their counts
#: (ADVICE r13); a same-schema collision remains possible but the
#: failure mode is only a skipped/extra repartition, never a wrong
#: result. Caveat: a runtime spark.sql.shuffle.partitions change can
#: alter a frame's physical split count without changing its analyzed
#: plan — this engine sets it once per application (session.py).
_NPART_MEMO: dict[tuple[str, int, str], int] = {}


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition to defaultParallelism iff the current layout has
    fewer than min_fraction * defaultParallelism partitions."""
    try:
        # accessors raise under Spark Connect, where physical layout
        # introspection isn't available — fall through unchanged
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism
        key = (
            sc.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
            df._jdf.schema().catalogString(),
        )
        current = _NPART_MEMO.get(key)
        if current is None:
            current = df.rdd.getNumPartitions()
            if len(_NPART_MEMO) > 4096:  # bound driver memory
                _NPART_MEMO.clear()
            _NPART_MEMO[key] = current
    except Exception:
        return df
    if current < max(1, int(target * min_fraction)):
        return df.repartition(target)
    return df


def zorder_key(x: "Column", y: "Column", bits: int = 8) -> "Column":
    """Morton (Z-order) interleave of two ``bits``-bit dimensions —
    the multi-dimensional clustering key behind Delta/Iceberg
    OPTIMIZE ZORDER: writing a table sorted by this key makes rows
    close in BOTH dimensions land in the same files, so min/max
    row-group stats prune scans filtered on EITHER dimension (a
    single-column sort only ever prunes one). Pure bit arithmetic —
    bit b of x lands at position 2b+1, bit b of y at 2b — unrolled
    to ``2*bits`` shift/mask terms that fold into one codegen'd
    expression; inputs masked to ``bits`` bits first so the key is
    total and deterministic on any long input."""
    from pyspark.sql import functions as F

    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("long")
    for b in range(bits):
        key = key + F.shiftleft(
            F.shiftright(xm, b).bitwiseAND(F.lit(1)), 2 * b + 1
        ) + F.shiftleft(F.shiftright(ym, b).bitwiseAND(F.lit(1)), 2 * b)
    return key
