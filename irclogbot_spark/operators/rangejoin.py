"""Point-in-interval range join via bin bucketing.

A range join with NO equality key (event.ts BETWEEN window.start AND
window.end) is the classic Spark trap: Catalyst can only plan it as a
BroadcastNestedLoopJoin (fine while the interval side is tiny) or a
cartesian product (fatal). The standard scale fix — what dedicated
engines implement as a "range join optimization" — is to manufacture
an equality key: quantize time into fixed bins, explode each interval
into the bins it overlaps, bin each point ONCE, hash-join on the bin,
then re-check the exact containment predicate. O(points + intervals ×
bins_per_interval) through a plain shuffled hash join instead of
O(points × intervals).

Bin-size trade-off: bins ≈ the typical interval length keep the
interval-side explosion at a handful of rows per interval while the
point side never fans out (a point has exactly one bin; it matches an
interval at most once because the interval's bin list contains each
bin once — no post-join dedup needed). Skew is bounded by
points-per-bin, i.e. by the data's own time distribution, and AQE's
skew-join split handles a hot bin like any other hot key.

The bins are purely a PHYSICAL strategy — they never appear in the
output, and the DuckDB oracle for queries built on this operator is
the plain inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BINS = {"minute": "minute", "hour": "hour", "day": "day"}


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin: str = "hour",
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= ts < end`` (half-open, the streaming-window
    convention). Returns points columns + interval columns.

    Column names must not collide across the two inputs (raises
    loudly — same rule as streaming.joins.interval_join)."""
    if bin not in _BINS:
        raise ValueError(f"bin must be one of {sorted(_BINS)}, got {bin!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points/intervals share column names {sorted(overlap)}; "
            "rename one side before joining"
        )
    binned = points.withColumn("__rj_bin", F.date_trunc(bin, F.col(ts_col)))
    # half-open end: the last covered bin is the one containing
    # end - 1 microsecond (an interval ending exactly on a bin edge
    # does not cover that bin). A degenerate interval (end <= start,
    # incl. the legitimate empty [s, s)) must match nothing — without
    # the guard F.sequence raises illegal-boundaries when the
    # truncated end falls before the truncated start with a positive
    # step, failing the whole job at runtime.
    exploded = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__rj_bin",
        F.explode(
            F.sequence(
                F.date_trunc(bin, F.col(start_col)),
                F.date_trunc(
                    bin, F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND")
                ),
                F.expr(f"INTERVAL 1 {_BINS[bin].upper()}"),
            )
        ),
    )
    return (
        binned.join(exploded, "__rj_bin")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__rj_bin")
    )
