"""Watermarked stream-stream joins (SURVEY §2I category: absent in
the reference, required of the engine's streaming layer).

Structured Streaming's stream-stream join buffers both sides in
state; without a watermark AND a time-range join condition that
state grows forever. ``interval_join`` packages the correct recipe:
both inputs watermarked, and the join condition carries the
key-equality plus a bounded event-time interval — Spark derives the
state-eviction horizon from exactly those two things (see the
Structured Streaming guide, "Inner joins with optional watermarking").

At scale: the join shuffles both streams on the key once per
micro-batch; state size is bounded by (watermark + interval) x input
rate per key. An unbounded-interval join would be a correctness bug,
not a tuning problem — this helper makes it unrepresentable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    lookback: str = "1 hour",
    lookahead: str = "0 seconds",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events within [left_time - lookback,
    left_time + lookahead] per key. Columns are disambiguated with
    ``l_``/``r_`` prefixes (stream-stream joins forbid referencing
    ambiguous columns post-join, so renaming up front is the usable
    surface). Inputs whose payload columns would collide with the
    reserved ``l_key``/``l_ts``/``r_key``/``r_ts`` names (e.g. a
    column literally named ``key``) are rejected with a clear error
    instead of surfacing as a duplicate column downstream."""
    for side, df, tcol in (("l", left, left_time), ("r", right, right_time)):
        out_names = [f"{side}_key", f"{side}_ts"] + [
            f"{side}_{c}" for c in df.columns if c not in (on, tcol)
        ]
        if len(set(out_names)) != len(out_names):
            dupes = sorted({n for n in out_names if out_names.count(n) > 1})
            raise ValueError(
                f"interval_join: {side}-side column(s) collide with the "
                f"prefixed output names {dupes}; rename the input column(s)"
            )
    l = left.select(
        F.col(on).alias("l_key"),
        F.col(left_time).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (on, left_time)
        ],
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(on).alias("r_key"),
        F.col(right_time).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (on, right_time)
        ],
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.expr(f"l_ts - INTERVAL {lookback}"))
        & (F.col("r_ts") <= F.expr(f"l_ts + INTERVAL {lookahead}"))
    )
    return l.join(r, cond, how)
