"""bin_range_join semantics (operators/rangejoin.py): half-open
boundaries, bin-edge intervals, overlapping windows, collision guard,
and the no-cartesian plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from irclogbot_spark.operators.rangejoin import bin_range_join


def _pts(spark, ts_list):
    return spark.createDataFrame([(i, t) for i, t in enumerate(ts_list)], "pid long, ts timestamp")


def _wins(spark, pairs):
    return spark.createDataFrame(pairs, "w_start timestamp, w_end timestamp")


T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def test_half_open_boundaries(spark):
    wins = _wins(spark, [(T0, T0 + dt.timedelta(hours=6))])
    pts = _pts(
        spark,
        [
            T0,  # == start: in
            T0 + dt.timedelta(hours=6) - dt.timedelta(microseconds=1),  # in
            T0 + dt.timedelta(hours=6),  # == end: OUT (half-open)
            T0 - dt.timedelta(microseconds=1),  # before: out
        ],
    )
    got = {r.pid for r in bin_range_join(pts, wins, "ts", "w_start", "w_end").collect()}
    assert got == {0, 1}


def test_interval_ending_on_bin_edge_does_not_cover_that_bin(spark):
    # window [10:00, 11:00) must not match an 11:00 event even though
    # a naive inclusive sequence would explode the 11:00 bin
    wins = _wins(spark, [(T0, T0 + dt.timedelta(hours=1))])
    pts = _pts(spark, [T0 + dt.timedelta(hours=1)])
    assert bin_range_join(pts, wins, "ts", "w_start", "w_end").count() == 0


def test_overlapping_windows_match_independently(spark):
    wins = _wins(
        spark,
        [
            (T0, T0 + dt.timedelta(hours=3)),
            (T0 + dt.timedelta(hours=2), T0 + dt.timedelta(hours=5)),
        ],
    )
    pts = _pts(spark, [T0 + dt.timedelta(hours=2, minutes=30)])
    # the point sits in both windows -> two rows
    assert bin_range_join(pts, wins, "ts", "w_start", "w_end").count() == 2


def test_unaligned_boundaries_mid_bin(spark):
    # start/end mid-hour: containment is the exact predicate, not the bin
    s = T0 + dt.timedelta(minutes=45)
    wins = _wins(spark, [(s, s + dt.timedelta(hours=1))])
    pts = _pts(
        spark,
        [
            T0 + dt.timedelta(minutes=30),  # same bin as start, before start
            T0 + dt.timedelta(minutes=50),  # in
            T0 + dt.timedelta(hours=1, minutes=50),  # after end, in end's bin
        ],
    )
    got = {r.pid for r in bin_range_join(pts, wins, "ts", "w_start", "w_end").collect()}
    assert got == {1}


def test_column_collision_raises(spark):
    wins = _wins(spark, [(T0, T0 + dt.timedelta(hours=1))]).withColumnRenamed(
        "w_start", "ts"
    )
    pts = _pts(spark, [T0])
    with pytest.raises(ValueError, match="share column names"):
        bin_range_join(pts, wins, "ts", "ts", "w_end")
    with pytest.raises(ValueError, match="bin must be"):
        bin_range_join(pts, _wins(spark, [(T0, T0)]), "ts", "w_start", "w_end", bin="week")


def test_degenerate_intervals_match_nothing(spark):
    """Half-open [s, s) and inverted (end < start) intervals are
    legitimate empty intervals: they must match nothing — not raise
    F.sequence's illegal-boundaries error at runtime."""
    wins = _wins(
        spark,
        [
            (T0, T0),  # empty [s, s)
            (T0 + dt.timedelta(hours=2), T0 + dt.timedelta(hours=1)),  # inverted
            (T0, T0 + dt.timedelta(hours=1)),  # real window
        ],
    )
    pts = _pts(spark, [T0, T0 + dt.timedelta(minutes=30)])
    rows = bin_range_join(pts, wins, "ts", "w_start", "w_end").collect()
    assert {(r.pid, r.w_end) for r in rows} == {
        (0, T0 + dt.timedelta(hours=1)),
        (1, T0 + dt.timedelta(hours=1)),
    }


def test_plan_is_equi_join_not_nested_loop(spark):
    wins = _wins(spark, [(T0, T0 + dt.timedelta(hours=6))])
    pts = _pts(spark, [T0 + dt.timedelta(hours=i) for i in range(8)])
    plan = (
        bin_range_join(pts, wins, "ts", "w_start", "w_end")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_differential_vs_naive_inequality_join(spark):
    """Randomized (seeded) differential: bin_range_join must equal the
    plain inequality join on arbitrary unaligned intervals across all
    bin granularities."""
    import random

    rng = random.Random(42)
    base = dt.datetime(2024, 3, 1)
    pts_rows = [
        (i, base + dt.timedelta(seconds=rng.randrange(0, 5 * 86400)))
        for i in range(120)
    ]
    win_rows = []
    for _ in range(25):
        s = base + dt.timedelta(seconds=rng.randrange(0, 5 * 86400))
        win_rows.append((s, s + dt.timedelta(seconds=rng.randrange(1, 12 * 3600))))
    pts = spark.createDataFrame(pts_rows, "pid long, ts timestamp")
    wins = spark.createDataFrame(win_rows, "w_start timestamp, w_end timestamp")

    naive = {
        (p, s)
        for (p, t) in pts_rows
        for (s, e) in win_rows
        if s <= t < e
    }
    for bin in ("minute", "hour", "day"):
        got = {
            (r.pid, r.w_start)
            for r in bin_range_join(pts, wins, "ts", "w_start", "w_end", bin=bin).collect()
        }
        assert got == naive, f"bin={bin}: {len(got)} vs {len(naive)}"
