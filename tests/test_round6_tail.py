"""Semantics tests for the late-round-6 tail: last-touch
attribution edge cases, salted-join bucket invariance, adaptive
quality gate properties, and the unpivot round-trip. The DuckDB
parity suite checks these against SQL twins; here we pin the
behavioral contracts a twin could silently share a bug with."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from irclogbot_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=dt.datetime(2024, 1, d, h),
                user_id=u,
                event_type=t,
                value=0.0,
                props="{}",
            )
            for i, (d, h, u, t) in enumerate(rows)
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def _attribution_body(spark, ev):
    """Run the events_attribution window body over a literal frame."""
    import irclogbot_spark.queries as qmod

    orig = qmod._t
    qmod._t = lambda s, sf, name: ev
    try:
        return {
            (r.touch): (r.n_conversions, r.n_users)
            for r in QUERIES["events_attribution"](spark, SF).collect()
        }
    finally:
        qmod._t = orig


def test_attribution_credits_most_recent_touch(spark):
    out = _attribution_body(
        spark,
        _ev(
            spark,
            [
                (1, 1, 1, "view"),
                (1, 2, 1, "click"),  # most recent prior touch wins
                (1, 3, 1, "purchase"),
            ],
        ),
    )
    assert out == {"click": (1, 1)}


def test_attribution_lookback_expires_after_seven_days(spark):
    out = _attribution_body(
        spark,
        _ev(
            spark,
            [
                (1, 1, 1, "click"),
                (9, 2, 1, "purchase"),  # 8 days later -> none
                (20, 1, 2, "view"),
                (26, 1, 2, "purchase"),  # 6 days -> view
            ],
        ),
    )
    assert out == {"none": (1, 1), "view": (1, 1)}


def test_attribution_conversion_cannot_credit_itself_or_later_touch(spark):
    out = _attribution_body(
        spark,
        _ev(
            spark,
            [
                (1, 1, 1, "purchase"),  # nothing prior -> none
                (1, 2, 1, "click"),  # later touch must not count
            ],
        ),
    )
    assert out == {"none": (1, 1)}


def test_salted_join_result_invariant_in_salt_buckets(spark):
    """Different bucket counts are physically different joins but
    must be value-identical — the salt is pure plumbing."""
    from irclogbot_spark.plans.skew import salted_join

    ev = entrymod.queries()["events_salted_enrich"]
    base = {tuple(r) for r in ev(spark, SF).collect()}

    import irclogbot_spark.queries as qmod

    d = qmod._t(spark, SF, "events")
    dim = d.groupBy(F.col("user_id").alias("d_user")).agg(
        F.count(F.lit(1)).alias("n_user_events")
    )
    fact = d.select("event_id", F.col("user_id").alias("d_user"), "event_type")
    other = (
        salted_join(fact, dim, on="d_user", salt_buckets=3, salt_on=["event_id"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("n_user_events").alias("sum_user_activity"),
        )
    )
    assert {tuple(r) for r in other.collect()} == base


def test_adaptive_quality_threshold_is_per_source_p25(spark):
    """Every kept doc clears its OWN source's bar; the keep rate per
    source is ~75% by construction of a continuous-ish p25; and at
    least two sources end up with different thresholds (the whole
    point vs a global gate)."""
    rows = entrymod.queries()["docs_adaptive_quality"](spark, SF).collect()
    assert rows
    thr_by_source = {}
    for r in rows:
        assert r.quality_logit * 1_000_000 >= r.thr_micro - 1  # floor slack
        thr_by_source.setdefault(r.source, r.thr_micro)
        assert thr_by_source[r.source] == r.thr_micro
    assert len(set(thr_by_source.values())) >= 2, thr_by_source
    # ~25% culled overall (exact fraction depends on ties)
    total = 500
    assert 0.6 * total <= len(rows) <= 0.9 * total


def test_unpivot_round_trips_pivot_with_zero_cells(spark):
    """agg_unpivot = the plain (status, priority) counts DENSIFIED:
    every absent combination appears with an explicit zero."""
    out = {
        (r.o_orderstatus, r.o_orderpriority): r.n_orders
        for r in QUERIES["agg_unpivot"](spark, SF).collect()
    }
    import irclogbot_spark.queries as qmod

    o = qmod._t(spark, SF, "orders")
    sparse = {
        (r.o_orderstatus, r.o_orderpriority): r.n
        for r in o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    statuses = {k[0] for k in sparse}
    pris = {k[1] for k in sparse}
    assert len(out) == len(statuses) * len(pris)
    for k, v in out.items():
        assert v == sparse.get(k, 0), k
