"""Behavioral event analytics: ordered funnels and cohort retention.

The reference's query surface stops at per-channel counts and top-k
(SURVEY.md §2H); these are the two event-sequence operators every
product-analytics engine layers on the same data (events = the
engine's generic timestamped stream). Both are expressed so the
expensive part is a single shuffle on the user key:

* ``funnel``: the ordered-stage conversion question — of the users
  who did step 1, how many LATER did step 2, then step 3... A user
  counts for stage i only if their earliest qualifying stage-i event
  is at-or-after their earliest qualifying stage-(i-1) event (the
  strict "in order" semantics; an out-of-order click does not count).
  Implemented as k chained window-mins over ONE user partitioning —
  the events shuffle once, every subsequent stage is a map-side
  window pass over the same partitioning, and the per-user reduction
  reuses it too (no second exchange).

* ``cohort_retention``: users are cohorted by the week of their
  first event; each later active week increments that cohort's
  (week_offset) cell. One partial-agg shuffle for first-seen, one
  distinct over (user, week), one co-partitioned join back on the
  user key, then a tiny (cohort, offset) aggregate; the retention
  denominator is a broadcast of the per-cohort sizes.

Cross-engine determinism: counts are integers, every rate is a
single division of exactly-agreed integers (CASE-guarded against
empty denominators), and week truncation uses the ISO Monday both
Spark (``trunc(_, 'week')``) and DuckDB (``date_trunc('week', _)``)
agree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_lag: str | None = None,
) -> DataFrame:
    """Ordered-funnel conversion counts.

    Returns one row per step: ``(step, step_name, n_reached,
    conv_from_prev, conv_from_first)`` where ``n_reached`` counts
    users whose steps 1..i all occurred in timestamp order,
    ``conv_from_prev`` divides by the previous stage (stage 1
    divides by the total user population — the entry rate), and
    ``conv_from_first`` divides by stage 1.

    ``max_lag`` (an SQL interval body, e.g. ``"1 HOUR"``) adds the
    standard product-analytics conversion window: a stage-i event
    qualifies only within ``[t_{i-1}, t_{i-1} + max_lag]``. The
    matching convention is GREEDY earliest-first — each stage's
    timestamp is the earliest qualifying event after the previous
    stage's (greedy) timestamp; a user whose conversion would only
    exist relative to a LATER stage-(i-1) event does not count. The
    convention is deterministic and exactly SQL-expressible (the
    oracle mirrors it clause-for-clause), unlike any-window
    maximization which requires per-user sequence scans.

    Scale shape: ONE shuffle (the user-key window partitioning);
    the k window-min passes and the per-user collapse all reuse it.
    Only (user, ts, type) ever moves — no payload columns.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    lag = F.expr(f"INTERVAL {max_lag}") if max_lag else None
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    stage_cols: list[str] = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if stage_cols:
            prev = F.col(stage_cols[-1])
            cond = cond & (F.col(ts_col) >= prev)
            if lag is not None:
                cond = cond & (F.col(ts_col) <= prev + lag)
        c = f"_t{i + 1}"
        df = df.withColumn(c, F.min(F.when(cond, F.col(ts_col))).over(w))
        stage_cols.append(c)
    # window values are constant per user: min() collapses without a
    # new exchange (same key as the window partitioning)
    users = df.groupBy(user_col).agg(
        *[F.min(c).alias(c) for c in stage_cols]
    )
    agg = users.agg(
        F.count(F.lit(1)).alias("_n_users"),
        *[F.count(c).alias(f"_n{i + 1}") for i, c in enumerate(stage_cols)],
    )

    def rate(num, den):
        return F.when(
            F.col(den) > 0, F.col(num).cast("double") / F.col(den)
        ).otherwise(F.lit(None).cast("double"))

    rows = []
    for i, step in enumerate(steps):
        prev = "_n_users" if i == 0 else f"_n{i}"
        rows.append(
            F.struct(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(step).alias("step_name"),
                F.col(f"_n{i + 1}").alias("n_reached"),
                rate(f"_n{i + 1}", prev).alias("conv_from_prev"),
                rate(f"_n{i + 1}", "_n1").alias("conv_from_first"),
            )
        )
    return agg.select(F.explode(F.array(*rows)).alias("_s")).select("_s.*")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix.

    Each user belongs to the cohort of the ISO week of their first
    event; a cohort's ``week_offset`` cell counts the distinct users
    active (any event) that many weeks later. Returns
    ``(cohort_week, week_offset, n_active, n_cohort, retention)``;
    offset 0 is the cohort week itself (retention 1.0 by
    construction).

    Scale shape: first-seen is a partial-aggregated shuffle on the
    user key; the activity side is a distinct over (user, week) —
    partial too; the join back is user-keyed (co-partitioned with
    first-seen); the final aggregate is cohort×offset-sized (weeks²,
    tiny) and the denominator table broadcasts.
    """
    day = F.to_date(F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(day).alias("_cohort_day"))
    cohorts = first.select(
        user_col, F.trunc("_cohort_day", "week").alias("cohort_week")
    )
    weeks = (
        events.select(user_col, F.trunc(day, "week").alias("_week"))
        .distinct()
    )
    active = (
        weeks.join(cohorts, user_col)
        .select(
            user_col,
            "cohort_week",
            (F.datediff("_week", "cohort_week") / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    cells = active.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort")).alias("retention"),
    )


def top_event_paths(
    events: DataFrame,
    steps: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-k most common event-type paths — the product-analytics
    "path analysis" view: every run of ``steps`` consecutive events in
    one user's timeline (ordered by timestamp, ``tiebreak_col``
    breaking ties deterministically) forms a path string
    ``"a > b > c"``; paths are counted corpus-wide and the k most
    frequent returned as ``(path, n_paths)``.

    Scale shape: ONE user-key shuffle serves all ``steps - 1``
    ``lead()`` passes (same window); the path count partial-aggregates
    map-side and the top-k is a TakeOrderedAndProject (no global
    sort). Only (user, ts, tiebreak, type) ever moves — a few tens of
    bytes per event regardless of payload width.

    NULL contract: a run containing ANY NULL event type is dropped
    (not silently shortened — ``concat_ws`` skips NULLs, which would
    emit a (steps-1)-step path the oracle's NULL-propagating ``||``
    never sees; ADVICE r5). Both engines filter every component.
    """
    if steps < 2:
        raise ValueError(f"steps must be >= 2, got {steps}")
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, steps)
    ]
    complete = parts[0].isNotNull()
    for p in parts[1:]:
        complete = complete & p.isNotNull()
    path = F.concat_ws(" > ", *parts)
    return (
        events.select(path.alias("path"), complete.alias("_complete"))
        .filter("_complete")
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "path")
        .limit(k)
    )


def anomaly_counts(
    events: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-type 3-sigma outlier counts in EXACT arithmetic: values go
    to centi-units via the decimal(12,2) cast (exact on 2-decimal
    data) and the sigma test is the square-compare form
    ``(n*x - S)^2 > 9*(n*Q - S^2)`` — no sqrt, no float mean, so the
    flag is bit-identical across engines and partitionings.

    Overflow headroom: every moment (x, S, Q) and both compared
    products are carried as ``decimal(38,0)`` (the oracle's HUGEINT
    twin — both exact to ~1e38), so the binding constraint is
    ``n * max|x_centi| < 1e18`` per type, i.e. ~1e13 events of a type
    at |value| <= 1e4 — versus BIGINT's ``n * max|x|^2 < 9.2e18``,
    which a few thousand 1e5-centi rows already break by silently
    wrapping ``n*Q``. Past even the decimal bound Spark raises
    DECIMAL_OVERFLOW instead of flagging garbage. Per-type stats
    partial-aggregate and broadcast back (types are bounded); the
    flag itself is in-row.
    """
    d38 = "decimal(38,0)"
    c = events.select(
        type_col,
        (F.col(value_col).cast("decimal(12,2)") * 100)
        .cast(d38)
        .alias("x"),
    )
    s = c.groupBy(type_col).agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("q"),
    )
    j = c.join(F.broadcast(s), type_col)
    dev = (F.col("n") * F.col("x")).cast(d38) - F.col("s")
    var9 = F.lit(9).cast(d38) * (
        (F.col("n") * F.col("q")).cast(d38)
        - (F.col("s") * F.col("s")).cast(d38)
    )
    return (
        j.select(type_col, ((dev * dev).cast(d38) > var9).alias("_out"))
        .groupBy(type_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("_out"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )


def robust_anomaly_days(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    k_mad: int = 3,
) -> DataFrame:
    """Per-type ROBUST (median/MAD) anomaly counts over daily event
    volumes — the companion to anomaly_counts for the case the
    baseline itself is contaminated: a 3-sigma test's mean and
    variance are dragged by the very spikes it hunts, while the
    median and the median-absolute-deviation have a 50% breakdown
    point (Hampel's rule). A day is anomalous iff
    ``|cnt - median| > k_mad * MAD``; with MAD = 0 (a majority of
    identical days) any deviation flags, the standard degenerate-MAD
    convention and exactly what the integer inequality yields.

    Exact arithmetic: daily counts, both medians, deviations, and
    the k*MAD compare are all BIGINT — medians are the LOWER median
    (the value at rank (n+1) DIV 2), selected by rank rather than
    interpolated, so no .5s and no floats anywhere.

    Scale shape: one (type, day) partial-agg shuffle reduces the
    corpus to at most types x days rows; the two rank windows (cnt
    median, then deviation median) run on THAT bounded frame — a
    window partition is one type's day count (<= days in the
    corpus), never raw events."""
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = events.groupBy(F.col(type_col), day).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    part = Window.partitionBy(type_col)
    w_cnt = part.orderBy("cnt", "day")
    d = (
        daily.withColumn("_n", F.count(F.lit(1)).over(part))
        .withColumn("_target", F.expr("(_n + 1) DIV 2"))
        .withColumn("_rn", F.row_number().over(w_cnt))
        .withColumn(
            "median_cnt",
            F.max(F.when(F.col("_rn") == F.col("_target"), F.col("cnt"))).over(
                part
            ),
        )
        .withColumn("_dev", F.abs(F.col("cnt") - F.col("median_cnt")))
    )
    w_dev = part.orderBy("_dev", "day")
    d = d.withColumn("_rn2", F.row_number().over(w_dev)).withColumn(
        "mad_cnt",
        F.max(F.when(F.col("_rn2") == F.col("_target"), F.col("_dev"))).over(
            part
        ),
    )
    return (
        d.groupBy(type_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.min("median_cnt").alias("median_cnt"),
            F.min("mad_cnt").alias("mad_cnt"),
            F.sum(
                F.when(F.col("_dev") > F.lit(int(k_mad)) * F.col("mad_cnt"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_anomalous_days"),
        )
    )


def theil_sen_trend(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Theil-Sen robust trend estimate of daily event volume per type
    — the median of all pairwise day-slopes, tolerant of ~29% outlier
    days where least-squares is dragged by a single spike (the
    regression-flavored sibling of robust_anomaly_days). Slopes are
    integer milli-units/day: ``(1000 * (c2 - c1)) DIV (d2 - d1)``
    (both engines truncate toward zero, verified), and the median is
    the rank-selected LOWER median — float-free end to end.

    Scale shape: the pairwise expansion is quadratic ONLY in days per
    type (a bounded calendar domain, never event rows): the raw
    corpus reduces via one (type, day) partial-agg shuffle, the
    self-join is co-partitioned on type over that tiny frame, and
    the rank window partitions by type over at most days^2/2 rows."""
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = events.groupBy(F.col(type_col), day).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    a = daily.select(
        F.col(type_col), F.col("day").alias("d1"), F.col("cnt").alias("c1")
    )
    b = daily.select(
        F.col(type_col), F.col("day").alias("d2"), F.col("cnt").alias("c2")
    )
    pairs = a.join(b, type_col).filter(F.col("d1") < F.col("d2")).select(
        type_col,
        "d1",
        "d2",
        F.expr("1000 * (c2 - c1) DIV datediff(d2, d1)").alias("slope_milli"),
    )
    part = Window.partitionBy(type_col)
    w = part.orderBy("slope_milli", "d1", "d2")
    med = (
        pairs.withColumn("_np", F.count(F.lit(1)).over(part))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "trend_slope_milli",
            F.max(
                F.when(F.col("_rn") == F.expr("(_np + 1) DIV 2"), F.col("slope_milli"))
            ).over(part),
        )
    )
    nd = daily.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    return (
        med.groupBy(type_col)
        .agg(
            F.max("_np").cast("long").alias("n_pairs"),
            F.min("trend_slope_milli").cast("long").alias("trend_slope_milli"),
        )
        .join(nd, type_col)
        .select(type_col, "n_days", "n_pairs", "trend_slope_milli")
    )
