"""Deterministic raw-IRC-line derivation from the events corpus.

The driver's correctness harness (repo:__spark_entry__.py) checks
queries against a DuckDB oracle over the parquet corpus — which has
no raw IRC lines. This module derives them *deterministically* from
``events`` (FIXTURES.md §B maps events onto the irclog shape), with
noise rows injected by event_id residue so every ingest operator
(F1-F4, P1-P3) is exercised at scale and the whole derivation is
expressible 1:1 in ANSI SQL (irclogbot_spark.oracles.RAW_LINES_CTE
is the oracle twin — keep them in lockstep).

Mapping: user_id -> nick 'u<id>' (and user/host parts),
event_type -> channel '#<type>', props -> remark, ts -> event time.
Noise (by event_id % 97): 13 -> PING keepalive, 27 -> server NOTICE,
41 -> blank line, 55 -> >=17-char nick; event_id % 11 == 0 gets an
'ACTION ' remark prefix to exercise the /me rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from irclogbot_spark.ingest import parse_pipeline
from irclogbot_spark.plans.partitioning import ensure_parallelism
from irclogbot_spark.sources.tables import load_table

NOISE_PING = "PING :irc.example.net"
NOISE_NOTICE = ":irc.example.net NOTICE * :*** Looking up your hostname..."
NOISE_BLANK = "   "
NOISE_LONGNICK = ":verylongnick12345678!~x@h3.example.com PRIVMSG #noise :dropped"


def synthesize_irc_lines(events: DataFrame) -> DataFrame:
    """events -> (ts, value) raw-line frame. Pure column expressions —
    stays in whole-stage codegen at any scale."""
    uid = F.col("user_id").cast("string")
    remark = F.when(
        F.col("event_id") % 11 == 0, F.concat(F.lit("ACTION "), F.col("props"))
    ).otherwise(F.col("props"))
    privmsg = F.concat(
        F.lit(":u"), uid,
        F.lit("!~u"), uid,
        F.lit("@h"), (F.col("user_id") % 7).cast("string"),
        F.lit(".example.com PRIVMSG #"), F.col("event_type"),
        F.lit(" :"), remark,
    )
    m = F.col("event_id") % 97
    value = (
        F.when(m == 13, F.lit(NOISE_PING))
        .when(m == 27, F.lit(NOISE_NOTICE))
        .when(m == 41, F.lit(NOISE_BLANK))
        .when(m == 55, F.lit(NOISE_LONGNICK))
        .otherwise(privmsg)
    )
    return events.select(F.col("ts"), value.alias("value"))


def raw_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the corpus ships as one small parquet file = one scan partition;
    # regex parse + sha is CPU-bound, so spread it (no-op when the
    # input is already well-split)
    return synthesize_irc_lines(ensure_parallelism(load_table(spark, sf_dir, "events")))


#: opt-in cache of materialized irclog frames keyed by (sf_dir,
#: compat_id) — bench.py uses it so per-operator timings measure the
#: operator, not a repeated synth+parse+hash of the same corpus.
#: Never populated implicitly: every query stays self-contained for
#: the driver's oracle comparison unless the caller opts in.
_IRCLOG_CACHE: dict[tuple[str, bool], DataFrame] = {}


def irclog(spark: SparkSession, sf_dir: str, compat_id: bool = False) -> DataFrame:
    """The canonical irclog table at a scale factor: synthesized raw
    lines through the full ingest chain, event time from events.ts."""
    cached = _IRCLOG_CACHE.get((sf_dir.rstrip("/"), compat_id))
    if cached is not None:
        return cached
    return parse_pipeline(raw_lines(spark, sf_dir), ts_col="ts", compat_id=compat_id)


#: memo of the lazy-checkpointed frame built by irclog_materialized,
#: keyed by (applicationId, sf_dir, compat_id) — ADVICE r8: without
#: it, each of the five queries sharing the materialized log built
#: its OWN checkpoint barrier on a cold session, materializing five
#: full parsed-log copies into block storage (reclaimed only by
#: ContextCleaner GC). The applicationId in the key drops frames
#: whose SparkContext has been restarted (their checkpoint RDDs are
#: unusable in the new context).
_MATERIALIZED_CACHE: dict[tuple[str, str, bool], DataFrame] = {}


def irclog_materialized(
    spark: SparkSession, sf_dir: str, compat_id: bool = False
) -> DataFrame:
    """irclog() behind a lazy materialization barrier — the plan a
    STORED log gives you: queries that branch the log (union arms,
    key-agg + probe) or filter on parse-derived columns evaluate the
    synth+parse+hash chain ONCE instead of once per branch / once per
    pushed-down predicate re-derivation (round 8: log_term_time_filter
    7.1->1.8s, log_point_lookup 8.6->2.2s at sf0.1 — Catalyst was
    re-running the PRIVMSG regex chain per consumer). When the bench's
    session cache is active the pinned frame already IS materialized,
    so no extra barrier is added. The checkpointed frame is memoized
    per (application, sf_dir, compat_id) so consumers in one session
    share ONE materialized copy."""
    key = (sf_dir.rstrip("/"), compat_id)
    cached = _IRCLOG_CACHE.get(key)
    if cached is not None:
        return cached
    mkey = (spark.sparkContext.applicationId, *key)
    memo = _MATERIALIZED_CACHE.get(mkey)
    if memo is None:
        memo = irclog(spark, sf_dir, compat_id).localCheckpoint(eager=False)
        _MATERIALIZED_CACHE[mkey] = memo
    return memo


def cache_irclog(spark: SparkSession, sf_dir: str, compat_id: bool = False) -> DataFrame:
    """Materialize and pin the irclog for a scale factor; subsequent
    irclog() calls reuse it until uncache_irclog()."""
    key = (sf_dir.rstrip("/"), compat_id)
    if key not in _IRCLOG_CACHE:
        df = parse_pipeline(raw_lines(spark, sf_dir), ts_col="ts", compat_id=compat_id)
        df = df.persist()
        df.count()
        _IRCLOG_CACHE[key] = df
    return _IRCLOG_CACHE[key]


def uncache_irclog() -> None:
    for df in _IRCLOG_CACHE.values():
        df.unpersist()
    _IRCLOG_CACHE.clear()
