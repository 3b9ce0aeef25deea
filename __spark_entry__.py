"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine implementation lives in irclogbot_spark/; this module is the
thin adapter. Queries without an oracle entry (compat blake2b ids,
streaming, MinHash internals) get the driver's weaker rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full ingest chain
    (parse -> filters -> normalize -> hash -> dedup) feeding the
    msgs-per-channel-per-day aggregation; driver checks rows>0."""
    from pyspark.sql import functions as F

    from irclogbot_spark import synth
    from irclogbot_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    log = synth.irclog(spark, "/root/testdata/sf0.001").dropDuplicates(
        ["channel", "nick", "remark"]
    )
    return log.groupBy("channel", F.to_date("posted").alias("day")).agg(
        F.count(F.lit(1)).alias("n_msgs")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from irclogbot_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from irclogbot_spark.oracles import oracle_sql as _oracles

    return _oracles()
