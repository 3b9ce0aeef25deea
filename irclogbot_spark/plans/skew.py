"""Skew mitigation: salted joins for hot keys.

First line of defense is AQE (enabled by the engine's confs): it
splits skewed shuffle partitions for sort-merge joins, and map-side
partial aggregation already absorbs hot keys in groupBys. Salting
covers the remaining case — a join whose build side is too large to
broadcast while one probe-side key dominates: the hot key's rows
land in one task regardless of partition splitting, because they are
ONE key. Salting widens that key into `salt_buckets` synthetic keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join on `on` with the key salted `salt_buckets` ways.

    left (the skewed/probe side) gets a per-row salt; right (the
    build side) is replicated once per salt value — cost
    |right| x salt_buckets, the price of splitting the hot key's rows
    across salt_buckets tasks. Semantically identical to
    left.join(right, on, how) for inner/left joins.

    The salt is ``pmod(xxhash64(salt_on...), salt_buckets)`` — a pure
    function of row content, so task retries and repartitions
    re-derive the SAME salt (F.rand is only per-plan deterministic:
    a retried/repartitioned task would re-roll, sending a row to a
    different build replica mid-job). ``salt_on`` defaults to every
    left column; pass distinct-valued columns explicitly when left
    rows can be full duplicates (identical rows share a salt and
    would keep the skew).
    """
    salt_cols = salt_on if salt_on is not None else left.columns
    salted_left = left.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    salted_right = right.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return salted_left.join(salted_right, [on, SALT_COL], how).drop(SALT_COL)
