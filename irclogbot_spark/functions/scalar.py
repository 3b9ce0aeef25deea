"""Scalar / formatting functions (SURVEY.md §2G).

human_fmt replicates /root/reference/utils.py:106-122 as a pure
column expression (CASE over power-of-1024 thresholds + format_number,
which rounds HALF_EVEN like Python's '{:.Nf}'): no UDF, fully
codegen'd, and SQL-expressible for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (unit, decimals) per 1024-exponent — /root/reference/utils.py:111-112.
HUMAN_FMT_UNITS = [("bytes", 0), ("K", 0), ("MB", 1), ("GB", 2), ("TB", 2), ("PB", 2)]


def human_fmt(num: Column | str) -> Column:
    """Human-friendly size string, byte-compatible with the reference.

    Thresholds are explicit integer comparisons rather than
    int(log(num, 1024)) so the result is deterministic across
    engines/libms; for integer inputs the two formulations agree.
    Reference returns None for num < 0 (falls through all branches,
    /root/reference/utils.py:113-122) — preserved as NULL.
    """
    n = F.col(num) if isinstance(num, str) else num
    n = n.cast("long")
    expr = F.when(n == 0, F.lit("0 bytes")).when(n == 1, F.lit("1 byte"))
    for exponent, (unit, decimals) in enumerate(HUMAN_FMT_UNITS):
        lower = 1024**exponent
        upper = 1024 ** (exponent + 1)
        quotient = n.cast("double") / F.lit(float(lower))
        # format_number rounds HALF_EVEN like Python '{:.Nf}' but adds
        # grouping separators (e.g. '1,024 K' at the 1023.9-rounds-up
        # edge) — strip them to match the reference byte-for-byte.
        formatted = F.concat(
            F.regexp_replace(F.format_number(quotient, decimals), ",", ""),
            F.lit(" " + unit),
        )
        if exponent == 0:
            cond = (n > 1) & (n < upper)
        elif exponent < len(HUMAN_FMT_UNITS) - 1:
            cond = (n >= lower) & (n < upper)
        else:
            cond = n >= F.lit(lower)  # PB is the min() exponent cap, utils.py:114
        expr = expr.when(cond, formatted)
    return expr.otherwise(F.lit(None).cast("string"))


def record_uuid() -> Column:
    """H4: random v4 UUID (utils.py:64-65 — unused by the bots but
    part of the utility surface). Non-deterministic by nature: never
    in an oracle-checked query."""
    return F.uuid()


def logit_line(*cols: Column | str) -> Column:
    """X2: the reference's log-line format — UTC second-truncated
    timestamp prefix + space-joined parts (utils.py:35-41)."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    ts = F.date_format(F.date_trunc("second", F.current_timestamp()), "yyyy-MM-dd HH:mm:ss")
    return F.concat_ws(" ", ts, *parts)


def iso_posted(posted: Column | str) -> Column:
    """Sink-boundary timestamp format '%Y-%m-%dT%H:%M:%S'
    (/root/reference/irclogbot.py:42). Stored data stays TimestampType;
    this is display/sink formatting only (SURVEY.md §1.1 P5)."""
    c = F.col(posted) if isinstance(posted, str) else posted
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
