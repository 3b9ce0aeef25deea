"""Content-hash key generation (SURVEY.md §2D).

The reference computes a record id by stringifying every value of the
record dict, sorting the *values* lexicographically, concatenating,
and taking blake2b(digest_size=8) — 16 hex chars
(/root/reference/utils.py:125-136). The roundrobin variant excludes
the timestamp from the hash so that two workers seeing the same
message converge on one id (/root/reference/logbot_roundrobin.py:46-55)
— that exclusion IS the cross-worker dedup contract (H2).

Two implementations:

* ``blake2b_id`` — byte-exact compatibility id, arrow-batched pandas
  UDF (Python is unavoidable: blake2b is not a JVM builtin). Off the
  hot path unless compat mode is requested.
* ``scale_id`` — the engine's native id: sha2-256 over the same
  value-sorted content, entirely JVM-side builtins
  (array_sort + concat_ws + sha2) so it stays inside whole-stage
  codegen and is expressible in the DuckDB oracle
  (sha256(array_to_string(list_sort([...]), chr(31)))).

The value-sort makes both ids field-transposition-insensitive (a
documented reference quirk: nick='a', remark='b' collides with
nick='b', remark='a'); scale_id keeps that property deliberately so
its dedup semantics match compat mode 1:1.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

#: Unit separator used by scale_id between sorted values. The
#: reference concatenates with no separator, which conflates
#: ("ab","c") with ("a","bc"); the native id fixes that. blake2b_id
#: keeps the no-separator behavior for byte-exactness.
SCALE_ID_SEP = "\x1f"


def _blake2b_hexdigest(values: list[str]) -> str:
    vals = sorted(values)
    return hashlib.blake2b("".join(vals).encode("utf-8"), digest_size=8).hexdigest()


@pandas_udf(StringType())
def blake2b_id(channel: pd.Series, nick: pd.Series, remark: pd.Series) -> pd.Series:
    """Byte-exact reference id (v2 scope: time excluded, H2).

    Mirrors gen_key(/root/reference/utils.py:125-136) over the dict
    {channel, nick, remark} (/root/reference/logbot_roundrobin.py:50-54).
    """
    return pd.Series(
        [
            _blake2b_hexdigest(["%s" % c, "%s" % n, "%s" % r])
            for c, n, r in zip(channel, nick, remark)
        ]
    )


@pandas_udf(StringType())
def blake2b_id_with_posted(
    channel: pd.Series, nick: pd.Series, posted: pd.Series, remark: pd.Series
) -> pd.Series:
    """Byte-exact v1 id (time included; /root/reference/irclogbot.py:43-44).

    ``posted`` must already be the ISO string '%Y-%m-%dT%H:%M:%S'
    exactly as the reference formats it (irclogbot.py:42).
    """
    return pd.Series(
        [
            _blake2b_hexdigest(["%s" % c, "%s" % n, "%s" % p, "%s" % r])
            for c, n, p, r in zip(channel, nick, posted, remark)
        ]
    )


def scale_id(*cols: Column | str) -> Column:
    """Native 256-bit content id over value-sorted columns, JVM-only.

    sha2(concat_ws(US, array_sort(array(cols...))), 256) — identical
    dedup semantics to the compat id (value-sorted, content-only),
    64x larger key space than the reference's 64-bit digest, and it
    never leaves whole-stage codegen.
    """
    arr = F.array_sort(F.array(*[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]))
    return F.sha2(F.concat_ws(SCALE_ID_SEP, arr), 256)
