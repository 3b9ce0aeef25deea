"""Ops-plane supervision: the reference's heartbeat files as a
StreamingQueryListener (SURVEY.md E3 / §2F D5).

The reference touches ALIVE_<n> marker files from the bot loop
(irclogbot.py:35-37) and two watchdog layers restart on staleness
(runbots.py:38-56, keep_alive.py:19-30). In Spark, liveness is query
progress: this listener touches a marker file per progress event, so
the same mtime-based watchdogs (or k8s liveness probes) work
unchanged against a streaming deployment. Restart safety itself
comes from checkpoint + idempotent keyed sink, not from this file.
"""

from __future__ import annotations

import os
import time

from pyspark.sql.streaming import StreamingQueryListener


class HeartbeatListener(StreamingQueryListener):
    """Touch <dir>/ALIVE_<query-name-or-id> on every progress event."""

    def __init__(self, heartbeat_dir: str):
        self.heartbeat_dir = heartbeat_dir
        os.makedirs(heartbeat_dir, exist_ok=True)

    def _touch(self, name: str) -> None:
        path = os.path.join(self.heartbeat_dir, f"ALIVE_{name}")
        with open(path, "a"):
            os.utime(path, (time.time(), time.time()))

    def onQueryStarted(self, event) -> None:
        self._touch(event.name or event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._touch(p.name or p.id)

    def onQueryIdle(self, event) -> None:
        self._touch(event.id)

    def onQueryTerminated(self, event) -> None:
        pass  # staleness is the signal; the watchdog decides


def heartbeat_age_seconds(heartbeat_dir: str, name: str) -> float | None:
    """Watchdog helper: age of a heartbeat marker (keep_alive.py:19-23
    semantics), None if it never beat."""
    path = os.path.join(heartbeat_dir, f"ALIVE_{name}")
    if not os.path.exists(path):
        return None
    return time.time() - os.path.getmtime(path)
