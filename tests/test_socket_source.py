"""S1 live path: the socket streaming source against an in-process
TCP server emitting raw IRC lines (the reference's actual transport,
irclogbot.py:83-85,111-119)."""

from __future__ import annotations

import socket
import threading
import time

import pytest

from irclogbot_spark.streaming.pipeline import read_raw_lines_stream, streaming_irclog

LINES = [
    ":edleafe!~ed@h PRIVMSG #nova :hello world",
    "PING :server.example.net",
    ":alice!al@h2 PRIVMSG #zuul :ship it",
]


class _LineServer(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.sock.listen(1)

    def run(self):
        conn, _ = self.sock.accept()
        try:
            payload = "".join(l + "\n" for l in LINES)
            # keep feeding so the source has data on every poll until
            # the query is stopped
            for _ in range(120):
                conn.sendall(payload.encode())
                time.sleep(0.25)
        except OSError:
            pass
        finally:
            conn.close()


def test_socket_source_end_to_end(spark, tmp_path):
    server = _LineServer()
    server.start()
    raw = read_raw_lines_stream(spark, host="127.0.0.1", port=server.port)
    log = streaming_irclog(raw, dedup_in_stream=False)
    q = (
        log.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("memory")
        .queryName("socket_irclog")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT DISTINCT channel, nick, remark FROM socket_irclog"
            ).collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = {(r.channel, r.nick, r.remark) for r in rows}
    assert ("#nova", "edleafe", "hello world") in got
    assert ("#zuul", "alice", "ship it") in got  # PING never recorded
