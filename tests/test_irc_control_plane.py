"""Live IRC replay without external scaffolding: the control-plane
relay performs the reference's handshake against an in-process fake
IRC server (registration -> NickServ gate -> paced JOINs -> PONG
keepalives, irclogbot.py:83-105,160-191) while Spark's socket source
consumes the relayed lines through the full ingest chain."""

from __future__ import annotations

import socket
import threading
import time

import pytest

from irclogbot_spark.sources.irc import IRCControlPlane
from irclogbot_spark.streaming.pipeline import read_raw_lines_stream, streaming_irclog

DATA_LINES = [
    ":edleafe!~ed@h PRIVMSG #nova :hello world",
    ":alice!al@h2 PRIVMSG #zuul :ship it",
]


class _FakeIRCServer(threading.Thread):
    """Speaks just enough IRC: requires USER/NICK, prompts the
    NickServ identify, confirms after IDENTIFY, acks JOINs, sends one
    PING, then streams PRIVMSG traffic."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.sock.listen(1)
        self.received: list[str] = []
        self._stop = threading.Event()

    def _recv_until(self, conn, needle: str, timeout: float = 30) -> None:
        conn.settimeout(timeout)
        buf = b""
        while needle not in "\n".join(self.received):
            chunk = conn.recv(2048)
            if not chunk:
                return
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                self.received.append(line.decode("utf-8").strip())

    def run(self):
        conn, _ = self.sock.accept()
        try:
            self._recv_until(conn, "NICK logbot_t")
            conn.sendall(
                b":NickServ!s@services NOTICE logbot_t :This nickname is "
                b"registered... NickServ identify <password>\n"
            )
            self._recv_until(conn, "PRIVMSG NickServ :IDENTIFY hunter2")
            conn.sendall(
                b":NickServ!s@services NOTICE logbot_t :You are now identified\n"
            )
            self._recv_until(conn, "JOIN #zuul")
            conn.sendall(b"PING :fake.example.net\n")
            self._recv_until(conn, "PONG")
            payload = "".join(l + "\n" for l in DATA_LINES).encode()
            while not self._stop.is_set():
                conn.sendall(payload)
                time.sleep(0.25)
        except OSError:
            pass
        finally:
            conn.close()

    def stop(self):
        self._stop.set()


def test_irc_control_plane_end_to_end(spark, tmp_path):
    server = _FakeIRCServer()
    server.start()
    relay = IRCControlPlane(
        "127.0.0.1",
        server.port,
        "logbot_t",
        ["#nova", "#zuul"],
        password="hunter2",
        pause_between_joins=0.2,
    )
    relay.start()
    raw = read_raw_lines_stream(spark, host="127.0.0.1", port=relay.listen_port)
    log = streaming_irclog(raw, dedup_in_stream=False)
    q = (
        log.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("memory")
        .queryName("irc_relay_log")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT DISTINCT channel, nick, remark FROM irc_relay_log"
            ).collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
        server.stop()
        relay.stop()

    # data plane: both messages made it through relay -> socket source
    # -> full ingest chain; the PING the server sent was dropped in-plan
    got = {(r.channel, r.nick, r.remark) for r in rows}
    assert ("#nova", "edleafe", "hello world") in got
    assert ("#zuul", "alice", "ship it") in got

    # control plane: the server saw the reference handshake, in order
    seen = server.received
    idx = {}
    for want in [
        "USER logbot_t logbot_t logbot_t logbot_t",
        "NICK logbot_t",
        "PRIVMSG NickServ :IDENTIFY hunter2",
        "JOIN #nova",
        "JOIN #zuul",
        "PONG :pingis",
    ]:
        assert want in seen, f"server never received {want!r}: {seen}"
        idx[want] = seen.index(want)
    assert idx["USER logbot_t logbot_t logbot_t logbot_t"] < idx["NICK logbot_t"]
    assert idx["NICK logbot_t"] < idx["PRIVMSG NickServ :IDENTIFY hunter2"]
    assert idx["PRIVMSG NickServ :IDENTIFY hunter2"] < idx["JOIN #nova"]
    assert idx["JOIN #nova"] < idx["JOIN #zuul"]
