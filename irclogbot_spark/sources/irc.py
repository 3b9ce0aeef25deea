"""IRC control-plane relay — the write side of the reference's socket
protocol, in front of Spark's socket source (SURVEY.md §2A S1, E1;
VERDICT r1 missing #2).

Spark's socket source is read-only, but a live IRC connection needs a
control plane: registration (USER/NICK, irclogbot.py:86-94), the
NickServ IDENTIFY handshake gated on server prompts (wait_for,
irclogbot.py:95-101,145-157), paced channel JOINs
(irclogbot.py:160-185), and PONG keepalive replies
(irclogbot.py:188-191). The relay owns the IRC socket, performs all
of that, and forwards EVERY received line unmodified to a local
listen socket that ``spark.readStream.format("socket")`` connects to
— so a live replay works without external scaffolding while the
data-plane semantics (PING drop, parse, filters) stay where they
belong: in the Spark plan.

Like the reference's wait_for, lines that arrive while a handshake
gate is open are still forwarded (processed), never swallowed.
"""

from __future__ import annotations

import socket
import threading
import time

#: sentinel: the IRC connection closed
_CLOSED = object()


class IRCControlPlane(threading.Thread):
    """Connect to an IRC server, register, gate on NickServ, join
    channels paced, answer PINGs — and relay all received lines to a
    local port for the Spark socket source.

    Usage::

        relay = IRCControlPlane("irc.example.net", 6667, "logbot_a",
                                ["#chan1", "#chan2"], password="...")
        relay.start()
        raw = read_raw_lines_stream(spark, host="127.0.0.1",
                                    port=relay.listen_port)
    """

    def __init__(
        self,
        server: str,
        port: int,
        nick: str,
        channels: list[str],
        password: str | None = None,
        pause_between_joins: float = 3.0,  # PAUSE_BETWEEN_JOINS, irclogbot.py:28
        listen_host: str = "127.0.0.1",
        listen_port: int = 0,
    ) -> None:
        super().__init__(daemon=True)
        self.server, self.port = server, port
        self.nick, self.channels, self.password = nick, channels, password
        self.pause_between_joins = pause_between_joins
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((listen_host, listen_port))
        self._listener.listen(1)
        #: the port Spark's socket source should connect to
        self.listen_port: int = self._listener.getsockname()[1]
        self._stop = threading.Event()
        self._irc: socket.socket | None = None
        self._out: socket.socket | None = None
        self._buf = b""

    # ------------------------------------------------------------- plumbing
    def _send(self, line: str) -> None:
        assert self._irc is not None
        self._irc.sendall((line + "\n").encode("utf-8"))

    def _forward(self, line: str) -> None:
        if self._out is not None:
            try:
                self._out.sendall((line + "\n").encode("utf-8"))
            except OSError:
                self._out = None  # Spark side went away; keep control alive

    def _handle(self, line: str) -> None:
        """Per-line control handling + unconditional forward. PONG is
        the reference's ping() (irclogbot.py:188-191); the data plane
        still sees the PING line and drops it in-plan (F2)."""
        if "PING :" in line:
            self._send("PONG :pingis")
        self._forward(line)

    def _next_line(self, timeout: float):
        """Next received line (reference framing: newline-split,
        stripped of ' \\n\\r', irclogbot.py:111-118), ``None`` on
        timeout, ``_CLOSED`` when the connection is gone. Undecodable
        lines are dropped cleanly (engine S2 semantics)."""
        assert self._irc is not None
        while not self._stop.is_set():
            if b"\n" in self._buf:
                raw, self._buf = self._buf.split(b"\n", 1)
                try:
                    return raw.decode("utf-8").strip(" \n\r")
                except UnicodeDecodeError:
                    continue
            self._irc.settimeout(timeout)
            try:
                chunk = self._irc.recv(2048)
            except TimeoutError:
                return None
            except OSError:
                return _CLOSED
            if not chunk:
                return _CLOSED
            self._buf += chunk
        return _CLOSED

    # -------------------------------------------------------------- control
    def _wait_for(self, needles: list[str]) -> None:
        """wait_for (irclogbot.py:145-157): block until a line contains
        any needle; everything seen meanwhile is still handled."""
        while not self._stop.is_set():
            line = self._next_line(timeout=60)
            if line is _CLOSED:
                return
            if line is None:
                continue
            if any(n in line for n in needles):
                self._forward(line)
                return
            self._handle(line)

    def _pump(self, seconds: float) -> None:
        """pause() (irclogbot.py:160-176): keep handling traffic for a
        fixed interval — the reference's flood-control between JOINs."""
        end = time.monotonic() + seconds
        while not self._stop.is_set() and time.monotonic() < end:
            line = self._next_line(timeout=0.2)
            if line is _CLOSED:
                return
            if line is not None:
                self._handle(line)

    # ----------------------------------------------------------------- main
    def run(self) -> None:
        # Spark connects to our listen port first (its socket source
        # is a client); accept before touching the IRC side so no line
        # is dropped between handshake and stream start.
        self._listener.settimeout(60)
        try:
            self._out, _ = self._listener.accept()
        except OSError:
            return
        try:
            self._irc = socket.create_connection((self.server, self.port), timeout=60)
        except OSError:
            return
        # registration form + nick claim (irclogbot.py:86-94)
        self._send(f"USER {self.nick} {self.nick} {self.nick} {self.nick}")
        self._send(f"NICK {self.nick}")
        if self.password is not None:
            # NickServ gate (irclogbot.py:95-101)
            self._wait_for(["NickServ identify"])
            self._send(f"PRIVMSG NickServ :IDENTIFY {self.password}")
            self._wait_for(["You are now identified"])
        # paced JOINs (irclogbot.py:177-185)
        for chan in self.channels:
            if self._stop.is_set():
                break
            self._send(f"JOIN {chan}")
            self._pump(self.pause_between_joins)
        # steady state: forward + PONG until stopped
        while not self._stop.is_set():
            line = self._next_line(timeout=60)
            if line is _CLOSED:
                break
            if line is not None:
                self._handle(line)

    def stop(self) -> None:
        self._stop.set()
        for s in (self._irc, self._out, self._listener):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass
