"""Structured Streaming tests (SURVEY.md §5 item 4): the batch chain
under readStream, watermarked dedup, idempotent keyed sink, and the
E3 invariant — restart from checkpoint must not duplicate data."""

from __future__ import annotations

import pytest

from irclogbot_spark.streaming.pipeline import start_irclog_stream

LINES_A = [
    ":edleafe!~ed@h PRIVMSG #nova :hello world",
    ":alice!al@h2 PRIVMSG #zuul :ship it",
    ":alice!al@h2 PRIVMSG #zuul :ship it",  # duplicate delivery
    "PING :server.example.net",
    ":bob!~b@h PRIVMSG #nova :ACTION waves",
]
LINES_B = [
    ":alice!al@h2 PRIVMSG #zuul :ship it",  # re-delivery across batches
    ":carol!~c@h PRIVMSG #nova :new message",
]


def _write_lines(path, lines, name):
    path.mkdir(parents=True, exist_ok=True)
    (path / name).write_text("\n".join(lines) + "\n")


def test_streaming_ingest_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    _write_lines(src, LINES_A, "a.log")
    q = start_irclog_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {(r.channel, r.nick, r.remark) for r in out.collect()}
    assert rows == {
        ("#nova", "edleafe", "hello world"),
        ("#zuul", "alice", "ship it"),
        ("#nova", "bob", "/me waves"),
    }
    assert out.count() == out.select("id").distinct().count()


def test_restart_from_checkpoint_is_duplicate_safe(spark, tmp_path):
    """E3: supervision restarts must not duplicate (reference relies on
    content-keyed ES upsert; we rely on checkpoint + keyed sink)."""
    src = tmp_path / "src"
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_lines(src, LINES_A, "a.log")
    q = start_irclog_stream(spark, str(src), out_dir, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()

    # "restart": new file arrives (incl. a re-delivered old message),
    # stream resumes from the same checkpoint
    _write_lines(src, LINES_B, "b.log")
    q = start_irclog_stream(spark, str(src), out_dir, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == n1 + 1  # only carol is new
    assert out.count() == out.select("id").distinct().count()
    remarks = {r.remark for r in out.collect()}
    assert "new message" in remarks
