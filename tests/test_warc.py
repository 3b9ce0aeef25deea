"""WARC source (sources/warc.py): record-walk framing, HTTP envelope
split, gzip shards, non-response records, corruption rejection, and
the write->read round trip feeding the crawl-ingest shape."""

from __future__ import annotations

import gzip

import pytest

from irclogbot_spark.sources import warc as W


def _record(wtype: str, uri: str, block: bytes, extra: str = "") -> bytes:
    hdr = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{wtype}-{uri}>\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n{extra}"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return hdr + block + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def test_parse_records_and_http_split():
    raw = (
        _record("warcinfo", "", b"software: test\r\n")
        + _record("response", "https://a.com/x", _http(b"<html>hi</html>"))
        + _record("response", "https://b.com/y", _http(b"raw body", 404, "text/plain"))
        + _record("request", "https://a.com/x", b"GET /x HTTP/1.1\r\n\r\n")
    )
    rows = list(W._parse_warc_bytes(raw, "s1"))
    assert [r[1] for r in rows] == ["warcinfo", "response", "response", "request"]
    resp = rows[1]
    assert resp[2] == "https://a.com/x"
    assert resp[4] == "text/html"  # HTTP header overrides WARC header
    assert resp[5] == 200
    assert resp[6] == b"<html>hi</html>"  # envelope stripped
    assert rows[2][5] == 404 and rows[2][6] == b"raw body"
    # non-response records keep their raw block and no status
    assert rows[3][5] is None and rows[3][6].startswith(b"GET /x")
    # offsets are the byte positions of each version line
    assert rows[0][8] == 0 and rows[1][8] > 0


def test_parse_rejects_corruption():
    good = _record("response", "https://a.com", _http(b"ok"))
    with pytest.raises(ValueError, match="version line|WARC/"):
        list(W._parse_warc_bytes(b"NOT A WARC\r\n\r\n", "s"))
    with pytest.raises(ValueError, match="truncated record body"):
        list(W._parse_warc_bytes(good[:-10], "s"))
    bad_len = good.replace(b"Content-Length: ", b"Content-Length: x", 1)
    with pytest.raises(ValueError, match="Content-Length"):
        list(W._parse_warc_bytes(bad_len, "s"))


def test_read_warc_gz_shard(spark, tmp_path):
    raw = _record("response", "https://a.com/x", _http("héllo".encode()))
    (tmp_path / "part-0.warc.gz").write_bytes(gzip.compress(raw))
    rows = W.read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.warc_type, r.target_uri, r.http_status) == (
        "response",
        "https://a.com/x",
        200,
    )
    assert bytes(r.payload).decode() == "héllo"
    assert r.shard == "part-0.warc.gz"


def test_write_read_round_trip_feeds_crawl_shape(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            ("https://a.com/1", "first document body"),
            ("https://b.com/2", "second, with unicode: héllo wörld"),
            ("https://c.com/3", ""),
        ],
        "url string, text string",
    )
    W.write_warc(docs, str(tmp_path / "out"), compress=True)
    back = W.warc_documents(W.read_warc(spark, str(tmp_path / "out")))
    got = {r.url: r.text for r in back.collect()}
    assert got == {
        "https://a.com/1": "first document body",
        "https://b.com/2": "second, with unicode: héllo wörld",
        "https://c.com/3": "",
    }
    # doc_ids are stable across reads
    ids1 = {r.doc_id for r in back.collect()}
    ids2 = {
        r.doc_id
        for r in W.warc_documents(
            W.read_warc(spark, str(tmp_path / "out"))
        ).collect()
    }
    assert ids1 == ids2 and len(ids1) == 3


def test_warc_feeds_crawl_ingest_end_to_end(spark, tmp_path):
    """The full crawl story: WARC shard -> warc_documents ->
    crawl_ingest_batch (canonicalize -> URL-dedup -> content-dedup)."""
    from irclogbot_spark.streaming import corpus as C

    docs = spark.createDataFrame(
        [
            # two spellings of ONE canonical URL (either may win the
            # min-doc_id keeper race — doc_ids are record-id hashes)
            ("https://A.com/x?utm_source=s", "distinct body alpha"),
            ("https://a.com/x#frag", "distinct body beta"),
            # two distinct URLs with IDENTICAL content -> exactly one
            # exact_dup_batch whichever id is smaller
            ("https://b.com/y", "the quick brown fox body"),
            ("https://c.com/z", "the quick brown fox body"),
        ],
        "url string, text string",
    )
    W.write_warc(docs, str(tmp_path / "shards"))
    batch = W.warc_documents(W.read_warc(spark, str(tmp_path / "shards")))
    C.crawl_ingest_batch(batch, 0, str(tmp_path / "corpus"))

    audit = spark.read.parquet(str(tmp_path / "corpus" / "audit")).collect()
    verdicts = sorted(r.verdict for r in audit)
    assert verdicts == ["exact_dup_batch", "new", "new", "url_duplicate"]
    # the url dup is the a.com pair; the content dup the b/c pair
    url_dup = next(r for r in audit if r.verdict == "url_duplicate")
    assert url_dup.canon_url == "https://a.com/x"
    content_dup = next(r for r in audit if r.verdict == "exact_dup_batch")
    assert content_dup.canon_url in ("https://b.com/y", "https://c.com/z")


def test_duplicate_and_null_urls_get_distinct_record_ids(spark, tmp_path):
    """ADVICE r8: record ids were uuid5(url) — two rows with the same
    (or null) url collided, colliding doc_ids downstream. Now keyed
    by (shard, offset, url): unique per record."""
    docs = spark.createDataFrame(
        [
            ("https://dup.com/x", "body one"),
            ("https://dup.com/x", "body two"),
            (None, "null url a"),
            (None, "null url b"),
        ],
        "url string, text string",
    ).coalesce(1)
    W.write_warc(docs, str(tmp_path / "out"), compress=True)
    back = W.read_warc(spark, str(tmp_path / "out")).collect()
    assert len(back) == 4
    assert len({r.record_id for r in back}) == 4
    ids = {r.doc_id for r in W.warc_documents(
        W.read_warc(spark, str(tmp_path / "out"))).collect()}
    assert len(ids) == 4


def test_streaming_parse_chunks_bound_memory(spark, tmp_path, monkeypatch):
    """The record walk yields bounded Arrow chunks instead of one
    shard-sized frame: with _CHUNK_ROWS forced to 3, a 10-record
    shard must still produce all 10 rows (across >= 4 chunks)."""
    monkeypatch.setattr(W, "_CHUNK_ROWS", 3)
    raw = b"".join(
        _record("response", f"https://s.com/{i}", _http(f"body {i}".encode()))
        for i in range(10)
    )
    (tmp_path / "big.warc.gz").write_bytes(gzip.compress(raw))
    rows = W.read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 10
    assert sorted(bytes(r.payload).decode() for r in rows) == sorted(
        f"body {i}" for i in range(10)
    )


def test_warc_streaming_crawl_ingest_two_batches(spark, tmp_path):
    """VERDICT r8 next #6: the full Common-Crawl-shaped pipeline as
    ONE streaming query — WARC shards -> record walk -> HTTP split ->
    canonicalize -> URL-dedup -> content-dedup -> admit. Shard
    arrival is the trigger: two availableNow runs against one
    checkpoint consume exactly the newly-landed shard each time."""
    from irclogbot_spark.streaming.corpus import warc_crawl_ingest

    warc_dir = tmp_path / "warc_in"
    warc_dir.mkdir()

    def run(rows):
        docs = spark.createDataFrame(rows, "url string, text string").coalesce(1)
        W.write_warc(docs, str(warc_dir), compress=True)
        q = warc_crawl_ingest(
            spark, str(warc_dir), str(tmp_path / "corpus"), str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

    run(
        [
            ("https://a.com/x", "alpha body one two three"),
            ("https://b.com/y", "bravo body four five six"),
        ]
    )
    run(
        [
            # tracking-param refetch of a batch-0 URL: settled at the
            # URL layer, content never hashed
            ("https://A.com/x?utm_source=s", "refetched alpha variant"),
            # new URL, byte-identical to batch-0 content: exact dup
            ("https://c.com/z", "alpha body one two three"),
            ("https://d.com/w", "fresh delta body seven"),
        ]
    )
    audit = spark.read.parquet(str(tmp_path / "corpus" / "audit"))
    b0 = {r.canon_url: r.verdict for r in audit.filter("batch_id = 0").collect()}
    b1 = {r.canon_url: r.verdict for r in audit.filter("batch_id = 1").collect()}
    assert b0 == {"https://a.com/x": "new", "https://b.com/y": "new"}
    assert b1 == {
        "https://a.com/x": "url_duplicate",
        "https://c.com/z": "exact_dup_history",
        "https://d.com/w": "new",
    }
    hist = spark.read.parquet(str(tmp_path / "corpus" / "history"))
    assert sorted(r.url for r in hist.collect()) == [
        "https://a.com/x",
        "https://b.com/y",
        "https://d.com/w",
    ]
