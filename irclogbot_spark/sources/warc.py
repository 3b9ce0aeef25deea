"""WARC (ISO 28500) source/sink — the crawl-native interchange format.

Web corpora ship as WARC shards (Common Crawl's layout: ~1 GiB
`.warc.gz` files of `response` records). This module reads them into
the engine's crawl schema and writes fixture shards, pure-stdlib:

* :func:`read_warc` — `binaryFile` scan → Arrow ``mapInPandas`` that
  walks each shard's records (version line, named headers, exact
  ``Content-Length`` body, CRLF CRLF framing) and emits one row per
  record: (record_id, warc_type, target_uri, warc_date, content_type,
  http_status, payload). For ``response`` records the HTTP envelope
  is split off: ``payload`` is the HTTP BODY (the bytes a text
  pipeline wants), ``http_status`` its status code.
* :func:`write_warc` — serialize (doc_id, url, text) rows as
  ``response`` records into one `.warc` (optionally gzip) shard per
  partition — the fixture/round-trip twin.

Scale shape: one WARC shard = one task (records inside a shard are
length-prefixed, so the format is NOT arbitrarily splittable without
an index — the same per-shard parallelism every WARC reader uses;
Common Crawl sizes shards ~1 GiB for exactly this reason). The
parser streams record-by-record over the shard bytes; per-record
work is header scan + one slice. gzip shards are inflated whole
(WARC gzip is conventionally per-record-member, which zlib handles
transparently when decompressing the concatenated stream).

Reference scope: the irclogbot reference ingests a line protocol
(SURVEY §2A S1); WARC is the corpus-scale analog of that source for
the north-star crawl pipeline (streaming/corpus.py crawl admission).
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("shard", StringType()),
        StructField("record_offset", LongType()),
    ]
)

_CRLF = b"\r\n"


def _parse_warc_bytes(
    raw: bytes, shard: str
) -> Iterator[tuple[str, str, str, str, str, int | None, bytes, str, int]]:
    """Yield one tuple per WARC record in a (decompressed) shard."""
    pos, n = 0, len(raw)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and raw[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        offset = pos
        eol = raw.find(_CRLF, pos)
        if eol < 0:
            raise ValueError(f"{shard}: truncated WARC version line at {pos}")
        version = raw[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"{shard}: expected WARC/x.y record header at {pos}, "
                f"got {version[:20]!r}"
            )
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = raw.find(_CRLF, pos)
            if eol < 0:
                raise ValueError(f"{shard}: truncated WARC headers at {pos}")
            line = raw[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line ends the header block
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"{shard}: bad Content-Length at {offset}") from exc
        block = raw[pos : pos + length]
        if len(block) != length:
            raise ValueError(f"{shard}: truncated record body at {offset}")
        pos += length

        wtype = headers.get("warc-type", "")
        status: int | None = None
        payload = block
        ctype = headers.get("content-type", "")
        if wtype == "response" and block[:5] in (b"HTTP/",):
            # split the HTTP envelope: status line + headers, then body
            sep = block.find(_CRLF + _CRLF)
            if sep >= 0:
                env, payload = block[:sep], block[sep + 4 :]
                first = env.split(_CRLF, 1)[0].decode("ascii", "replace")
                parts = first.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for hline in env.split(_CRLF)[1:]:
                    hk, _, hv = hline.partition(b":")
                    if hk.strip().lower() == b"content-type":
                        ctype = hv.strip().decode("utf-8", "replace")
        yield (
            headers.get("warc-record-id", ""),
            wtype,
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            ctype,
            status,
            payload,
            shard,
            offset,
        )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan `.warc` / `.warc.gz` shards under ``path`` into
    WARC_SCHEMA rows (one task per shard — see module docstring)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if p.endswith(".gz"):
                    raw = gzip.decompress(raw)
                rows.extend(_parse_warc_bytes(raw, os.path.basename(p)))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, WARC_SCHEMA)


def warc_documents(warc: DataFrame) -> DataFrame:
    """response records → the crawl-ingest shape (doc_id, url, text):
    doc_id = abs(xxhash64(record_id)) (stable, collision-negligible
    per shard-set), text = UTF-8 body."""
    resp = warc.filter(F.col("warc_type") == "response")
    return resp.select(
        F.abs(F.xxhash64("record_id")).alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("payload").cast("string").alias("text"),
    )


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    text_col: str = "text",
    date: str = "2024-01-01T00:00:00Z",
    compress: bool = False,
) -> None:
    """Serialize rows as WARC `response` records (one shard per
    partition) — the fixture/round-trip twin of :func:`read_warc`.
    ``date`` is a fixed literal so shards are deterministic."""
    os.makedirs(path, exist_ok=True)
    schema = "shard string, n_records long"

    ucol, tcol = url_col, text_col

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = io.BytesIO()
        n = 0
        for pdf in batches:
            for u, t in zip(pdf[ucol], pdf[tcol]):
                body = ("" if t is None else str(t)).encode("utf-8")
                http = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; "
                    b"charset=utf-8\r\nContent-Length: "
                    + str(len(body)).encode()
                    + b"\r\n\r\n"
                    + body
                )
                rid = f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, str(u))}>"
                hdr = (
                    b"WARC/1.0\r\n"
                    b"WARC-Type: response\r\n"
                    + f"WARC-Record-ID: {rid}\r\n".encode()
                    + f"WARC-Date: {date}\r\n".encode()
                    + f"WARC-Target-URI: {'' if u is None else u}\r\n".encode()
                    + b"Content-Type: application/http; msgtype=response\r\n"
                    + f"Content-Length: {len(http)}\r\n".encode()
                    + b"\r\n"
                )
                buf.write(hdr + http + _CRLF + _CRLF)
                n += 1
        if n:
            data = buf.getvalue()
            ext = "warc.gz" if compress else "warc"
            name = f"part-{uuid.uuid4().hex[:12]}.{ext}"
            if compress:
                data = gzip.compress(data)
            with open(os.path.join(path, name), "wb") as f:
                f.write(data)
            yield pd.DataFrame({"shard": [name], "n_records": [n]})
        else:
            yield pd.DataFrame({"shard": [], "n_records": []})

    df.select(url_col, text_col).mapInPandas(dump, schema).collect()
