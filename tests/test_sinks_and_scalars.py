"""K1 ES adapter shaping, H4/X2/F5 scalar surface, v1 compat id."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from irclogbot_spark.functions.hashing import blake2b_id_with_posted
from irclogbot_spark.functions.scalar import logit_line, record_uuid
from irclogbot_spark.ingest import contains_any
from irclogbot_spark.sinks.elastic import ES_INDEX, es_doc, es_write_conf


def test_es_write_conf_is_keyed_upsert():
    conf = es_write_conf("es.example.com:9200")
    assert conf["es.mapping.id"] == "id"  # H3: PUT by content hash
    assert conf["es.resource"] == ES_INDEX == "irclog"  # irclogbot.py:50
    assert conf["es.batch.write.retry.count"] == "5"  # MAX_RETRIES


def test_es_doc_shape_matches_reference(spark):
    df = spark.createDataFrame(
        [("#c", "nick", "2024-03-04 05:06:07", "msg", "abcd")],
        "channel string, nick string, posted string, remark string, id string",
    ).withColumn("posted", F.to_timestamp("posted"))
    row = es_doc(df).first()
    assert row.asDict() == {
        "channel": "#c",
        "nick": "nick",
        "posted": "2024-03-04T05:06:07",  # P5 ISO format, irclogbot.py:42
        "remark": "msg",
        "id": "abcd",
    }


def test_contains_any_predicate(spark):
    df = spark.createDataFrame(
        [("NickServ identify please",), ("regular chatter",), ("You are now identified",)],
        "value string",
    )
    got = [r.value for r in df.filter(contains_any("value", ["NickServ", "identified"])).collect()]
    assert got == ["NickServ identify please", "You are now identified"]


def test_record_uuid_shape(spark):
    rows = spark.range(100).select(record_uuid().alias("u")).collect()
    assert len({r.u for r in rows}) == 100
    assert all(len(r.u) == 36 and r.u[14] == "4" for r in rows)  # v4


def test_logit_line_format(spark):
    row = spark.range(1).select(logit_line(F.lit("RECORDING"), F.lit("x")).alias("l")).first()
    # 'YYYY-MM-DD HH:MM:SS RECORDING x'
    assert row.l.endswith(" RECORDING x")
    assert len(row.l.split(" ", 2)[0]) == 10


def test_v1_compat_id_includes_posted(spark):
    # v1 hashes {channel, nick, posted-iso, remark} (irclogbot.py:43-44)
    def ref_v1(channel, nick, posted_iso, remark):
        vals = sorted([channel, nick, posted_iso, remark])
        return hashlib.blake2b("".join(vals).encode(), digest_size=8).hexdigest()

    df = spark.createDataFrame(
        [("#c", "nick", "2024-03-04T05:06:07", "msg")],
        "channel string, nick string, posted string, remark string",
    )
    got = df.select(
        blake2b_id_with_posted("channel", "nick", "posted", "remark").alias("id")
    ).first()
    assert got.id == ref_v1("#c", "nick", "2024-03-04T05:06:07", "msg")
