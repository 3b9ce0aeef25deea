"""Golden ingest tests — FIXTURES.md §A1/§A2, SURVEY.md §5 item 2.

The raw-line fixture covers every cited reference behavior: happy
path, ACTION rewrite, '~'-less user, >=17-char nick drop, PING
control path, server-notice no-match, blank lines, and duplicate
delivery. Golden blake2b ids precomputed from the reference
algorithm (utils.py:125-136).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irclogbot_spark import ingest

RAW_LINES = [
    ":edleafe!~ed@host1.example.com PRIVMSG #openstack-nova :hello world",
    ":edleafe!~ed@host1.example.com PRIVMSG #openstack-nova :ACTION waves",
    ":alice!al@h2 PRIVMSG #zuul :ship it",
    ":averyveryloongnick17!~x@h3 PRIVMSG #zuul :dropped",
    "PING :verne.freenode.net",
    ":verne.freenode.net NOTICE * :*** Looking up your hostname...",
    "",
    "   ",
    ":edleafe!~ed@host1.example.com PRIVMSG #openstack-nova :hello world",
]

GOLDEN_IDS = {
    ("#openstack-nova", "edleafe", "hello world"): "202b023e701b7cf8",
    ("#openstack-nova", "edleafe", "/me waves"): "a5449855169a91c7",
    ("#zuul", "alice", "ship it"): "6116eae537a0bfed",
}


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame([(l,) for l in RAW_LINES], "value string")


def test_parse_pipeline_survivors(spark, raw):
    out = ingest.parse_pipeline(raw, compat_id=True).collect()
    # 9 lines -> 4 survive (dup retained without dedup)
    assert len(out) == 4
    rows = {(r.channel, r.nick, r.remark) for r in out}
    assert rows == set(GOLDEN_IDS)


def test_golden_blake2b_ids(spark, raw):
    out = ingest.parse_pipeline(raw, compat_id=True).collect()
    for r in out:
        assert r.id == GOLDEN_IDS[(r.channel, r.nick, r.remark)], r


def test_action_rewrite(spark, raw):
    out = {r.remark for r in ingest.parse_pipeline(raw).collect()}
    assert "/me waves" in out
    assert not any(r.startswith("ACTION ") for r in out)


def test_dedup_collapses_duplicate_delivery(spark, raw):
    out = ingest.parse_pipeline(raw, deduplicate=True).collect()
    assert len(out) == 3
    assert len({r.id for r in out}) == 3


def test_nick_filter_boundary(spark):
    # exactly 16 chars passes, 17 drops (irclogbot.py:139-141)
    lines = [
        ":a234567890123456!~u@h PRIVMSG #c :sixteen ok",
        ":a2345678901234567!~u@h PRIVMSG #c :seventeen dropped",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    out = ingest.parse_pipeline(df).collect()
    assert [r.nick for r in out] == ["a234567890123456"]


def test_user_host_retained_and_tilde_optional(spark, raw):
    out = {r.nick: (r.user, r.host) for r in ingest.parse_pipeline(raw).collect()}
    assert out["edleafe"] == ("ed", "host1.example.com")
    assert out["alice"] == ("al", "h2")  # no '~' prefix also matches (irclogbot.py:24)


def test_id_excludes_posted(spark):
    # H2: same content at different times -> same id (logbot_roundrobin.py:50-54)
    df = spark.createDataFrame(
        [("x", ":a!~u@h PRIVMSG #c :m", "2024-01-01 00:00:00"), ("x", ":a!~u@h PRIVMSG #c :m", "2024-02-02 02:02:02")],
        "junk string, value string, evt string",
    ).withColumn("evt", F.to_timestamp("evt"))
    out = ingest.parse_pipeline(df, ts_col="evt").collect()
    assert len({r.id for r in out}) == 1
    assert len({r.posted for r in out}) == 2


def test_scale_id_matches_dedup_semantics(spark, raw):
    compat = ingest.parse_pipeline(raw, compat_id=True, deduplicate=True).count()
    native = ingest.parse_pipeline(raw, compat_id=False, deduplicate=True).count()
    assert compat == native == 3


def test_ctcp_delimited_action_not_rewritten_reference_parity(spark):
    # The reference strips only ' \n\r' (irclogbot.py:118) and tests
    # startswith('ACTION ') on the remark (:137): a wire-format CTCP
    # line with \x01 delimiters does NOT trigger the /me rewrite.
    # Faithful parity: we preserve that behavior bit-for-bit.
    df = spark.createDataFrame(
        [(":a!~u@h PRIVMSG #c :\x01ACTION waves\x01",)], "value string"
    )
    r = ingest.parse_pipeline(df).first()
    assert r.remark == "\x01ACTION waves\x01"


def test_midline_match_dropped_like_re_match(spark):
    # MSG_PAT is textually unanchored (irclogbot.py:24) but the
    # reference applies it via MSG_PAT.match() (irclogbot.py:131),
    # which anchors at position 0: a line with junk before the ':'
    # prefix returns None and is never recorded. Parity = drop.
    df = spark.createDataFrame(
        [
            ("junk prefix :alice!~a@h PRIVMSG #c :payload",),
            (":alice!~a@h PRIVMSG #c :kept",),
        ],
        "value string",
    )
    out = ingest.parse_pipeline(df).collect()
    assert [r.remark for r in out] == ["kept"]


def test_action_replace_all_occurrences(spark):
    # reference: remark.replace('ACTION ', '/me ') replaces EVERY
    # occurrence once the remark starts with 'ACTION '
    # (irclogbot.py:137-138); a mid-remark 'ACTION ' without the
    # prefix is untouched
    df = spark.createDataFrame(
        [
            (":a!~u@h PRIVMSG #c :ACTION waves ACTION again",),
            (":a!~u@h PRIVMSG #c :saw ACTION mid-line",),
        ],
        "value string",
    )
    out = {r.remark for r in ingest.parse_pipeline(df).collect()}
    assert out == {"/me waves /me again", "saw ACTION mid-line"}


def test_remark_with_unit_separator_survives(spark):
    df = spark.createDataFrame(
        [(":a!~u@h PRIVMSG #c :has \x1f inside",)], "value string"
    )
    r = ingest.parse_pipeline(df).first()
    assert r.remark == "has \x1f inside"


def test_invalid_utf8_dropped_cleanly(spark, tmp_path):
    # S2: reference mis-handles decode errors (irclogbot.py:112-119);
    # engine drops the undecodable line, keeps valid neighbors.
    p = tmp_path / "raw.log"
    p.write_bytes(
        b":a!~u@h PRIVMSG #c :good\n"
        b":evil!~e@h PRIVMSG #c :bad \xff\xfe bytes\n"
        b":b!~u@h PRIVMSG #c :also good\n"
    )
    out = ingest.parse_pipeline(spark.read.text(str(p))).collect()
    assert sorted(r.remark for r in out) == ["also good", "good"]


def test_posted_truncated_to_second(spark, raw):
    out = ingest.parse_pipeline(raw).select(
        (F.unix_micros(F.col("posted").cast("timestamp")) % 1_000_000).alias("us")
    ).distinct().collect()
    assert [r.us for r in out] == [0]
