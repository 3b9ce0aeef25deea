"""Property tests (SURVEY.md §5 item 3): hash invariants and dedup
idempotence.

The pure hash algorithm is property-tested with hypothesis against an
independent transcription of the reference's gen_key; the pipeline-
level invariants run as seeded bulk checks over one DataFrame (one
Spark job per property, not per example).
"""

from __future__ import annotations

import hashlib
import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from irclogbot_spark import ingest


def _ref_gen_key(rec: dict) -> str:
    # independent transcription of /root/reference/utils.py:125-136
    vals = sorted("%s" % v for v in rec.values())
    return hashlib.blake2b("".join(vals).encode("utf-8"), digest_size=8).hexdigest()


text = st.text(min_size=0, max_size=40)


@given(channel=text, nick=text, remark=text)
@settings(max_examples=200, deadline=None)
def test_compat_hash_matches_reference_algorithm(channel, nick, remark):
    from irclogbot_spark.functions.hashing import _blake2b_hexdigest

    assert _blake2b_hexdigest([channel, nick, remark]) == _ref_gen_key(
        {"channel": channel, "nick": nick, "remark": remark}
    )


@given(channel=text, nick=text, remark=text)
@settings(max_examples=100, deadline=None)
def test_hash_is_value_transposition_insensitive(channel, nick, remark):
    # documented reference quirk (utils.py:133 sorts VALUES): swapping
    # nick and remark yields the same id
    from irclogbot_spark.functions.hashing import _blake2b_hexdigest

    a = _blake2b_hexdigest([channel, nick, remark])
    b = _blake2b_hexdigest([channel, remark, nick])
    assert a == b


def _random_lines(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    lines = []
    for i in range(n):
        nick = f"user{rng.randint(0, 30)}"
        chan = f"#chan{rng.randint(0, 5)}"
        msg = " ".join(rng.choice(["alpha", "beta", "gamma", "delta"]) for _ in range(rng.randint(1, 6)))
        lines.append(f":{nick}!~u@h{i % 9} PRIVMSG {chan} :{msg}")
    return lines


def test_pipeline_duplicate_injection_is_idempotent(spark):
    """pipeline(deduplicate) ∘ duplicate-injection ≡ pipeline(deduplicate)."""
    lines = _random_lines(500, seed=7)
    injected = lines + lines[::3] + lines[::7]  # re-deliveries
    a = ingest.parse_pipeline(
        spark.createDataFrame([(l,) for l in lines], "value string"), deduplicate=True
    )
    b = ingest.parse_pipeline(
        spark.createDataFrame([(l,) for l in injected], "value string"), deduplicate=True
    )
    sa = {(r.channel, r.nick, r.remark, r.id) for r in a.collect()}
    sb = {(r.channel, r.nick, r.remark, r.id) for r in b.collect()}
    assert sa == sb


def test_id_is_posted_invariant_in_bulk(spark):
    """same {channel,nick,remark} => same id regardless of event time."""
    lines = _random_lines(300, seed=11)
    df = spark.createDataFrame(
        [(l, i) for i, l in enumerate(lines)], "value string, off long"
    ).withColumn("evt", F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("off") * 987_654_321))
    out = ingest.parse_pipeline(df, ts_col="evt")
    per_content = (
        out.groupBy("channel", "nick", "remark")
        .agg(F.countDistinct("id").alias("ids"), F.countDistinct("posted").alias("times"))
        .collect()
    )
    assert all(r.ids == 1 for r in per_content)
    assert any(r.times > 1 for r in per_content)  # dupes landed at different times


def test_scale_and_compat_ids_induce_identical_partitions(spark):
    """the native sha2 id and the compat blake2b id collapse exactly the
    same duplicate groups (same equivalence relation on records)."""
    lines = _random_lines(400, seed=13)
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    compat = ingest.parse_pipeline(df, compat_id=True).select("channel", "nick", "remark", "id")
    native = ingest.parse_pipeline(df, compat_id=False).select("channel", "nick", "remark", "id")
    assert compat.select("id").distinct().count() == native.select("id").distinct().count()
    joined = compat.withColumnRenamed("id", "cid").join(
        native.withColumnRenamed("id", "nid"), ["channel", "nick", "remark"]
    )
    assert joined.groupBy("cid").agg(F.countDistinct("nid").alias("k")).filter(F.col("k") > 1).count() == 0
