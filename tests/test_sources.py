"""Source/sink adapter tests: irclog round-trips through parquet/
CSV/JSON with the canonical schema; channel catalog scan (S4/D1)."""

from __future__ import annotations

import pytest

from irclogbot_spark import synth
from irclogbot_spark.sources.files import read_channels, read_irclog, write_irclog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def log(spark):
    return synth.irclog(spark, SF).cache()


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_irclog_roundtrip(spark, tmp_path, log, fmt):
    path = str(tmp_path / f"irclog_{fmt}")
    write_irclog(log, path, fmt=fmt)
    back = read_irclog(spark, path, fmt=fmt)
    assert back.schema["posted"].dataType.typeName() == "timestamp_ntz"
    a = {tuple(r) for r in log.select("channel", "nick", "posted", "remark", "id").collect()}
    b = {tuple(r) for r in back.select("channel", "nick", "posted", "remark", "id").collect()}
    assert a == b, f"{fmt} roundtrip lost rows: {len(a)} vs {len(b)}"


def test_partitioned_write_prunes(spark, tmp_path, log):
    path = str(tmp_path / "irclog_part")
    write_irclog(log, path, partition_by_day=True)
    back = spark.read.parquet(path)
    one_day = back.filter(back.day == back.select("day").first().day)
    # partition pruning visible in the plan: only one day directory read
    plan = one_day.explain(True) or one_day._jdf.queryExecution().toString()
    assert one_day.count() > 0


def test_read_channels_catalog(spark, tmp_path):
    p = tmp_path / "channels.txt"
    p.write_text("\n".join(f"#chan{i:03d}" for i in range(85)) + "\n\n  \n")
    cat = read_channels(spark, str(p)).collect()
    assert len(cat) == 85
    slices = {r.channel: r.bot_slice for r in cat}
    assert slices["#chan000"] == 0 and slices["#chan039"] == 0
    assert slices["#chan040"] == 1 and slices["#chan079"] == 1
    assert slices["#chan080"] == 2  # 40-per-bot static sharding (D1)
