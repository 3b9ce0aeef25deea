"""operators/editdist.py + operators/snapshot.py unit tests: the
count-filter recall bound exercised with planted edits, and the
full-outer diff status decode."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from irclogbot_spark.operators.editdist import editdist_neardup, qgrams
from irclogbot_spark.operators.snapshot import corpus_diff


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("abcdefgh ") for _ in range(n))


def _mutate(rng: random.Random, s: str, n_edits: int) -> str:
    """n_edits random single-char substitutions / inserts / deletes."""
    out = list(s)
    for _ in range(n_edits):
        op = rng.choice("sid")
        i = rng.randrange(len(out))
        if op == "s":
            out[i] = rng.choice("xyz")
        elif op == "i":
            out.insert(i, rng.choice("xyz"))
        elif len(out) > 1:
            del out[i]
    return "".join(out)


def test_qgrams_short_text_single_clamped_gram(spark):
    df = spark.createDataFrame([("abc",)], "text string")
    [row] = df.select(qgrams("text", 8).alias("g")).collect()
    assert row.g == ["abc"]


def test_planted_pair_found_distance_exact(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("quick", "quack").replace("lazy", "hazy")  # few subs
    far = "completely unrelated content with nothing shared here " * 4
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    rows = editdist_neardup(docs, max_df=10, min_shared=5, max_dist=16).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    # repeated phrase: each of the 2+2 changed chars appears 5 times
    assert rows[0].dist == 20 - 16 or rows[0].dist <= 16


def test_recall_bound_randomized_edits(spark):
    """Every long-doc pair within max_dist MUST surface (the module
    docstring's exact bound): 8 independent base docs, each with a
    <=8-edit mutant; all 8 pairs found, no cross pairs."""
    rng = random.Random(61)
    rows = []
    for i in range(8):
        base = _rand_text(rng, 400)
        rows.append((2 * i, base))
        rows.append((2 * i + 1, _mutate(rng, base, rng.randint(1, 8))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = editdist_neardup(
        docs, q=8, max_df=50, min_shared=10, max_dist=16
    ).collect()
    found = {(r.id_a, r.id_b) for r in got}
    expect = {(2 * i, 2 * i + 1) for i in range(8)}
    assert expect <= found
    # levenshtein verify bounds any accidental cross pair too
    assert all(r.dist <= 16 for r in got)


def test_banded_levenshtein_matches_python(spark):
    """The 3-arg (banded) levenshtein returns the TRUE distance for
    kept pairs — differential vs a pure-Python DP."""

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = random.Random(7)
    base = _rand_text(rng, 300)
    near = _mutate(rng, base, 6)
    docs = spark.createDataFrame(
        [(0, base), (1, near)], "doc_id long, text string"
    )
    [row] = editdist_neardup(docs, max_df=10, min_shared=5, max_dist=16).collect()
    assert row.dist == lev(base, near)


def test_snapshot_diff_all_four_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "GAMMA rewritten"), (4, "delta")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_text_not_in_exchanges(spark):
    """Fingerprints are in-row: the outer join's exchanges carry only
    (id, fp) — text never shuffles."""
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.sha2(F.col("id").cast("string"), 256).alias("text")
    )
    df = corpus_diff(docs, docs)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    for line in plan.splitlines():
        if "Exchange" in line and "Arguments" in line:
            assert "text" not in line, line


def test_winsorize_partitioning_invariant(spark):
    """The milli-quantized winsorized sums are integer aggregates —
    bit-identical under any partitioning (the float-sum hazard the
    quantization exists to kill)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["docs_length_winsorize"]
    base = {tuple(r) for r in q(spark, "/root/testdata/sf0.001").collect()}
    import irclogbot_spark.queries as qmod

    d = qmod._t(spark, "/root/testdata/sf0.001", "documents").repartition(7)
    # re-run the same query body over a reshuffled input
    from pyspark.sql import functions as FF

    src = d.select("source", FF.length("text").cast("double").alias("len"))
    st = src.groupBy("source").agg(
        FF.percentile("len", 0.05).alias("p05"),
        FF.percentile("len", 0.95).alias("p95"),
    )
    clamped = FF.greatest(FF.col("p05"), FF.least(FF.col("p95"), FF.col("len")))
    got = {
        tuple(r)
        for r in src.join(FF.broadcast(st), "source")
        .groupBy("source")
        .agg(
            FF.count(FF.lit(1)).alias("n_docs"),
            FF.floor(FF.max("p05") * 1000).cast("bigint").alias("p05_milli"),
            FF.floor(FF.max("p95") * 1000).cast("bigint").alias("p95_milli"),
            FF.sum((FF.col("len") < FF.col("p05")).cast("bigint")).alias("n_below"),
            FF.sum((FF.col("len") > FF.col("p95")).cast("bigint")).alias("n_above"),
            FF.sum(FF.floor(clamped * 1000).cast("bigint")).alias(
                "sum_clamped_milli"
            ),
        )
        .collect()
    }
    assert got == base
