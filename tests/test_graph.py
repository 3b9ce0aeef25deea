"""Integer-quantized PageRank (operators/graph.py)."""

from __future__ import annotations

import pytest

from irclogbot_spark.operators.graph import R0, pagerank


def _ranks(df):
    return {r["node"]: r["rank_units"] for r in df.collect()}


def test_single_edge_hand_computed(spark):
    # a -> b, one round: deg(a)=1; contrib(b) = (850*R0*1)//1000 = 850_000
    # a gets no in-flow -> BASE only; b (dangling) contributes nothing.
    e = spark.createDataFrame([("a", "b", 1)], ["src", "dst", "w"])
    got = _ranks(pagerank(e, n_iter=1))
    assert got == {"a": 150_000, "b": 150_000 + 850_000}


def test_symmetric_pair_is_fixed_point(spark):
    # a <-> b with equal weights: r stays R0 every round
    e = spark.createDataFrame(
        [("a", "b", 3), ("b", "a", 3)], ["src", "dst", "w"]
    )
    got = _ranks(pagerank(e, n_iter=4))
    assert got == {"a": R0, "b": R0}


def test_hub_outranks_leaves(spark):
    # star: every leaf points at the hub
    edges = [(f"l{i}", "hub", 1) for i in range(5)] + [
        ("hub", f"l{i}", 1) for i in range(5)
    ]
    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = _ranks(pagerank(e, n_iter=4))
    assert all(got["hub"] > got[f"l{i}"] for i in range(5))


def test_partitioning_invariance(spark):
    # integer arithmetic => bit-identical under any partitioning
    rows = [(f"n{i}", f"n{(i * 7 + 1) % 20}", 1 + i % 3) for i in range(60)]
    e = spark.createDataFrame(rows, ["src", "dst", "w"])
    a = _ranks(pagerank(e.repartition(1), n_iter=3))
    b = _ranks(pagerank(e.repartition(16, "dst"), n_iter=3))
    assert a == b


def test_damping_validation(spark):
    with pytest.raises(ValueError):
        pagerank(None, damping_milli=1000)


def test_n_iter_zero_returns_initial_ranks(spark):
    # ADVICE r13: the contribution-space rewrite crashed on n_iter=0;
    # the contract is the pre-rewrite one — every endpoint at R0
    e = spark.createDataFrame([("a", "b", 1), ("b", "c", 2)], ["src", "dst", "w"])
    assert _ranks(pagerank(e, n_iter=0)) == {"a": R0, "b": R0, "c": R0}
    # and the broadcast path agrees
    assert _ranks(pagerank(e, n_iter=0, broadcast_ranks=True)) == {
        "a": R0, "b": R0, "c": R0,
    }


def test_n_iter_validation(spark):
    with pytest.raises(ValueError):
        pagerank(None, n_iter=-1)


def test_caller_supplied_wdeg_matches_self_computed(spark):
    # wdeg_col (round-13 optimization knob): caller-attached total
    # outgoing weights must reproduce the self-computed degree path
    # bit-for-bit on every node
    from pyspark.sql import functions as F

    rows = [(f"n{i}", f"n{(i * 7 + 1) % 20}", 1 + i % 3) for i in range(60)]
    e = spark.createDataFrame(rows, ["src", "dst", "w"])
    deg = e.groupBy("src").agg(F.sum("w").alias("wdeg"))
    ew = e.join(deg, "src")
    a = _ranks(pagerank(e, n_iter=3))
    b = _ranks(pagerank(ew, n_iter=3, wdeg_col="wdeg"))
    assert a == b


def test_broadcast_and_shuffle_paths_agree(spark):
    rows = [(f"n{i}", f"n{(i * 11 + 3) % 17}", 1 + i % 4) for i in range(50)]
    e = spark.createDataFrame(rows, ["src", "dst", "w"])
    a = _ranks(pagerank(e, n_iter=3, broadcast_ranks=False))
    b = _ranks(pagerank(e, n_iter=3, broadcast_ranks=True))
    assert a == b
