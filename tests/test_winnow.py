"""Winnowing fingerprints (operators/winnow.py): the SIGMOD-2003
guarantee (shared runs of >= w+k-1 tokens always share a selected
fingerprint), the short-document degenerate window, the density
bound, the stop-fingerprint cap, and the map-only plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import md5_hash31
from irclogbot_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_similar_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_long_run_guarantees_shared_fingerprint(spark):
    # k=3, w=4: any shared run of >= 6 tokens must share a fingerprint
    run = "one two three four five six"
    d = _docs(
        spark,
        [
            (1, f"alpha beta {run} gamma"),
            (2, f"x y z {run} p q r"),
        ],
    )
    pairs = winnow_similar_pairs(d, k=3, w=4, hash_fn=md5_hash31).collect()
    assert len(pairs) == 1 and pairs[0].doc_a == 1 and pairs[0].doc_b == 2
    assert pairs[0].n_shared >= 1


def test_disjoint_docs_share_nothing(spark):
    d = _docs(
        spark,
        [
            (1, "aa bb cc dd ee ff gg hh"),
            (2, "qq ww rr tt yy uu ii oo"),
        ],
    )
    assert winnow_similar_pairs(d, k=3, w=4, hash_fn=md5_hash31).count() == 0


def test_short_doc_degenerate_single_window(spark):
    # 4 tokens, k=3 -> 2 hashes < w=4: one whole-array window, one
    # fingerprint (the min of both hashes)
    d = _docs(spark, [(1, "a b c d")])
    fps = winnow_fingerprints(d, k=3, w=4, hash_fn=md5_hash31).collect()
    assert len(fps) == 1


def test_too_short_and_empty_docs_get_no_fingerprints(spark):
    d = _docs(spark, [(1, "a b"), (2, ""), (3, "   ")])
    assert winnow_fingerprints(d, k=3, w=4).count() == 0


def test_density_bound_fps_at_most_windows(spark):
    text = " ".join(f"tok{i % 17}" for i in range(200))
    d = _docs(spark, [(1, text)])
    n_fps = winnow_fingerprints(d, k=5, w=4).count()
    n_windows = 200 - 5 + 1 - 4 + 1
    assert 1 <= n_fps <= n_windows
    # winnowing should select FAR fewer than one per window
    # (expected density 2/(w+1))
    assert n_fps < n_windows / 2


def test_identical_docs_fingerprints_identical(spark):
    text = " ".join(f"w{i}" for i in range(50))
    d = _docs(spark, [(1, text), (2, text)])
    fps = winnow_fingerprints(d, k=5, w=4).collect()
    a = {r.fp for r in fps if r.doc_id == 1}
    b = {r.fp for r in fps if r.doc_id == 2}
    assert a == b and len(a) >= 1


def test_stop_fingerprint_cap_drops_hot_buckets(spark):
    # 7 identical docs: every fingerprint bucket has size exactly 7,
    # so max_bucket below 7 culls ALL of them (stop-fingerprints) and
    # no pair survives; a generous cap keeps all 21 pairs
    text = "common header shared by every page in this corpus today"
    rows = [(i, text) for i in range(1, 8)]
    d = _docs(spark, rows)
    full = winnow_similar_pairs(d, k=3, w=4, max_bucket=50, hash_fn=md5_hash31)
    assert full.count() == 7 * 6 // 2
    culled = winnow_similar_pairs(d, k=3, w=4, max_bucket=5, hash_fn=md5_hash31)
    assert culled.count() == 0


def test_validation(spark):
    d = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        winnow_fingerprints(d, k=0)
    with pytest.raises(ValueError):
        winnow_similar_pairs(d, max_bucket=1)


def test_fingerprint_stage_map_only(spark):
    d = _docs(spark, [(1, "a b c d e f g h")])
    plan = (
        winnow_fingerprints(d, k=3, w=4)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan
