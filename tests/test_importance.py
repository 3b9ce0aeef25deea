"""DSIR importance resampling (operators/importance.py): integer
logit exactness, empty-doc convention, topn determinism, Gumbel
proportionality bias, and the map-only scoring plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import md5_hash31
from irclogbot_spark.operators.importance import (
    importance_resample,
    importance_weights,
    score_importance,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_logit_is_integer_sum_of_feature_weights(spark):
    w = importance_weights(dim=64, seed=3)
    d = _docs(spark, [(1, "a b"), (2, ""), (3, "a")])
    out = {
        r.doc_id: r.imp_milli
        for r in score_importance(d, w, hash_fn=md5_hash31).collect()
    }
    # doc 1 = unigrams a, b + the (a, b) bigram bucket (combined
    # hash (h_a*31 + h_b) mod dim — each token hashed once); doc 3 =
    # unigram a only
    import hashlib

    def h31(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 2147483647

    def wt(s):
        return w[h31(s) % 64]

    bi_ab = w[(h31("a") * 31 + h31("b")) % 64]
    assert out[1] == wt("a") + wt("b") + bi_ab
    assert out[2] == 0  # empty doc: no evidence, ratio 1
    assert out[3] == wt("a")


def test_topn_is_deterministic_and_ordered(spark):
    w = importance_weights()
    rows = [(i, f"tok{i} filler words here") for i in range(1, 40)]
    d = _docs(spark, rows)
    a = importance_resample(d, 10, w, hash_fn=md5_hash31).collect()
    b = importance_resample(d, 10, w, hash_fn=md5_hash31).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    imps = [r.imp_milli for r in a]
    assert imps == sorted(imps, reverse=True)
    assert len(a) == 10


def test_gumbel_mode_prefers_heavy_docs(spark):
    # craft weights so docs repeating one token score high: the
    # Gumbel sample must pick high-logit docs far more often than
    # uniform. 20 heavy docs (logit >> 0) + 200 light docs (~0);
    # a sample of 20 should be mostly heavy.
    w = importance_weights(dim=32, seed=5)
    import hashlib

    def h31(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 2147483647

    heavy_tok = max(
        (f"h{i}" for i in range(50)), key=lambda t: w[h31(t) % 32]
    )
    assert w[h31(heavy_tok) % 32] > 0
    rows = [(i, " ".join([heavy_tok] * 30)) for i in range(20)]
    rows += [(100 + i, "") for i in range(200)]
    d = _docs(spark, rows)
    # sample 30: the 20 heavy docs should essentially all make it
    # (their logit dwarfs the Gumbel noise), the 10-slot tail is
    # noise-picked from the 200 identical light docs
    got = importance_resample(
        d, 30, w, mode="gumbel", seed=1, hash_fn=md5_hash31
    ).collect()
    n_heavy = sum(1 for r in got if r.doc_id < 100)
    assert n_heavy >= 18, n_heavy
    # deterministic for a fixed (corpus, seed)
    again = importance_resample(
        d, 30, w, mode="gumbel", seed=1, hash_fn=md5_hash31
    ).collect()
    assert {r.doc_id for r in got} == {r.doc_id for r in again}
    # a different seed draws a different light-doc tail
    other = importance_resample(
        d, 30, w, mode="gumbel", seed=2, hash_fn=md5_hash31
    ).collect()
    assert {r.doc_id for r in got} != {r.doc_id for r in other}


def test_validation(spark):
    d = _docs(spark, [(1, "a")])
    w = importance_weights(dim=16)
    with pytest.raises(ValueError):
        importance_resample(d, 0, w)
    with pytest.raises(ValueError):
        importance_resample(d, 5, w, mode="bogus")


def test_scoring_plan_map_only_topn_partial(spark):
    w = importance_weights(dim=64)
    d = _docs(spark, [(1, "a b c")])
    plan = (
        importance_resample(d, 5, w)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "Join" not in plan
    assert "hashpartitioning" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
