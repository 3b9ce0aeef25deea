"""Incremental-dedup operator tests (operators/incremental.py):
every verdict class on planted data, production (xxhash) hash path,
and the batch-probes-history join shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irclogbot_spark.operators.incremental import incremental_dedup

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


@pytest.fixture(scope="module")
def frames(spark):
    hist = spark.createDataFrame(
        [
            (1, BASE),
            (2, "completely different historical text about spark engines here"),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (11, BASE),  # exact dup of history 1
            (12, "a genuinely new document with its own unseen content today"),
            (13, BASE + " lambda"),  # near dup of history 1 (j = 10/11)
            (14, "same batch text repeated"),  # keep-first within batch
            (15, "same batch text repeated"),  # exact dup of 14
        ],
        "doc_id long, text string",
    )
    return hist, batch


def _verdicts(out):
    return {r.doc_id: (r.verdict, r.dup_of, r.jaccard) for r in out.collect()}


@pytest.mark.parametrize("hash_fn_name", ["default", "portable"])
def test_every_verdict_class(spark, frames, hash_fn_name):
    from irclogbot_spark.operators.dedup import md5_hash31

    hist, batch = frames
    hash_fn = None if hash_fn_name == "default" else md5_hash31
    out = incremental_dedup(hist, batch, threshold=0.8, hash_fn=hash_fn)
    v = _verdicts(out)
    assert v[11] == ("exact_dup_history", 1, None)
    assert v[12][0] == "new" and v[12][1] is None and v[12][2] is None
    assert v[13][0] == "near_dup_history" and v[13][1] == 1
    # 5-gram shingle Jaccard: BASE has 6 shingles, BASE+" lambda" 7,
    # all 6 shared -> 6/7
    assert v[13][2] == pytest.approx(6 / 7)
    assert v[14][0] == "new"  # first copy within batch survives
    assert v[15] == ("exact_dup_batch", 14, None)
    assert len(v) == batch.count()  # one row per batch doc, always


def test_history_never_self_joins(spark, frames):
    """Near-dups WITHIN history must not surface: only batch docs
    get verdicts, and history x history pairs are never formed."""
    hist, batch = frames
    hist2 = hist.union(
        spark.createDataFrame([(4, BASE + " mu")], "doc_id long, text string")
    )  # 4 is a near-dup of 1 inside history
    out = incremental_dedup(hist2, batch, threshold=0.8)
    ids = {r.doc_id for r in out.collect()}
    assert ids == {11, 12, 13, 14, 15}


def test_bucket_cap_drops_degenerate_history_buckets(spark, frames):
    hist, batch = frames
    out = incremental_dedup(hist, batch, threshold=0.8, max_bucket=0)
    v = _verdicts(out)
    # near layer disabled by the cap; exact layer unaffected
    assert v[13][0] == "new"
    assert v[11][0] == "exact_dup_history"


def test_exact_dup_beats_near_dup(spark):
    """A batch doc that is BOTH an exact dup (of history) and a near
    dup of something else reports the exact verdict."""
    hist = spark.createDataFrame(
        [(1, BASE), (2, BASE + " lambda")], "doc_id long, text string"
    )
    batch = spark.createDataFrame([(11, BASE)], "doc_id long, text string")
    v = _verdicts(incremental_dedup(hist, batch))
    assert v[11] == ("exact_dup_history", 1, None)


def test_banded_rejects_non_divisible_bands(spark, frames):
    """num_perm % bands != 0 would silently drop trailing signature
    lanes (recall loss, no error) — rejected loudly, matching the
    minhash_lsh invariant (ADVICE r3)."""
    hist, batch = frames
    with pytest.raises(ValueError, match="divisible"):
        incremental_dedup(hist, batch, num_perm=32, bands=7).collect()


def test_within_batch_near_dup_opt_in(spark):
    """VERDICT r3 #5: with within_batch=True, two near-dup docs
    arriving in the SAME batch are caught — the larger id is
    near_dup_batch of the smaller, so only one would be admitted.
    Default (off) keeps the r2/r3 semantics: both are 'new'."""
    hist = spark.createDataFrame(
        [(1, "completely different historical text about spark engines here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(21, BASE), (22, BASE + " lambda"), (23, "an unrelated batch doc here")],
        "doc_id long, text string",
    )
    off = _verdicts(incremental_dedup(hist, batch, threshold=0.8))
    assert off[21][0] == "new" and off[22][0] == "new"

    on = _verdicts(incremental_dedup(hist, batch, threshold=0.8, within_batch=True))
    assert on[21][0] == "new"  # smallest id of the near-dup pair survives
    assert on[22][0] == "near_dup_batch" and on[22][1] == 21
    assert on[22][2] == pytest.approx(6 / 7)
    assert on[23][0] == "new"


def test_within_batch_history_verdict_wins(spark):
    """A doc that is a near dup of BOTH history and a smaller-id
    batch doc reports near_dup_history (history is authoritative);
    exact verdicts still beat both near classes."""
    hist = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(21, BASE + " lambda"), (22, BASE + " lambda mu")],
        "doc_id long, text string",
    )
    v = _verdicts(incremental_dedup(hist, batch, threshold=0.7, within_batch=True))
    assert v[21][0] == "near_dup_history" and v[21][1] == 1
    assert v[22][0] == "near_dup_history" and v[22][1] == 1
