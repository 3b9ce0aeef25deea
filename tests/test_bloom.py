"""Bloom-filter decontamination (operators/bloom.py): superset
guarantee vs the exact pass, membership mechanics, scale-path twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irclogbot_spark.operators.bloom import (
    bloom_contamination,
    bloom_maybe,
    build_bloom,
    portable_hash_pair,
    xxhash_pair,
)


def test_known_contamination_flagged(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words the quick brown fox jumps over the lazy dog tonight suffix"),
            (2, "completely different content with no overlap at all in any window here"),
            (3, "too short"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in bloom_contamination(
            corpus, ev, n=8, hash_pair_fn=portable_hash_pair
        ).collect()
    }
    assert out[1]["flagged"] and out[1]["n_maybe"] >= 1
    assert out[3]["n_ngrams"] == 0 and not out[3]["flagged"]
    # doc 2 could only be flagged by a false positive; at 3 bits in a
    # 2^18-bit filter holding ~5 shingles that is ~impossible
    assert not out[2]["flagged"]


@pytest.mark.parametrize("pair", [portable_hash_pair, xxhash_pair])
def test_superset_of_exact_pass(spark, sf_dir, pair):
    """No false negatives: every doc the exact n-gram join flags is
    bloom-flagged, under BOTH the portable and the xxhash pair; false
    positives stay a small fraction of the corpus."""
    from irclogbot_spark.operators.decontam import ngram_contamination
    from irclogbot_spark.operators.dedup import md5_hash31

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    bloom = bloom_contamination(tr, ev, n=8, hash_pair_fn=pair)
    exact = ngram_contamination(ev, tr, n=8, hash_fn=md5_hash31)
    bf = {r["doc_id"] for r in bloom.filter("flagged").collect()}
    ef = {r["doc_id"] for r in exact.filter("contaminated").collect()}
    assert ef <= bf
    n_train = tr.count()
    assert len(bf - ef) <= max(3, n_train // 20)


def test_bloom_maybe_is_membership_for_inserted_shingles(spark):
    ev = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    words = build_bloom(ev, n=8, hash_pair_fn=portable_hash_pair)
    df = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",), ("x y z w v u t s",)],
        ["s"],
    ).select(
        "s",
        bloom_maybe(
            F.col("s"), words, 1 << 18, 3, portable_hash_pair
        ).alias("maybe"),
    )
    got = {r["s"]: r["maybe"] for r in df.collect()}
    assert got["alpha beta gamma delta epsilon zeta eta theta"] is True
    assert got["x y z w v u t s"] is False


def test_m_bits_validation(spark):
    from irclogbot_spark.operators.bloom import bloom_words_df

    with pytest.raises(ValueError):
        bloom_words_df(None, m_bits=100)


def test_empty_eval_set_flags_nothing(spark):
    ev = spark.createDataFrame([], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    out = bloom_contamination(corpus, ev, n=8, hash_pair_fn=portable_hash_pair)
    assert [r["flagged"] for r in out.collect()] == [False]
