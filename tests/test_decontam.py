"""ngram_contamination behavior: planted overlap detected, clean and
too-short docs report zero, hash-mode equivalence (xxhash31 vs the
portable md5_hash31 — same verdicts, only the hash differs)."""

from __future__ import annotations

import pytest

from irclogbot_spark.operators import dedup
from irclogbot_spark.operators.decontam import ngram_contamination


@pytest.fixture(scope="module")
def corpora(spark):
    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [
            (1, f"lead-in words then {span} and a tail"),
            (2, "completely unrelated training text with many distinct tokens here"),
        ],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [
            (10, f"prefix {span} suffix words continue onward"),  # shares 8-grams
            (11, "nothing in common with the training corpus at all truly"),
            (12, "short doc"),  # < 8 tokens: zero n-grams
        ],
        ["doc_id", "text"],
    )
    return train, test


def _rows(df):
    return {r.doc_id: (r.n_ngrams, r.n_shared, r.contaminated) for r in df.collect()}


def test_planted_overlap_is_flagged(spark, corpora):
    train, test = corpora
    got = _rows(ngram_contamination(train, test, n=8))
    assert set(got) == {10, 11, 12}  # every test doc reports, even shingle-less
    n10, s10, c10 = got[10]
    assert c10 and s10 >= 3  # the 10-token shared span yields 3 shared 8-grams
    assert n10 > s10  # doc 10 also has unshared n-grams
    assert got[11][1] == 0 and not got[11][2]
    assert got[11][0] > 0
    assert got[12] == (0, 0, False)


def test_hash_modes_agree_on_verdicts(spark, corpora):
    train, test = corpora
    fast = _rows(ngram_contamination(train, test, n=8))
    portable = _rows(ngram_contamination(train, test, n=8, hash_fn=dedup.md5_hash31))
    assert fast == portable


def test_semantic_decontam_flags_twin_not_stranger(spark):
    from irclogbot_spark.operators.decontam import semantic_decontamination

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.7, 0.7, 0.0])],
        ["vec_id", "embedding"],
    )
    ev = spark.createDataFrame(
        [(9, [0.99, 0.01, 0.0])], ["eval_id", "embedding"]
    )
    out = {r["vec_id"]: r.asDict() for r in
           semantic_decontamination(corpus, ev, threshold=0.95).collect()}
    assert out[1]["flagged"] and not out[2]["flagged"]
    assert abs(out[1]["max_sim"] - 1.0) < 0.01


def test_semantic_decontam_empty_eval_flags_nothing(spark):
    from irclogbot_spark.operators.decontam import semantic_decontamination

    corpus = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    ev = spark.createDataFrame([], "eval_id long, embedding array<double>")
    rows = semantic_decontamination(corpus, ev).collect()
    assert len(rows) == 1 and rows[0]["flagged"] is False and rows[0]["max_sim"] is None
