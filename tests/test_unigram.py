"""Unigram Viterbi segmentation (operators/unigram.py): the
F.aggregate DP against a pure-Python Viterbi reference, the
(cost, pieces) combined-integer encoding, the unknown-character
fallback, and trainer determinism."""

from __future__ import annotations

import math

import pytest

from irclogbot_spark.operators import unigram
from irclogbot_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_viterbi(word: str, costs: dict[str, int], unk: int) -> tuple[int, int]:
    """Reference DP over (cost, pieces) tuples with lexicographic min
    — the semantics the combined-integer encoding must preserve."""
    best: list[tuple[int, int]] = [(0, 0)] + [(1 << 60, 0)] * len(word)
    for p in range(1, len(word) + 1):
        cands = []
        for s in range(max(1, p - unigram.MAX_PIECE + 1), p + 1):
            piece = word[s - 1 : p]
            if piece in costs:
                c = costs[piece]
            elif len(piece) == 1:
                c = unk
            else:
                continue
            prev = best[s - 1]
            cands.append((prev[0] + c, prev[1] + 1))
        best[p] = min(cands)
    return best[len(word)]


def test_viterbi_matches_python_reference_on_corpus_words(spark):
    docs = load_table(spark, SF, "documents")
    pairs = unigram.top_grams(docs, k=200)
    costs, unk = unigram.train_unigram_costs(pairs)
    words = (
        docs.select(unigram.F.explode(unigram._words(docs, "text")).alias("word"))
        .distinct()
        .limit(300)
    )
    got = {
        r.word: (r.word_cost_milli, r.word_pieces)
        for r in unigram.viterbi_costs(words, costs, unk).collect()
    }
    for w, pair in got.items():
        assert pair == _py_viterbi(w, costs, unk), f"word {w!r}"


def test_viterbi_prefers_fewer_pieces_at_equal_cost(spark):
    # 'ab'+'ab' and 'abab' both cost 2000: the combined encoding must
    # pick 1 piece (lexicographic (cost, pieces) min)
    toy = spark.createDataFrame([("abab",)], "word string")
    costs = {"ab": 1000, "abab": 2000}
    r = unigram.viterbi_costs(toy, costs, 9000).collect()[0]
    assert (r.word_cost_milli, r.word_pieces) == (2000, 1)


def test_viterbi_unknown_chars_fall_back_per_char(spark):
    toy = spark.createDataFrame([("xyz",)], "word string")
    r = unigram.viterbi_costs(toy, {"ab": 1}, 500).collect()[0]
    assert (r.word_cost_milli, r.word_pieces) == (1500, 3)


def test_trainer_quantization_is_half_up_and_bounded(spark):
    costs, unk = unigram.train_unigram_costs([("a", 3), ("b", 1)])
    total = 4
    assert costs["a"] == int(math.floor(1000 * math.log(total / 3) + 0.5))
    assert costs["b"] == int(math.floor(1000 * math.log(total / 1) + 0.5))
    assert unk == max(costs.values()) + 1000
    with pytest.raises(ValueError):
        unigram.train_unigram_costs([])


def test_segment_stats_partitioning_invariant_and_zipf_joined(spark):
    docs = load_table(spark, SF, "documents")
    costs, unk = unigram.train_unigram_costs(unigram.top_grams(docs, k=50))
    a = sorted(
        map(tuple, unigram.unigram_segment_stats(docs, costs, unk).collect())
    )
    b = sorted(
        map(
            tuple,
            unigram.unigram_segment_stats(
                docs.repartition(13), costs, unk
            ).collect(),
        )
    )
    assert a == b and len(a) == 500
    # pieces >= words (every word is at least one piece)
    assert all(r[3] >= r[1] for r in a)
