"""BPE training (operators/bpe.py): differential against a
pure-Python Sennrich reference, apply-side behavior, edge semantics."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from irclogbot_spark.operators.bpe import EOW, SEP, apply_bpe, train_bpe


def _python_bpe(texts: list[str], n_merges: int, min_freq: int = 2):
    """Sennrich learn_bpe, dict form: word-frequency table, overlapping
    pair counts, (count DESC, pair ASC) argmax, left-to-right
    non-overlapping merge."""
    words = Counter()
    for t in texts:
        for w in re.findall(r"\S+", t):
            if SEP not in w:
                words[w] += 1
    vocab = {tuple(list(w) + [EOW]): f for w, f in words.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (lhs, rhs), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + SEP + kv[0][1])
        )
        if cnt < min_freq:
            break
        merged = lhs + rhs
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
        merges.append(
            {"step": step, "lhs": lhs, "rhs": rhs, "merged": merged, "pair_freq": cnt}
        )
    return merges


def test_matches_python_reference_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = train_bpe(docs, n_merges=6)
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _python_bpe(texts, n_merges=6)
    assert got == want


def test_overlapping_pair_count_and_greedy_merge(spark):
    # "aaa": pairs (a,a) twice from one occurrence each of the word;
    # the merge is left-to-right non-overlapping -> ["aa", "a", EOW]
    docs = spark.createDataFrame([(1, "aaa aaa aaa")], ["doc_id", "text"])
    merges = train_bpe(docs, n_merges=1, min_freq=2)
    assert merges[0]["lhs"] == "a" and merges[0]["rhs"] == "a"
    assert merges[0]["pair_freq"] == 6  # 2 overlapping pairs x freq 3
    enc = apply_bpe(docs, merges).collect()[0]["bpe_tokens"]
    assert enc == ["aa", "a", EOW] * 3


def test_merge_respects_symbol_boundaries(spark):
    # ADVICE r5 repro: freqs {bc:20, ab:15, abc:5}. With a naive
    # single-separator join, after learning (b,c) and (bc,</w>) the
    # pair pattern "a<sep>b" matches INSIDE "a<sep>bc</w>" and "abc"
    # collapses to one symbol; true BPE leaves ["a", "bc</w>"]. The
    # wrapped representation makes the literal replace boundary-safe.
    text = " ".join(["bc"] * 20 + ["ab"] * 15 + ["abc"] * 5)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = train_bpe(docs, n_merges=3)
    want = _python_bpe([text], n_merges=3)
    assert got == want
    enc = apply_bpe(
        spark.createDataFrame([(1, "abc")], ["doc_id", "text"]), got
    ).collect()[0]["bpe_tokens"]
    # replay the python reference's merge loop on "abc" for the oracle
    syms = ["a", "b", "c", EOW]
    for m in got:
        out, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == m["lhs"]
                and syms[i + 1] == m["rhs"]
            ):
                out.append(m["merged"])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    assert enc == syms
    assert enc != ["abc" + EOW]  # the naive-join failure shape


def test_early_stop_below_min_freq(spark):
    docs = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    assert train_bpe(docs, n_merges=5, min_freq=2) == []


def test_apply_bpe_uses_learned_merges(spark):
    docs = spark.createDataFrame(
        [(1, "lower lower lowest")], ["doc_id", "text"]
    )
    merges = train_bpe(docs, n_merges=4)
    out = apply_bpe(docs, merges).collect()[0]["bpe_tokens"]
    # every learned merged symbol that appears must be one token
    joined = "".join(out)
    assert joined == "lower" + EOW + "lower" + EOW + "lowest" + EOW
    assert any(len(t) > 1 and t != EOW for t in out)
