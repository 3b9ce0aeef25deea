"""Paragraph-level dedup (operators/paragraphs.py): CCNet semantics —
cross-document boilerplate removed, within-doc repeats kept, in-order
rebuild, empty-doc handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from irclogbot_spark.operators.paragraphs import (
    paragraph_dedup,
    split_paragraphs,
    token_window_paragraphs,
)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_cross_doc_boilerplate_removed_everywhere(spark):
    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique alpha text\nCOOKIE BANNER"),
            (2, "COOKIE BANNER\nunique beta text"),
            (3, "only original content here"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(paragraph_dedup(docs, min_docs=2))
    # the banner occurs in docs 1 and 2 -> removed from BOTH,
    # including doc 1's second copy
    assert out[1]["text_clean"] == "unique alpha text"
    assert out[1]["n_paras"] == 3 and out[1]["n_removed"] == 2
    assert out[2]["text_clean"] == "unique beta text"
    assert out[3]["text_clean"] == "only original content here"
    assert out[3]["n_removed"] == 0


def test_within_doc_repeat_only_is_kept(spark):
    # CCNet counts DISTINCT documents: a paragraph repeated twice in
    # ONE doc but nowhere else is not boilerplate
    docs = spark.createDataFrame(
        [(1, "again\nmiddle\nagain"), (2, "other stuff")],
        ["doc_id", "text"],
    )
    out = _rows(paragraph_dedup(docs, min_docs=2))
    assert out[1]["text_clean"] == "again\nmiddle\nagain"
    assert out[1]["n_removed"] == 0


def test_fully_boilerplate_doc_becomes_empty_and_empty_doc_survives(spark):
    docs = spark.createDataFrame(
        [(1, "dup block"), (2, "dup block"), (3, "")],
        ["doc_id", "text"],
    )
    out = _rows(paragraph_dedup(docs, min_docs=2))
    assert out[1]["text_clean"] == "" and out[1]["n_removed"] == 1
    assert out[2]["text_clean"] == "" and out[2]["n_removed"] == 1
    assert out[3]["n_paras"] == 0 and out[3]["text_clean"] == ""


def test_min_docs_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "shared"), (2, "shared"), (3, "shared\nown")],
        ["doc_id", "text"],
    )
    out3 = _rows(paragraph_dedup(docs, min_docs=3))
    assert out3[3]["text_clean"] == "own"
    # below 3 distinct docs nothing is removed
    docs2 = spark.createDataFrame(
        [(1, "shared"), (2, "shared"), (3, "own")], ["doc_id", "text"]
    )
    assert all(
        r["n_removed"] == 0
        for r in paragraph_dedup(docs2, min_docs=3).collect()
    )


def test_min_docs_validation():
    with pytest.raises(ValueError):
        paragraph_dedup(None, min_docs=1)


def test_split_paragraphs_drops_blank_segments(spark):
    df = spark.range(1).select(
        split_paragraphs(F.lit("a\n\n\nb\n  \nc\n")).alias("p")
    )
    assert df.collect()[0]["p"] == ["a", "b", "c"]


def test_token_window_paragraphs_grid(spark):
    df = spark.range(1).select(
        token_window_paragraphs(F.lit("a b c d e"), 2).alias("p")
    )
    assert df.collect()[0]["p"] == ["a b", "c d", "e"]
    empty = spark.range(1).select(
        token_window_paragraphs(F.lit(""), 2).alias("p")
    )
    assert empty.collect()[0]["p"] == []


def test_xxhash_and_md5_twins_agree_on_verdicts(spark, sf_dir):
    # scale-path hash (xxhash64) and checkable hash (md5) must make
    # identical removal decisions on the real corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    paras = token_window_paragraphs(F.col("text"), 20)
    a = paragraph_dedup(docs, paragraphs=paras).select(
        "doc_id", "n_removed", "text_clean"
    )
    b = paragraph_dedup(docs, paragraphs=paras, hash_fn=F.md5).select(
        "doc_id", "n_removed", "text_clean"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
