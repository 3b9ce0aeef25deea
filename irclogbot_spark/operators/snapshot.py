"""Corpus snapshot diff (release-over-release change accounting).

A training-data pipeline re-crawls and re-releases: v(N+1) of a
corpus against vN decomposes into added / removed / changed /
unchanged documents. This is the audit artifact behind every data
card delta and the input to incremental re-processing decisions
(only `added`+`changed` need re-tokenizing; `removed` drives index
tombstones — see operators/incremental.py for the dedup analog).

Shape at 100 TB: fingerprints are computed IN-ROW (md5 of the text —
pluggable), so the FULL OUTER join shuffles only (id, fp) pairs —
two narrow hash exchanges co-partitioned on the id, text never moves.
The outer join is the point: `added` lives only on the right,
`removed` only on the left, and both survive (the §2I full-outer
relational shape, absent from the rest of the registry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_fp(c: Column) -> Column:
    return F.md5(c)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_fn=_md5_fp,
) -> DataFrame:
    """Per-document diff status between two corpus snapshots.
    Returns (doc_id, status) with status in
    {'added', 'removed', 'changed', 'unchanged'}."""
    o = old.select(
        F.col(id_col).alias("_oid"), fingerprint_fn(F.col(text_col)).alias("_ofp")
    )
    n = new.select(
        F.col(id_col).alias("_nid"), fingerprint_fn(F.col(text_col)).alias("_nfp")
    )
    j = o.join(n, o._oid == n._nid, "full_outer")
    status = (
        F.when(F.col("_oid").isNull(), F.lit("added"))
        .when(F.col("_nid").isNull(), F.lit("removed"))
        .when(F.col("_ofp") != F.col("_nfp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.coalesce(F.col("_oid"), F.col("_nid")).alias(id_col),
        status.alias("status"),
    )
