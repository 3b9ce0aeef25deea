"""Count-min sketch over term frequencies — the bounded-memory
heavy-hitter counter (Cormode & Muthukrishnan 2005).

Where the Bloom filter (operators/bloom.py) answers membership and
HLL (events_approx_stats) answers cardinality, CMS answers "how many
times": d independent hash rows x w counters; an item's estimate is
the MIN over its d cells, an overestimate by at most the collision
mass (never an underestimate — the property the tests pin). The
sketch is d*w integers regardless of corpus size: a plan-bounded
learned table, exactly like the Bloom filter's bit words.

Scale shape: term counts partial-aggregate on ONE term shuffle; the
sketch build re-aggregates those distinct-term rows into d*w cells
(a second shuffle of DISTINCT TERMS, not the corpus); probes join the
d*w-row cell table (broadcast). Determinism: the bucket hash is the
portable md5 fold (dedup.md5_hash31's documented twin) salted by the
row index, so the whole sketch is reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(term: Column, row: int, width: int) -> Column:
    """Bucket of ``term`` under hash row ``row``: first 15 hex digits
    of md5('<row>' || \\x1f || term) parsed base-16, mod width —
    byte-identical to the SQL twin."""
    s = F.concat_ws("\x1f", F.lit(str(row)), term)
    h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(width).cast("long"))


def build_cms(
    term_counts: DataFrame,
    depth: int = 4,
    width: int = 256,
    term_col: str = "term",
    count_col: str = "cnt",
) -> DataFrame:
    """(row, bucket, cell) sketch cells from a (term, count) frame.
    Rows with zero collision simply carry that term's count; cells
    absorb every colliding term's count."""
    exploded = term_counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("row"),
                        cms_bucket(F.col(term_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
        F.col(count_col),
    )
    return exploded.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.sum(count_col).cast("long").alias("cell"))


def cms_estimate(
    probes: DataFrame,
    cells: DataFrame,
    depth: int = 4,
    width: int = 256,
    term_col: str = "term",
) -> DataFrame:
    """probes plus ``cms_estimate`` = min over the d cells. The cell
    table is broadcast (d*w rows — bounded by sketch geometry, never
    data). LEFT join + coalesce-0: a bucket no term ever hashed into
    has no cell row, and correct CMS semantics read it as 0 — an
    inner join would silently drop never-seen probe terms (or
    over-min collided ones)."""
    with_buckets = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("row"),
                        cms_bucket(F.col(term_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("*", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    joined = with_buckets.join(F.broadcast(cells), ["row", "bucket"], "left")
    group_cols = [c for c in probes.columns]
    return joined.groupBy(*group_cols).agg(
        F.min(F.coalesce(F.col("cell"), F.lit(0)))
        .cast("long")
        .alias("cms_estimate")
    )
