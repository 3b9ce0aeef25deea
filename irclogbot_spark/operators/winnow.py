"""Document fingerprinting by winnowing (Schleimer, Wilkerson &
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003 — the MOSS algorithm).

Every document is reduced to a small, position-robust fingerprint
set: hash all word k-gram shingles IN ORDER, slide a window of w
consecutive hashes, keep the minimum of each window. The guarantee
(Thm. 1 of the paper): any shared run of at least w + k - 1 tokens
between two documents yields at least one shared fingerprint, while
the expected density of selected hashes is only 2/(w+1) — the
fingerprint set is ~len/w, not ~len.

Where the reference's surface stops at exact-substring duplicate
spans (operators/crossdup.py, which must align on n-token
boundaries), winnowing gives the sub-quadratic "which documents
share ANY sufficiently long run" question a bounded index:

* fingerprint extraction is MAP-ONLY — ordered k-gram hashes, the
  per-window minima, and the per-doc distinct all happen in-row via
  higher-order functions; text never leaves its scan task;
* the pair stage is the SAME shape as MinHash-LSH's band join
  (operators/dedup.py): one fingerprint-keyed partial-agg shuffle
  for bucket sizes, hot buckets dropped by ``max_bucket`` (the
  stop-fingerprint cap — a boilerplate phrase shared by half the
  corpus would otherwise expand quadratically; MOSS deployments
  apply exactly this cull), then a co-partitioned self-join whose
  expansion is <= max_bucket^2/2 rows per bucket.

Determinism & oracle: the selected fingerprint SET is a pure
function of the token stream and the hash — no rank ties, no float
anywhere. With ``hash_fn=dedup.md5_hash31`` the whole operator
value-hashes against an ANSI twin (per-window minima = a windowed
MIN over (doc, position) rows in SQL); the default ``xxhash31``
stays the scale path (xxhash64 ∉ DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import tokens, xxhash31


def _ordered_gram_hashes(
    text: Column | str, k: int, hash_fn
) -> Column:
    """Positional (ordered, duplicate-preserving) k-gram hashes —
    unlike dedup.shingles, position matters here: the window minima
    are taken over CONSECUTIVE hashes. Docs under k tokens get an
    empty array."""
    toks = tokens(text)
    n = F.size(toks) - F.lit(k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: hash_fn(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    return F.when(n >= 1, grams).otherwise(F.array().cast("array<long>"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    hash_fn=None,
) -> DataFrame:
    """The winnowed fingerprint set: ``(id, fp)`` rows, distinct per
    document. ``k`` = shingle width (noise threshold: matches shorter
    than k tokens are never seen), ``w`` = window width (guarantee
    threshold: any shared run of >= w+k-1 tokens IS caught).

    Map-only: window minima are an in-row transform over
    ``sequence(1, len-w+1)`` of ``array_min(slice(hashes, i, w))``
    (a doc with fewer than w hashes degenerates to one whole-array
    window — the paper's convention for short documents), then an
    in-row ``array_distinct`` before the explode, so the shuffle-free
    stage emits ~len/w rows per doc, never one per window."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    from irclogbot_spark.plans.partitioning import ensure_parallelism

    hash_fn = hash_fn or xxhash31
    hs = _ordered_gram_hashes(text_col, k, hash_fn)
    # the in-row window-minima transform is O(len) per doc and
    # map-only: spread it even when the input is one small file
    d = ensure_parallelism(df).select(F.col(id_col), hs.alias("_hs"))
    nwin = F.greatest(F.lit(1), F.size("_hs") - F.lit(w - 1))
    wins = F.transform(
        F.sequence(F.lit(1), nwin),
        lambda i: F.array_min(F.slice("_hs", i, w)),
    )
    fps = F.when(F.size("_hs") >= 1, F.array_distinct(wins)).otherwise(
        F.array().cast("array<long>")
    )
    return d.select(F.col(id_col), F.explode(fps).alias("fp"))


def winnow_similar_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    max_bucket: int = 50,
    min_shared: int = 1,
    hash_fn=None,
) -> DataFrame:
    """Document pairs sharing winnowed fingerprints: ``(doc_a,
    doc_b, n_shared)`` with ``doc_a < doc_b``, keeping pairs with at
    least ``min_shared`` shared fingerprints.

    Scale shape: one fp-keyed partial-agg shuffle sizes the buckets;
    fingerprints shared by more than ``max_bucket`` documents are
    dropped (stop-fingerprints — boilerplate shared corpus-wide
    carries no similarity signal and explodes quadratically);
    singleton buckets are dropped too (they cannot form a pair). The
    self-join then runs co-partitioned on fp with bounded expansion,
    and the pair aggregate is another partial-agg shuffle keyed on
    the (a, b) pair."""
    if max_bucket < 2:
        raise ValueError(f"max_bucket must be >= 2, got {max_bucket}")
    # the fingerprint frame feeds BOTH the bucket sizing and the join
    # side, and it is map-only (no exchange Spark could reuse) —
    # without materialization the k-gram hashing would run twice
    fp = winnow_fingerprints(
        df, id_col=id_col, text_col=text_col, k=k, w=w, hash_fn=hash_fn
    ).localCheckpoint(eager=False)
    elig = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter((F.col("_c") >= 2) & (F.col("_c") <= max_bucket))
        .select("fp")
    )
    capped = fp.join(elig, "fp")
    a = capped.select("fp", F.col(id_col).alias("doc_a"))
    b = capped.select("fp", F.col(id_col).alias("doc_b"))
    pairs = a.join(b, "fp").filter(F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
