"""Data selection by importance resampling (DSIR — Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023): score every raw document by an estimated importance
ratio w(x) = p_target(x) / p_raw(x) under a hashed-n-gram bag model,
then resample the corpus toward the target distribution.

The model: log w(x) factorizes (naive-Bayes over hashed features)
into a SUM of per-bucket log ratios over the document's unigram and
bigram features — so scoring is a single in-row pass, exactly the
``functions/quality.py`` shape. The per-bucket log ratios are
quantized to integer milli-units and shipped as a plan-constant
array literal: integer sums are associative and bit-identical across
engines, which is what lets ``docs_importance_resample`` carry a
value-hashed DuckDB oracle (float log-sums drift in the last ulp).
``importance_weights`` is the deterministic seeded placeholder for a
replica-trained table — a real deployment estimates bucket counts
over the target and raw corpora (DSIR eq. 2) and quantizes; the
scoring/selection plumbing is unchanged.

Two selection modes, the repo's standard checkable-twin convention:

* ``mode="topn"`` (the ORACLE-CHECKED configuration): deterministic
  top-n by (logit, id) — the greedy MAP variant of resampling
  (heavy-tail selection without noise). A partial top-k
  (TakeOrderedAndProject), never a global sort.
* ``mode="gumbel"`` (the statistical scale path): Gumbel top-k —
  rank by logit + Gumbel(0,1) noise, which samples WITHOUT
  replacement with probability proportional to w(x) (Vieira 2014).
  The noise is derived from a content-hash uniform, so the sample is
  deterministic for a given corpus and seed, but ln() is
  libm-dependent — property-tested, not oracle-hashed (same split as
  xxhash vs md5_hash31 everywhere else in the repo).

Scale shape: scoring is MAP-ONLY (plan-constant weight table, no
join, no shuffle; the corpus is never moved to be scored); selection
is a bounded top-n. At 100 TB the only data movement is the top-n's
per-partition heads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import tokens, xxhash31

_MILLI = 1000


def importance_weights(dim: int = 512, seed: int = 11) -> list[int]:
    """Deterministic placeholder per-bucket quantized log ratios
    (milli-units, ints in [-2000, 2000] ~ ratios in [e^-2, e^2]).
    Replace with a trained table estimated from hashed-n-gram counts
    of the target vs raw corpus; everything downstream is unchanged."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [int(x) for x in rng.randint(-2000, 2001, size=dim)]


def _features(text: Column | str) -> Column:
    """DSIR's hashed-feature set: unigrams plus space-joined bigrams,
    both from the in-row token array (no explode — the feature list
    stays inside the row)."""
    toks = tokens(text)
    n_bi = F.size(toks) - F.lit(1)
    bigrams = F.when(
        n_bi >= 1,
        F.transform(
            F.sequence(F.lit(1), n_bi),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def importance_logit(
    text: Column | str, weights: list[int], hash_fn=None
) -> Column:
    """Quantized log importance ratio: the integer milli-unit sum of
    W[h(feature) mod dim] over the document's unigram+bigram
    features. Empty documents score 0 (ratio 1 — no evidence)."""
    hash_fn = hash_fn or xxhash31
    dim = len(weights)
    from irclogbot_spark.functions.lits import lit_long_array

    warr = lit_long_array([int(w) for w in weights])
    picked = F.transform(
        _features(text),
        lambda t: F.element_at(
            warr, (F.pmod(hash_fn(t), F.lit(dim)) + F.lit(1)).cast("int")
        ),
    )
    return F.aggregate(picked, F.lit(0).cast("long"), lambda a, x: a + x)


def importance_resample(
    df: DataFrame,
    n: int,
    weights: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "topn",
    seed: int = 0,
    hash_fn=None,
) -> DataFrame:
    """Select ``n`` documents importance-weighted toward the target
    distribution. Returns ``(id, imp_milli)`` — the quantized logit
    rides along so downstream mixing can reuse it.

    ``mode="topn"``: deterministic greedy selection (highest logit,
    id tiebreak). ``mode="gumbel"``: Gumbel top-k — proportional
    sampling without replacement; the Gumbel variate is
    -ln(-ln(U)) with U a content-hash uniform in (0, 1), so a given
    (corpus, seed) always draws the same sample."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if mode not in ("topn", "gumbel"):
        raise ValueError(f"mode must be 'topn' or 'gumbel', got {mode!r}")
    logit = importance_logit(text_col, weights, hash_fn=hash_fn)
    scored = df.select(F.col(id_col), logit.alias("imp_milli"))
    if mode == "topn":
        return scored.orderBy(F.desc("imp_milli"), F.asc(id_col)).limit(n)
    # Gumbel top-k: key = logit/MILLI + G, G = -ln(-ln(U)),
    # U = (md5-fold of seed||id in [0, 2^60)) / 2^60, nudged off 0
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("\x1f", F.lit(str(seed)), F.col(id_col).cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("double")
            + F.lit(0.5)
        )
        / F.lit(float(2**60))
    )
    g = -F.log(-F.log(u))
    key = F.col("imp_milli").cast("double") / F.lit(float(_MILLI)) + g
    return (
        scored.withColumn("_k", key)
        .orderBy(F.desc("_k"), F.asc(id_col))
        .limit(n)
        .drop("_k")
    )
