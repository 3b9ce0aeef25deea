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


def token_hashes(text: Column | str, hash_fn=None) -> Column:
    """Per-token 31-bit hashes, in order — each token hashed exactly
    ONCE. Must be bound to a real column (one projection) before
    ``importance_logit`` indexes into it: element_at over an unbound
    transform expression re-evaluates the whole array per access,
    turning the bigram pass quadratic (measured 10x on the bench)."""
    return F.transform(tokens(text), hash_fn or xxhash31)


def importance_logit(uh: Column | str, weights: list[int]) -> Column:
    """Quantized log importance ratio over a BOUND token-hash array
    column (see ``token_hashes``): the integer milli-unit sum of
    W[bucket] over unigram buckets (h_i mod dim) and bigram buckets
    ((h_i * 31 + h_{i+1}) mod dim — both 31-bit, so the combine
    stays exact in a BIGINT; combining hashes instead of hashing a
    concatenated string halves the hash calls and skips the bigram
    string allocation, with the same closed form in the SQL oracle).
    Empty documents score 0 (ratio 1 — no evidence)."""
    uh = F.col(uh) if isinstance(uh, str) else uh
    dim = len(weights)
    from irclogbot_spark.functions.lits import lit_long_array

    warr = lit_long_array([int(w) for w in weights])

    def pick(ix: Column) -> Column:
        return F.element_at(warr, (ix + F.lit(1)).cast("int"))

    uni = F.transform(uh, lambda h: pick(F.pmod(h, F.lit(dim))))
    n_bi = F.size(uh) - F.lit(1)
    bi = F.when(
        n_bi >= 1,
        F.transform(
            F.sequence(F.lit(1), n_bi),
            lambda i: pick(
                F.pmod(
                    F.element_at(uh, i.cast("int")) * F.lit(31)
                    + F.element_at(uh, (i + F.lit(1)).cast("int")),
                    F.lit(dim),
                )
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return F.aggregate(
        F.concat(uni, bi), F.lit(0).cast("long"), lambda a, x: a + x
    )


def score_importance(
    df: DataFrame,
    weights: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn=None,
) -> DataFrame:
    """(id, imp_milli) for every row — two chained projections (hash
    once into a bound column, then index it), still one map stage
    under whole-stage codegen."""
    hashed = df.select(
        F.col(id_col), token_hashes(text_col, hash_fn=hash_fn).alias("_uh")
    )
    return hashed.select(
        F.col(id_col), importance_logit("_uh", weights).alias("imp_milli")
    )


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
    scored = score_importance(
        df, weights, id_col=id_col, text_col=text_col, hash_fn=hash_fn
    )
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
