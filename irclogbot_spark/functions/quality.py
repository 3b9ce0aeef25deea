"""Hashed linear quality classifier — the fasttext-shaped scoring
pass every large corpus pipeline runs (GPT-3's Common-Crawl quality
filter, CCNet's per-document model scores): a linear model over a
hashed bag of words, evaluated as pure column expressions so scoring
is MAP-ONLY at any scale.

The model here is deliberately integer-quantized fixed-point
(weights and bias are small ints, the logit divides the exact
integer sum once at the end):

* int sums are associative, so the score is identical under any
  partitioning/visit order AND bit-identical across engines — which
  is what lets `docs_quality_score` carry a value-hashed DuckDB
  oracle (float weight sums would drift in the last ulp; exp() in a
  sigmoid is libm-dependent, so the checked surface is the LOGIT,
  monotonically equivalent for thresholding);
* int8-ish quantization is how production classifiers ship anyway.

Swap `quality_weights`'s seeded placeholder for a trained model's
quantized weights; the evaluation plumbing (hashing, lookup, length
normalization, thresholding) is the part that must scale and is what
the tests pin. Weights are a plan-constant array literal — O(dim)
per plan, zero shuffles, zero joins; the corpus is never moved to be
scored.

Reference scope: absent from the reference (SURVEY §2I) — BASELINE
north-star text-analysis operator beside language-ID and the
Gopher/C4 heuristics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from irclogbot_spark.operators.dedup import tokens, xxhash31


def quality_weights(dim: int = 1024, seed: int = 7) -> tuple[list[int], int]:
    """Deterministic placeholder weights: (weights, bias), ints in
    [-8, 8]. A real deployment replaces these with a trained model's
    quantized coefficients — everything downstream is unchanged."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [int(x) for x in rng.randint(-8, 9, size=dim)], int(rng.randint(-8, 9))


def hashed_linear_logit(
    text: Column | str,
    weights: list[int],
    bias: int = 0,
    scale: int = 16,
    hash_fn=None,
) -> Column:
    """Length-normalized fixed-point logit:
    ``(bias + sum_tok W[h(tok) mod dim]) / (scale * max(n_tok, 1))``.

    One pass over the token array; the weight table is a plan-constant
    array indexed per token (``element_at``). ``hash_fn`` defaults to
    the 31-bit xxhash fold; pass ``md5_hash31`` for the
    DuckDB-checkable pipeline (same convention as MinHash)."""
    hash_fn = hash_fn or xxhash31
    dim = len(weights)
    from irclogbot_spark.functions.lits import lit_long_array

    warr = lit_long_array([int(w) for w in weights])
    toks = tokens(text)
    picked = F.transform(
        toks,
        lambda t: F.element_at(warr, (F.pmod(hash_fn(t), F.lit(dim)) + F.lit(1)).cast("int")),
    )
    s = F.aggregate(picked, F.lit(int(bias)).cast("long"), lambda a, x: a + x)
    n = F.greatest(F.size(toks), F.lit(1))
    return s.cast("double") / (F.lit(int(scale)).cast("long") * n).cast("double")


def compression_ratio_milli(text: Column | str) -> Column:
    """zlib compression ratio in integer milli-units —
    floor(1000 * compressed_bytes / raw_bytes) at level 6. The
    classic cheap repetition/quality signal (Gopher's repetition
    family, RefinedWeb's filters): boilerplate and template text
    compresses far below natural prose, so a LOW ratio flags
    low-information documents. Empty/NULL text scores NULL.

    Not SQL-expressible (no zlib in DuckDB): an Arrow-batched pandas
    UDF — the multimodal convention for codec-shaped work. Batches
    stream through zlib C code; per-row Python overhead is one dict
    call, and the column is map-only at any scale (no shuffle, no
    join). Deterministic: zlib output at a fixed level is stable for
    a given input on a given zlib build, and the registered query is
    rows-only checked with a pure-Python differential test pinning
    values (the winnow/importance convention for non-SQL ops)."""
    import pandas as pd  # noqa: F401

    @F.pandas_udf("long")
    def _ratio(s):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return (len(zlib.compress(raw, 6)) * 1000) // len(raw)

        return s.map(one)

    c = F.col(text) if isinstance(text, str) else text
    return _ratio(c)
