"""Explicit HyperLogLog cardinality sketch — oracle-paired, unlike
the engine built-in (Flajolet et al. 2007; the HLL++ empirical bias
table is skipped, the classic small-range linear-counting correction
is kept).

``events_approx_stats`` already records Spark's own
``approx_count_distinct`` beside its exact twin, but that row is
rows-only by design: DuckDB's ``approx_distinct`` is a *different*
HLL implementation, so the estimates can never value-hash. This
module closes that gap the way ``operators/bloom.py`` and
``operators/cms.py`` do for membership and frequency: the sketch is
built from portable primitives (md5 bucket/rho, integer shifts) so
the DuckDB oracle REBUILDS it and the estimate itself is
value-hashed, not just tolerance-tested.

Geometry and arithmetic (every step exact cross-engine):

  hash   h = first 12 hex digits of md5(key), a 48-bit integer
  bucket = h % 256          (b = 8 low bits -> m = 256 registers)
  w      = h // 256         (the remaining 40 bits)
  rho    = leading zeros of w in 40 bits, + 1
         = 41 - bitlen(w)   (41 when w = 0); bitlen is the length of
                            the minimal binary string — Spark
                            ``conv(w, 10, 2)``, DuckDB ``bin(w)``
  M_j    = MAX rho per bucket (duplicates cannot move a MAX, so HLL
           needs NO distinct pass — the whole point at 100 TB)
  S      = sum_j 2^(41 - M_j), empty registers contributing 2^41;
           S <= 256 * 2^41 = 2^49, an exact BIGINT
  est    = HLL_C // S where HLL_C = floor(alpha_256 * m^2 * 2^41)
           from the exact rational alpha_256 = 7213*1000*m /
           (10000*(1000m + 1079)); HLL_C ~ 1.0e17, an exact BIGINT
  if est <= 5m/2 and V > 0:  est = LINEAR_TABLE[V]   (V = empty
           registers; table = round(m * ln(m/V)) precomputed once in
           Python and inlined as the SAME literal in both engines —
           the Bloom/CMS plan-constant rule, so no cross-engine libm)

Scale shape: registers are ONE shuffle of (group, bucket, rho)
triples with map-side partial MAX — at most m rows per group ever
leave the aggregate, and the raw keys never shuffle at all (contrast
the exact twin's distinct over every key). Register frames from
independent shards max-merge bit-exactly (tested), which is what
makes the sketch a mergeable accumulator for 1000-executor
topologies and for the streaming-sketch recipe.

Error: 1.04/sqrt(256) ~ 6.5 % relative std, unbiased (measured
+-6 % over 20 trials in the design notes; the accuracy test pins a
3-sigma band). 48-bit hashing keeps birthday collisions < 0.2 % at
a million distinct keys; beyond ~1e10 distinct keys per group widen
HLL_HEX_DIGITS (and SCALE) before trusting the estimate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_B = 8
HLL_M = 1 << HLL_B  # 256 registers
HLL_HEX_DIGITS = 12  # 48-bit hash
HLL_SCALE = 48 - HLL_B + 1  # = 41, the max rho
# floor(alpha_256 * m^2 * 2^41) with alpha_256 as an exact rational.
HLL_C = (7213 * 1000 * HLL_M * HLL_M * HLL_M * (1 << HLL_SCALE)) // (
    10000 * (1000 * HLL_M + 1079)
)
# Small-range (linear counting) threshold: 5m/2.
HLL_SMALL_RANGE = (5 * HLL_M) // 2


def hll_linear_table() -> list[int]:
    """round(m * ln(m/V)) for V = 1..m — the linear-counting lookup,
    computed once driver-side and inlined as a literal in BOTH the
    Spark plan and the SQL oracle so no runtime ln() is ever
    compared across engines. LINEAR_TABLE[m] = 0 (every register
    empty -> cardinality 0)."""
    return [round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)]


def hll_bucket(key: Column) -> Column:
    """Low-b-bits register index of the 48-bit md5 prefix hash."""
    h = F.conv(F.substring(F.md5(key), 1, HLL_HEX_DIGITS), 16, 10).cast("long")
    return F.pmod(h, F.lit(HLL_M).cast("long"))


def hll_rho(key: Column) -> Column:
    """Position of the leftmost 1-bit of the remaining 40 hash bits
    (1-based; 41 when they are all zero): 41 - bitlen(w), with
    bitlen as the minimal-binary-string length — the only portable
    integer bit-length both engines share."""
    h = F.conv(F.substring(F.md5(key), 1, HLL_HEX_DIGITS), 16, 10).cast("long")
    w = (h / F.lit(HLL_M)).cast("long")  # h // 256; h >= 0 so cast-trunc == floor
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    return F.when(w == 0, F.lit(HLL_SCALE)).otherwise(F.lit(HLL_SCALE) - bitlen)


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., bucket, register) sketch rows: MAX rho per bucket.
    ONE partially-aggregated shuffle of (group, bucket, rho) triples;
    at most m rows per group survive. No distinct, no key shuffle —
    duplicates are absorbed by the map-side MAX."""
    group_cols = group_cols or []
    k = F.col(key_col)
    rows = df.select(
        *group_cols,
        hll_bucket(k).alias("bucket"),
        hll_rho(k).alias("rho"),
    )
    return rows.groupBy(*group_cols, "bucket").agg(
        F.max("rho").cast("long").alias("register")
    )


def hll_merge(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union-merge of register frames (pass the unioned frame):
    per-bucket MAX — associative/commutative/idempotent, so shard
    sketches built on any partitioning merge bit-exactly to the
    one-shot sketch (tested)."""
    group_cols = group_cols or []
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("register").cast("long").alias("register")
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., hll_estimate, n_zero_registers) from a register
    frame. Pure integer arithmetic: S rides BIGINT (<= 2^49), the
    raw estimate is one BIGINT floor-division by the plan constant
    HLL_C, and the small-range correction is a literal-array lookup.
    Groups whose register frame is empty produce no row (both
    engines agree: no keys -> no row)."""
    group_cols = group_cols or []
    # one expr() parse for the 256-entry lookup literal: the Column
    # form issued ~512 py4j calls per query build (~0.9 s of pure
    # driver time — the whole "fixed cost" of docs_hll_sketch_only)
    lc = F.expr(
        "array(" + ", ".join(f"{v}L" for v in hll_linear_table()) + ")"
    )
    st = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SCALE} - register)"))
        .cast("long")
        .alias("s_present"),
        F.count(F.lit(1)).cast("long").alias("n_present"),
    )
    v = (F.lit(HLL_M).cast("long") - F.col("n_present")).alias("v")
    s = F.col("s_present") + (F.lit(HLL_M) - F.col("n_present")) * F.lit(
        1 << HLL_SCALE
    ).cast("long")
    est_raw = F.expr(f"CAST({HLL_C} AS BIGINT) div s_total")
    with_s = st.select(*group_cols, v, s.alias("s_total"))
    with_raw = with_s.select(*group_cols, F.col("v"), est_raw.alias("est_raw"))
    corrected = F.when(
        (F.col("est_raw") <= HLL_SMALL_RANGE) & (F.col("v") > 0),
        F.element_at(lc, F.col("v").cast("int")),
    ).otherwise(F.col("est_raw"))
    return with_raw.select(
        *group_cols,
        corrected.cast("long").alias("hll_estimate"),
        F.col("v").cast("long").alias("n_zero_registers"),
    )


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """End-to-end sketch cardinality: registers + estimate."""
    return hll_estimate(hll_registers(df, key_col, group_cols), group_cols)
