"""Geo query operators — the ES geo surface (geo_distance filter,
geotile_grid aggregation) re-expressed as exact integer arithmetic
over micro-degree coordinates.

Why integers: a haversine in doubles can never value-hash against a
cross-engine oracle (libm sin/cos differ in the last ulp, and a
boundary point flips the filter). Micro-degrees (1e-6°, the OSM
convention — int32-representable, ~11 cm resolution) make distance
and cell math BIGINT-exact in both Spark and ANSI SQL, while keeping
the plan shapes the real geo path uses: a rectangular bounding-box
prefilter that pushes into the scan (on a geo-partitioned layout it
prunes files), then the exact per-row check; grid cells are floor
divisions of non-negative offsets.

The test corpus has no geo columns, so :func:`synthetic_point`
derives a deterministic point from an integer key (multiplicative
LCG constants, modulo the degree span) — both engines replay it
exactly; a real deployment replaces it with its lat/lon columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: full micro-degree spans
LAT_SPAN = 180_000_000
LON_SPAN = 360_000_000

#: large odd multipliers (Knuth's 32-bit golden-ratio constant and
#: xxhash's PRIME32_2 — cited-everywhere public values), chosen >>
#: the degree span so even a SMALL key range spreads across the
#: whole globe (a span-sized multiplier would leave low keys
#: clustered in one corner)
LAT_MULT = 2_654_435_761
LON_MULT = 2_246_822_519


def synthetic_point(key: Column | str) -> tuple[Column, Column]:
    """Deterministic (lat_micro, lon_micro) from a non-negative
    integer key. BIGINT-safe: key * mult stays far below 2^63 for
    any realistic key, and ``%`` on non-negative operands is
    identical in Spark and ANSI SQL."""
    k = F.col(key).cast("long") if isinstance(key, str) else key.cast("long")
    lat = (k * LAT_MULT) % LAT_SPAN - LAT_SPAN // 2
    lon = (k * LON_MULT) % LON_SPAN - LON_SPAN // 2
    return lat.alias("lat_micro"), lon.alias("lon_micro")


def geo_distance_filter(
    df: DataFrame,
    center_lat: int,
    center_lon: int,
    radius_micro: int,
    lat_col: str = "lat_micro",
    lon_col: str = "lon_micro",
) -> DataFrame:
    """ES geo_distance analog: rows whose point lies within
    ``radius_micro`` of the center (planar L2 on micro-degrees —
    exact BIGINT; |Δ| ≤ 1.8e8 so Δ² ≤ 3.24e16 and the sum is far
    inside int64).

    Plan shape: the BOUNDING BOX (four plain comparisons) goes first
    — those predicates push into the scan and, at rest on a
    geo-bucketed layout, prune whole files; only box survivors pay
    the multiply. Map-only, zero shuffle."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    box = (
        (lat >= center_lat - radius_micro)
        & (lat <= center_lat + radius_micro)
        & (lon >= center_lon - radius_micro)
        & (lon <= center_lon + radius_micro)
    )
    dx = lon - center_lon
    dy = lat - center_lat
    # the r**2 literal is computed driver-side: F.lit(r) * F.lit(r)
    # would be an INT32 multiply (9e14 overflows it under ANSI mode)
    return df.filter(box).filter(
        dx * dx + dy * dy <= F.lit(int(radius_micro) * int(radius_micro))
    )


def geotile_cells(
    df: DataFrame,
    lat_cell: int,
    lon_cell: int,
    lat_col: str = "lat_micro",
    lon_col: str = "lon_micro",
) -> DataFrame:
    """ES geotile_grid analog: bucket every point into a fixed grid
    cell. Offsets shift to NON-NEGATIVE before the floor division —
    Spark's DIV truncates toward zero while other engines floor, so
    negative coordinates would bucket differently; on non-negative
    ints the two agree. The division is pure-integer (subtract the
    modulus first), never a double quotient. Adds (cell_x, cell_y);
    map-only."""

    def _idiv(num: Column, den: int) -> Column:
        return ((num - num % den) / den).cast("long")

    lat_off = F.col(lat_col) + LAT_SPAN // 2
    lon_off = F.col(lon_col) + LON_SPAN // 2
    return df.withColumn("cell_y", _idiv(lat_off, lat_cell)).withColumn(
        "cell_x", _idiv(lon_off, lon_cell)
    )
