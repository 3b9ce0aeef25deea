"""operators/geo.py behavior: exact integer distance filtering,
grid-cell bucketing, and the synthetic point derivation."""

from __future__ import annotations

from pyspark.sql import functions as F

from irclogbot_spark.operators.geo import (
    LAT_MULT,
    LAT_SPAN,
    LON_MULT,
    LON_SPAN,
    geo_distance_filter,
    geotile_cells,
    synthetic_point,
)


def _pt(key: int) -> tuple[int, int]:
    lat = (key * LAT_MULT) % LAT_SPAN - LAT_SPAN // 2
    lon = (key * LON_MULT) % LON_SPAN - LON_SPAN // 2
    return lat, lon


def test_synthetic_point_matches_python_and_spreads(spark):
    keys = list(range(200))
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    lat, lon = synthetic_point("user_id")
    got = {
        r.user_id: (r.lat_micro, r.lon_micro)
        for r in df.select("user_id", lat, lon).collect()
    }
    assert got == {k: _pt(k) for k in keys}
    # small key ranges must still cover the globe (the reason for
    # the large multipliers): at least half of both hemispheres hit
    lats = [v[0] for v in got.values()]
    lons = [v[1] for v in got.values()]
    assert min(lats) < -LAT_SPAN // 4 and max(lats) > LAT_SPAN // 4
    assert min(lons) < -LON_SPAN // 4 and max(lons) > LON_SPAN // 4


def test_geo_distance_filter_matches_brute_force(spark):
    keys = list(range(500))
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    lat, lon = synthetic_point("user_id")
    pts = df.select("user_id", lat, lon)
    r = 40_000_000
    clat, clon = 10_000_000, -20_000_000
    got = {row.user_id for row in geo_distance_filter(pts, clat, clon, r).collect()}
    want = {
        k
        for k in keys
        if (_pt(k)[1] - clon) ** 2 + (_pt(k)[0] - clat) ** 2 <= r * r
    }
    assert got == want and 0 < len(want) < len(keys)
    # the bounding box never cuts a qualifying point: corner points
    # at exactly r on one axis survive
    one_axis = spark.createDataFrame(
        [(1, clat, clon + r), (2, clat + r, clon), (3, clat, clon + r + 1)],
        "user_id long, lat_micro long, lon_micro long",
    )
    ids = {row.user_id for row in geo_distance_filter(one_axis, clat, clon, r).collect()}
    assert ids == {1, 2}


def test_geotile_cells_floor_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, -LAT_SPAN // 2, -LON_SPAN // 2),  # global min corner -> (0, 0)
            (2, LAT_SPAN // 2 - 1, LON_SPAN // 2 - 1),  # max corner
            (3, -1, -1),  # just below the offset midpoint
            (4, 0, 0),
        ],
        "user_id long, lat_micro long, lon_micro long",
    )
    out = {
        r.user_id: (r.cell_x, r.cell_y)
        for r in geotile_cells(df, 10_000_000, 30_000_000).collect()
    }
    assert out[1] == (0, 0)
    assert out[2] == (LON_SPAN // 30_000_000 - 1, LAT_SPAN // 10_000_000 - 1)
    assert out[3] == ((LON_SPAN // 2 - 1) // 30_000_000, (LAT_SPAN // 2 - 1) // 10_000_000)
    assert out[4] == (LON_SPAN // 2 // 30_000_000, LAT_SPAN // 2 // 10_000_000)


def test_search_after_walk_covers_everything(spark):
    """events_search_after semantics: walking pages by feeding each
    page's last (ts, event_id) back as the cursor visits every event
    exactly once in (ts, event_id) order — the keyset-pagination
    invariant (OFFSET pagination can skip/dup under concurrent
    writes; keyset cannot)."""
    import datetime

    from pyspark.sql import functions as F

    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i % 5), i % 24, 0, 0), i % 3)
        for i in range(97)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    full = [
        (r.ts, r.event_id)
        for r in ev.orderBy("ts", "event_id").collect()
    ]

    got = []
    cur = (datetime.datetime(1970, 1, 1), -1)
    while True:
        after = (F.col("ts") > F.lit(cur[0])) | (
            (F.col("ts") == F.lit(cur[0])) & (F.col("event_id") > cur[1])
        )
        page = ev.filter(after).orderBy("ts", "event_id").limit(10).collect()
        if not page:
            break
        got.extend((r.ts, r.event_id) for r in page)
        cur = (page[-1].ts, page[-1].event_id)
    assert got == full
