"""SQL surface: corpus + irclog as temp views, queried via spark.sql."""

from __future__ import annotations

from irclogbot_spark.sql import register_views, sql

SF = "/root/testdata/sf0.001"


def test_register_and_query_views(spark):
    names = register_views(spark, SF)
    assert "irclog" in names and "lineitem" in names
    top = sql(
        spark,
        """
        SELECT channel, COUNT(*) AS n FROM irclog
        GROUP BY channel ORDER BY n DESC, channel LIMIT 3
        """,
    ).collect()
    assert len(top) == 3 and top[0].n >= top[-1].n
    joined = sql(
        spark,
        """
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
    ).count()
    assert joined > 0


def test_approx_stats_within_tolerance(spark):
    """HLL++ distinct and percentile sketches land within documented
    error of the exact values computed in the same row."""
    from irclogbot_spark.queries import queries

    r = queries()["events_approx_stats"](spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_rows > 0
    assert abs(r.approx_users - r.exact_users) <= 0.05 * r.exact_users
    for a, e in zip(r.approx_pcts, r.exact_pcts):
        # percentile_approx with accuracy=10000 on this data: tight
        assert abs(a - e) <= 0.02 * 3600
