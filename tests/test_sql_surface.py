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
