"""SQL surface: register the corpus + derived irclog as temp views so
the whole engine is queryable with plain ``spark.sql`` — the Spark
analog of pointing Kibana/clients at the reference's ES index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from irclogbot_spark import synth
from irclogbot_spark.sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, include_irclog: bool = True) -> list[str]:
    """Create temp views for every corpus table (and the derived
    irclog); returns the view names."""
    names = []
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    if include_irclog:
        synth.irclog(spark, sf_dir).createOrReplaceTempView("irclog")
        names.append("irclog")
    return names


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin passthrough — the engine's SQL entry point IS Spark SQL."""
    return spark.sql(query)
