"""sparklog — a PySpark-native log-analytics engine.

Re-expresses the capabilities of the reference IRC-logging pipeline
(EdLeafe/irclogbot, surveyed in SURVEY.md) as idiomatic Spark:
composable batch/stream-agnostic DataFrame transforms for ingest
(irclogbot_spark.ingest), a query library for the implied
Elasticsearch analytics surface plus a TPC-H-ish corpus
(irclogbot_spark.queries / .oracles), scale-oriented dedup /
similarity / text-analysis operators (irclogbot_spark.operators),
and a Structured Streaming twin of the batch ingest path
(irclogbot_spark.streaming).
"""

__version__ = "0.1.0"
