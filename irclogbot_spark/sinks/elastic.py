"""Elasticsearch sink adapter (K1/H3 — the reference's primary sink).

The reference PUTs one doc per message with the content hash as _id
(irclogbot.py:50-51), which is what makes redelivery and restart safe
(H3). Two adapters:

* es-spark connector config (``es_write_conf``): the production path
  — the connector bulk-writes executor-side with es.mapping.id=id, so
  every partition streams straight to ES shards, no driver choke
  point. Needs the org.elasticsearch:elasticsearch-spark jar on the
  cluster.
* ``write_to_elasticsearch``: a foreachBatch/batch fallback using the
  Python elasticsearch client per partition, gated behind an
  import-try (the client is not installed in this environment — the
  call path raises a clear error; everything up to the network call
  is testable).

In this repo's test harness the keyed-parquet sink
(streaming.pipeline.keyed_upsert_batch) stands in for ES — same
idempotent-by-content-id contract, verifiable offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from irclogbot_spark.functions.scalar import iso_posted

ES_INDEX = "irclog"  # irclogbot.py:50


def es_write_conf(
    host: str, index: str = ES_INDEX, id_col: str = "id"
) -> dict[str, str]:
    """Connector options for df.write.format('org.elasticsearch.spark.sql').

    es.mapping.id makes the write an idempotent keyed upsert — the
    Spark-native form of the reference's PUT-by-content-hash.
    """
    return {
        "es.nodes": host,
        "es.resource": index,
        "es.mapping.id": id_col,
        "es.write.operation": "index",  # PUT semantics: overwrite on id
        "es.batch.write.retry.count": "5",  # MAX_RETRIES, irclogbot.py:22
    }


def es_doc(df: DataFrame) -> DataFrame:
    """Shape rows as reference-compatible ES documents: the 5 doc
    fields with posted serialized '%Y-%m-%dT%H:%M:%S' (P5,
    irclogbot.py:42-43)."""
    return df.select(
        "channel", "nick", iso_posted("posted").alias("posted"), "remark", "id"
    )


def write_to_elasticsearch(
    df: DataFrame, host: str, index: str = ES_INDEX, chunk_size: int = 500
) -> None:
    """Fallback bulk writer: per-partition Python client, bulk index
    with _id = content hash. Raises ImportError where the client is
    unavailable (this environment) — the document shaping above it is
    covered by tests."""
    docs = es_doc(df)

    def write_partition(rows) -> None:
        try:
            from elasticsearch import Elasticsearch, helpers  # type: ignore
        except ImportError as e:  # pragma: no cover - env without client
            raise ImportError(
                "elasticsearch client not installed; use the es-spark "
                "connector (es_write_conf) or the keyed parquet sink"
            ) from e
        client = Elasticsearch(host)
        actions = (
            {"_index": index, "_id": r["id"], "_source": r.asDict()} for r in rows
        )
        helpers.bulk(client, actions, chunk_size=chunk_size)

    docs.foreachPartition(write_partition)
