from irclogbot_spark.sinks.elastic import es_doc, es_write_conf, write_to_elasticsearch  # noqa: F401
