from irclogbot_spark.streaming.pipeline import (  # noqa: F401
    read_raw_lines_stream,
    start_irclog_stream,
    streaming_irclog,
)
