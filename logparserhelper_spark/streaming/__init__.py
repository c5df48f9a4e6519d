from logparserhelper_spark.streaming.parse_stream import (  # noqa: F401
    stream_parse_route,
    stream_sink_counts,
)
