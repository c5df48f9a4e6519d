from logparserhelper_spark.sources.transcripts import (  # noqa: F401
    read_dim,
    read_text_logs_as_transcripts,
    read_transcripts,
)
