from logparserhelper_spark.sinks.writer import write_table  # noqa: F401
