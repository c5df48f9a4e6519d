from logparserhelper_spark.sinks.writer import write_table  # noqa: F401
from logparserhelper_spark.sinks.hadoop_table import HadoopTable  # noqa: F401
from logparserhelper_spark.sinks.table_sql import table_sql  # noqa: F401
