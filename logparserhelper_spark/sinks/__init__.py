from logparserhelper_spark.sinks.writer import write_table  # noqa: F401
from logparserhelper_spark.sinks.hadoop_table import (  # noqa: F401
    HadoopTable,
    table_batch_sink,
    table_cdc_sink,
    table_upsert_sink,
)
from logparserhelper_spark.sinks.table_sql import table_sql  # noqa: F401
from logparserhelper_spark.sinks.catalog import (  # noqa: F401
    HadoopCatalog,
    create_table_at,
)
