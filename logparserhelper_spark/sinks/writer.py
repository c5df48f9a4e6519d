"""Sink writer: Iceberg when a catalog is configured, parquet fallback.

Production target (north rule): per-sink Iceberg tables with
REPLACE-partition commits — ``df.writeTo(table).overwritePartitions()`` is
atomic per snapshot, which is what makes the bucket-level resume protocol
exactly-once. The sandbox image ships no Iceberg jars/catalog, so the
default path is directory parquet with mode=overwrite (idempotent at the
bucket granularity the pipeline commits at, since a bucket directory is
rewritten wholesale and the progress marker lands only after success).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def iceberg_available(spark) -> bool:
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def iceberg_writer(df: DataFrame, name: str, partition_by: list[str] | None = None):
    """DataFrameWriterV2 builder for the Iceberg path. Partitioning is fixed
    at table creation for Iceberg, so the partition spec must land on the
    create-or-replace builder — dropping it would silently produce an
    unpartitioned table."""
    w = df.writeTo(name).using("iceberg")
    if partition_by:
        w = w.partitionedBy(*[F.col(c) for c in partition_by])
    return w


def repartition_for_file_size(
    df: DataFrame,
    approx_rows: int,
    avg_row_bytes: int,
    target_file_bytes: int = 128 << 20,
    cluster_cols: list[str] | None = None,
) -> DataFrame:
    """Size the write so output files land near ``target_file_bytes`` —
    the small-files lever: at 100 TB a per-task write under the default
    shuffle partitioning produces millions of KB-scale files that crush
    the table metadata layer and every subsequent scan's task scheduler.

    ``n = ceil(approx_rows * avg_row_bytes / target)`` output partitions;
    with ``cluster_cols`` the repartition hashes on them (rows of one key
    co-locate into one file — right for partition-pruned sinks), otherwise
    round-robin for maximally even file sizes. Estimates come from the
    caller (pipeline metrics / a prior observe()), not a driver sample —
    sizing must not cost an extra scan."""
    import math

    n = max(1, math.ceil(approx_rows * max(1, avg_row_bytes) / target_file_bytes))
    if cluster_cols:
        return df.repartition(n, *[F.col(c) for c in cluster_cols])
    return df.repartition(n)


def write_table(
    df: DataFrame,
    target: str,
    partition_by: list[str] | None = None,
    iceberg: bool | None = None,
    mode: str = "overwrite",
) -> None:
    """target: ``iceberg:<catalog.db.table>`` (real catalog),
    ``table:<path>`` (the snapshot-table shim — Iceberg HadoopTables
    commit semantics over parquet, sinks/hadoop_table.py), or a plain
    filesystem path (directory parquet). ``mode`` maps onto the snapshot
    operation for table targets: ``overwrite`` -> dynamic partition
    REPLACE when partitioned (overwrite-all otherwise), ``append`` ->
    snapshot append."""
    use_iceberg = target.startswith("iceberg:") if iceberg is None else iceberg
    if use_iceberg:
        name = target.split(":", 1)[1]
        iceberg_writer(df, name, partition_by).createOrReplace()
        return
    if target.startswith("table:"):
        from logparserhelper_spark.sinks.hadoop_table import HadoopTable

        if mode not in ("append", "overwrite"):
            # "error"/"ignore" express existence semantics the snapshot
            # table does not implement — refusing beats silently replacing
            # partitions a caller asked errorifexists to protect
            raise ValueError(
                f"table: targets support mode 'append' or 'overwrite', got {mode!r}"
            )
        t = HadoopTable(df.sparkSession, target.split(":", 1)[1])
        if mode == "append":
            t.append(df, partition_by)
        elif partition_by:
            t.replace_partitions(df, partition_by)
        else:
            t.overwrite_all(df, partition_by)
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
