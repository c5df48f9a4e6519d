"""Bucketed tables: the co-located join path for 100 TB fact-fact joins.

Writing both sides with the same bucketBy spec lets SortMergeJoin consume
the bucket layout directly — no shuffle exchange on either side. This is
the layout `sources/transcripts.py` prescribes for the production
transcripts table (bucket(conv_id)); here it is pinned as an executable
property, not just a docstring claim.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_tables_join_without_shuffle(spark, tmp_path, no_broadcast):
    left = spark.range(0, 20000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("v1")
    )
    right = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("k"), (F.col("id") * 2).alias("v2")
    )
    for name, df, sub in (("bk_l", left, "l"), ("bk_r", right, "r")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / sub))
            .mode("overwrite")
            .saveAsTable(name)
        )
    try:
        j = spark.table("bk_l").join(spark.table("bk_r"), "k")
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucket layout reused
        # correctness: equals the plain (shuffled) join
        assert n == left.join(right, "k").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_l")
        spark.sql("DROP TABLE IF EXISTS bk_r")


def test_bucketed_aggregation_without_shuffle(spark, tmp_path, no_broadcast):
    """groupBy on the bucket key also reuses the layout — partial and final
    aggregation collapse into one stage with no exchange."""
    df = spark.range(0, 20000).select(
        (F.col("id") % 499).alias("k"), F.col("id").alias("v")
    )
    spark.sql("DROP TABLE IF EXISTS bk_agg")
    (
        df.write.bucketBy(8, "k")
        .option("path", str(tmp_path / "agg"))
        .mode("overwrite")
        .saveAsTable("bk_agg")
    )
    try:
        agg = spark.table("bk_agg").groupBy("k").agg(F.sum("v").alias("s"))
        rows = agg.count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert rows == 499
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_agg")


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    """Hive-style partitioned layout + a partition-key filter: the scan must
    prune to the matching directory (PartitionFilters in the plan, not a
    post-scan Filter over all files)."""
    df = spark.range(0, 3000).select(
        (F.col("id") % 5).cast("string").alias("etype"), F.col("id").alias("v")
    )
    out = str(tmp_path / "parts")
    df.write.mode("overwrite").partitionBy("etype").parquet(out)
    q = spark.read.parquet(out).filter(F.col("etype") == "3")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "etype" in plan.split("PartitionFilters")[1][:120]
    assert q.count() == 600
    # and column pruning: selecting one column reads one column
    q2 = spark.read.parquet(out).select("v")
    scan = q2._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<v:bigint>" in scan


def test_ngram_top_similar_reuses_shingle_exchange_at_runtime(spark):
    """The static ngram_top_similar plan shows the shingle-aggregation
    subtree twice (sizes + intersections both read it); the one-pass claim
    relies on AQE exchange reuse AT RUNTIME. Pin it: the executed adaptive
    plan must contain ReusedExchange nodes, proving the posting-list
    aggregation was computed once."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    from logparserhelper_spark.plans.contract_queries import QUERIES

    df = QUERIES["ngram_top_similar"](spark, sf)
    assert len(df.collect()) > 0  # collect() executes THIS df's plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1, plan[:2000]


def test_repartition_for_file_size_controls_file_count(spark, tmp_path):
    """The small-files lever: file count tracks ceil(bytes / target)."""
    import glob

    from logparserhelper_spark.sinks.writer import repartition_for_file_size

    df = spark.range(10_000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("payload")
    )
    # ~80 bytes/row, tiny 100KB target -> ~8 partitions/files
    out1 = str(tmp_path / "many")
    repartition_for_file_size(df, 10_000, 80, target_file_bytes=100_000).write.mode(
        "overwrite"
    ).parquet(out1)
    n_many = len(glob.glob(out1 + "/part-*"))
    assert n_many == 8
    # huge target -> exactly one file
    out2 = str(tmp_path / "one")
    repartition_for_file_size(df, 10_000, 80).write.mode("overwrite").parquet(out2)
    assert len(glob.glob(out2 + "/part-*")) == 1
    # clustered variant keeps one key's rows in one file
    out3 = str(tmp_path / "clustered")
    dfk = df.withColumn("k", F.col("id") % 4)
    repartition_for_file_size(
        dfk, 10_000, 80, target_file_bytes=100_000, cluster_cols=["k"]
    ).write.mode("overwrite").parquet(out3)
    per_file_keys = [
        {r.k for r in spark.read.parquet(f).select("k").distinct().collect()}
        for f in glob.glob(out3 + "/part-*")
    ]
    nonempty = [s for s in per_file_keys if s]
    seen = {}
    for i, s in enumerate(nonempty):
        for k in s:
            assert k not in seen, "one key split across files"
            seen[k] = i
