"""Metadata tables on the snapshot table (sinks/hadoop_table.py:inspect):
Iceberg's ``table$snapshots`` / ``$files`` / ``$partitions`` / ``$history``
/ ``$refs`` family as DataFrames, so table state is queryable with the
same engine as table data.

Reference parity note: the reference app (MaksimBrezho/logparserhelper)
has no table layer — its persistence is whole-file JSON overwrite
(utils/json_utils.py:21-27). This suite pins the Spark-first metadata
inspection surface over the shim's manifest chain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logparserhelper_spark.sinks.hadoop_table import HadoopTable


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def test_inspect_snapshots_and_history(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "ti"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    t.delete([("id", "=", 1)], mode="merge-on-read")

    snaps = t.inspect("snapshots")
    got = {r["version"]: r for r in snaps.collect()}
    assert sorted(got) == [1, 2, 3]
    assert got[1]["parent"] is None and got[2]["parent"] == 1
    assert got[1]["operation"] == "append"
    assert got[3]["operation"] == "delete"
    assert got[3]["delete_files"] >= 1
    assert got[3]["records"] == 2  # live rows after the MoR delete
    assert got[2]["committed_at"] >= got[1]["committed_at"]
    # summary map is stringly-typed and queryable
    assert got[1]["summary"].get("added_records") == "2"

    hist = t.inspect("history")
    assert [r["version"] for r in hist.collect()] == [1, 2, 3]
    # the two metadata tables agree on the log
    assert (
        snaps.select("version", "operation").subtract(
            hist.select("version", "operation")
        ).count()
        == 0
    )


def test_inspect_files_and_partitions_agree(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "tp"))
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2), "x" * 20) for i in range(40)],
        "id long, sink string, v string",
    )
    t.append(df, partition_cols=["sink"])
    t.append(df.filter("id < 10"), partition_cols=["sink"])

    files = t.inspect("files")
    assert files.filter("content = 'data'").count() == len(
        t.snapshot().data_files
    )
    r = files.filter("content = 'data'").collect()[0]
    # footer metrics surfaced as maps (stringified bounds, typed nulls)
    assert "id" in r["lower_bounds"] and "id" in r["upper_bounds"]
    assert int(r["lower_bounds"]["id"]) <= int(r["upper_bounds"]["id"])
    assert r["null_counts"]["id"] == 0
    assert r["records"] > 0 and r["bytes"] > 0

    # $partitions must equal a SQL aggregation over $files — the
    # join-them-with-the-same-engine contract
    agg = _rows(
        files.filter("content = 'data'")
        .groupBy(F.col("partition")["sink"].alias("sink"))
        .agg(
            F.count("*").alias("data_file_count"),
            F.sum("records").alias("record_count"),
            F.sum("bytes").alias("total_bytes"),
        )
    )
    parts = _rows(
        t.inspect("partitions").select(
            F.col("partition")["sink"],
            "data_file_count",
            "record_count",
            "total_bytes",
        )
    )
    assert agg == parts
    # and the partition record totals match the real table
    assert sum(p[2] for p in parts) == t.read().count()

    # time travel: v1 lists only the first append's files
    assert t.inspect("files", version=1).count() == len(
        t.snapshot(1).data_files
    )


def test_inspect_refs_lists_tags_and_branches(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "tr"))
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.create_tag("v1-audit")
    b = t.create_branch("wip")
    b.append(spark.createDataFrame([(2, "b")], "id long, v string"))

    refs = {r["name"]: r for r in t.inspect("refs").collect()}
    assert refs["v1-audit"]["type"] == "tag"
    assert refs["v1-audit"]["version"] == 1
    assert refs["wip"]["type"] == "branch"
    assert refs["wip"]["version"] == b.current_version()


def test_inspect_empty_table_and_unknown_name(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "te"))
    for name in (
        "snapshots", "files", "manifests", "partitions", "history", "refs"
    ):
        df = t.inspect(name)
        assert df.count() == 0
        assert len(df.schema.fields) >= 3  # typed, not degenerate
    with pytest.raises(ValueError, match="unknown metadata table"):
        t.inspect("nope")


def test_inspect_schema_table(spark, tmp_path):
    from logparserhelper_spark.sinks.hadoop_table import HadoopTable

    t = HadoopTable(spark, str(tmp_path / "ts"))
    t.append(spark.createDataFrame([(1, "a")], "k int, v string"))
    t.rename_column("v", "val")
    t.add_column("lang", "string", default="en")
    rows = {r.name: r for r in t.inspect("schema").collect()}
    assert rows["val"].field_id == 2  # rename kept the id
    assert rows["lang"].default == "en"
    assert rows["k"].default is None
    assert rows["k"].id_epoch == rows["lang"].id_epoch is not None
    # time travel shows the pre-rename shape
    old = {r.name for r in t.inspect("schema", version=1).collect()}
    assert old == {"k", "v"}


def test_inspect_schema_empty_table(spark, tmp_path):
    from logparserhelper_spark.sinks.hadoop_table import HadoopTable

    t = HadoopTable(spark, str(tmp_path / "nothing"))
    df = t.inspect("schema")
    assert df.count() == 0
    assert "field_id" in df.columns  # correctly typed, not an error
