"""Row-level CDC over the snapshot table
(sinks/hadoop_table.py:read_changes): Iceberg's create_changelog_view
semantics — per-snapshot insert/delete rows with carry-over elimination,
exact across the full mutation family (append, CoW delete, MoR
position/equality deletes, upsert, compact, rollback, schema evolution).

The strongest check here is the REPLAY oracle: applying the changelog
from an empty state (multiset add on insert, multiset remove on delete)
must reproduce the final table exactly.

Reference parity note: the reference app (MaksimBrezho/logparserhelper)
has no table layer — its persistence is whole-file JSON overwrite
(utils/json_utils.py:21-27).
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


def _replay_equals_final(t, from_version=0):
    """Apply the changelog from empty: for every distinct row, inserts
    minus deletes must equal its multiplicity in the final table."""
    data_cols = t.read().columns
    ch = t.read_changes(from_version)
    net = (
        ch.groupBy(*data_cols)
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("n")
        )
        .filter("n != 0")
    )
    final = t.read().groupBy(*data_cols).agg(F.count("*").alias("n"))
    assert _rows(net) == _rows(final)


def test_changes_append_only_equals_incremental(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "ta"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    ch = t.read_changes(0)
    assert {r["_change_type"] for r in ch.collect()} == {"insert"}
    assert _rows(ch.select("id", "v")) == _rows(t.read())
    # version stamps match the snapshot that added each row
    byv = {r["id"]: r["_change_version"] for r in ch.collect()}
    assert byv == {1: 1, 2: 1, 3: 2}
    # range scoping: only v2's delta
    assert _rows(t.read_changes(1).select("id", "v")) == _rows(
        t.read_incremental(1)
    )
    _replay_equals_final(t)


def test_changes_cow_delete_scopes_and_cancels_carryover(spark, tmp_path):
    """A CoW delete rewrites whole files; the changelog must emit ONLY
    the rows that actually vanished, not the rewritten survivors."""
    t = HadoopTable(spark, str(tmp_path / "tc"))
    t.append(
        spark.createDataFrame(
            [(i, "v%d" % i) for i in range(20)], "id long, v string"
        )
    )
    t.delete([("id", "<", 3)])  # copy-on-write
    ch = t.read_changes(1)
    got = sorted(
        (r["_change_type"], r["id"]) for r in ch.collect()
    )
    assert got == [("delete", 0), ("delete", 1), ("delete", 2)]
    _replay_equals_final(t)


def test_changes_mor_position_delete_materializes_rows(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "tm"))
    t.append(
        spark.createDataFrame(
            [(i, "v%d" % i) for i in range(10)], "id long, v string"
        )
    )
    t.delete([("id", "=", 4)], mode="merge-on-read")
    ch = t.read_changes(1)
    assert [(r["_change_type"], r["id"], r["v"]) for r in ch.collect()] == [
        ("delete", 4, "v4")
    ]
    _replay_equals_final(t)


def test_changes_mor_upsert_emits_delete_insert_pair(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "tu"))
    t.append(
        spark.createDataFrame(
            [(1, "old"), (2, "keep")], "id long, v string"
        )
    )
    t.upsert(
        spark.createDataFrame([(1, "NEW"), (3, "add")], "id long, v string"),
        key_cols=["id"],
        mode="merge-on-read",
    )
    ch = sorted(
        (r["_change_type"], r["id"], r["v"])
        for r in t.read_changes(1).collect()
    )
    # updated key 1: delete(old)+insert(NEW); new key 3: insert; key 2 silent
    assert ch == [
        ("delete", 1, "old"),
        ("insert", 1, "NEW"),
        ("insert", 3, "add"),
    ]
    _replay_equals_final(t)


def test_changes_cow_upsert_and_compact_silent(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "tw"))
    t.append(
        spark.createDataFrame(
            [(i, "v%d" % i) for i in range(50)], "id long, v string"
        )
    )
    t.upsert(
        spark.createDataFrame([(7, "SEVEN")], "id long, v string"),
        key_cols=["id"],
    )  # copy-on-write rewrite of the hit file
    v_up = t.current_version()
    t.compact(target_file_bytes=1 << 20)
    ch_up = sorted(
        (r["_change_type"], r["id"], r["v"])
        for r in t.read_changes(1, v_up).collect()
    )
    assert ch_up == [("delete", 7, "v7"), ("insert", 7, "SEVEN")]
    # compaction is data-preserving: zero changelog rows
    assert t.read_changes(v_up).count() == 0
    _replay_equals_final(t)


def test_changes_rollback_and_schema_evolution(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "tr"))
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.append(
        spark.createDataFrame(
            [(2, "b", 9)], "id long, v string, extra long"
        )
    )  # additive evolution
    # evolution first: the changelog up to v2 carries the evolved column,
    # null-filled for pre-evolution rows
    full = t.read_changes(0, 2)
    assert "extra" in full.columns
    got = {r["id"]: r["extra"] for r in full.collect()}
    assert got == {1: None, 2: 9}

    t.rollback(1)
    # output schema is the TO snapshot's schema — the rollback reverted
    # the evolution, so its delta reports the vanished row in v1's shape
    ch = t.read_changes(2)
    assert "extra" not in ch.columns
    assert sorted(
        (r["_change_type"], r["id"], r["v"]) for r in ch.collect()
    ) == [("delete", 2, "b")]
    _replay_equals_final(t)


def test_changes_empty_range_typed(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "te"))
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    v = t.current_version()
    df = t.read_changes(v, v)
    assert df.count() == 0
    assert set(df.columns) == {
        "id",
        "v",
        "_change_type",
        "_change_version",
        "_committed_at",
    }
    with pytest.raises(ValueError, match=">"):
        t.read_changes(5, 1)
