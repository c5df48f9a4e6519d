"""add_files in-place migration (sinks/hadoop_table.py:add_files):
register existing hive-layout parquet into the snapshot table without
rewriting data — hardlinks, footer/bloom harvest at registration, strict
schema/partition validation, the Iceberg add_files/migrate onboarding
path.

Reference parity note: the reference app (MaksimBrezho/logparserhelper)
ingests by reading whole files into memory (gui/app_window.py); zero-copy
registration is part of the Spark-first table surface replacing that."""

from __future__ import annotations

import os

import pytest

from logparserhelper_spark.sinks.hadoop_table import HadoopTable
from logparserhelper_spark.sinks.table_sql import table_sql


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def _source(spark, tmp_path, name="src", partitioned=True, n=12):
    """A plain hive-layout parquet directory (what an existing corpus
    looks like before migration)."""
    src = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, f"d-{i:04d}", str(i % 3)) for i in range(n)],
        "id long, doc string, shard string",
    )
    w = df.coalesce(2).write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("shard")
    w.parquet(src)
    return src, df


def test_add_files_creates_table_zero_copy(spark, tmp_path):
    src, df = _source(spark, tmp_path)
    loc = str(tmp_path / "t")
    t = HadoopTable(spark, loc)
    s = t.add_files(src)
    assert s.operation == "append"
    assert s.summary["add_files_mode"] == "link"
    assert _rows(t.read()) == _rows(df)
    # zero-copy: every registered file shares its inode with a source file
    src_inodes = set()
    for dirpath, _d, names in os.walk(src):
        src_inodes.update(
            os.stat(os.path.join(dirpath, f)).st_ino
            for f in names
            if f.endswith(".parquet")
        )
    for f in s.data_files:
        assert os.stat(os.path.join(t.root, f.path)).st_ino in src_inodes
    # partition dirs became real partition metadata
    assert all(set(f.partition) == {"shard"} for f in s.data_files)
    assert t.read(predicate=[("shard", "=", "1")]).count() == 4
    # footer stats harvested at registration: metrics skipping works
    assert len(t.plan_files(predicate=[("id", ">=", 1000)])) == 0


def test_add_files_into_existing_table_and_ownership(spark, tmp_path):
    """Appending a second corpus to a live table; dropping the SOURCE
    afterwards must not affect the table (hardlink ownership)."""
    import shutil

    src1, df1 = _source(spark, tmp_path, "s1")
    src2, _ = _source(spark, tmp_path, "s2", n=6)
    loc = str(tmp_path / "t2")
    t = HadoopTable(spark, loc)
    t.add_files(src1)
    t.add_files(src2)
    assert t.read().count() == 18
    shutil.rmtree(src2)
    assert t.read().count() == 18  # table owns its links
    # and the registered data composes with normal table ops
    t.delete([("id", "=", 0)])
    assert t.read().count() == 16  # id=0 existed in both corpora
    t.compact()
    assert t.read().count() == 16


def test_add_files_blooms_harvested_at_registration(spark, tmp_path):
    src, _ = _source(spark, tmp_path, "sb", partitioned=False)
    loc = str(tmp_path / "tb")
    t = HadoopTable(spark, loc)
    # property must exist BEFORE registration: create, configure, add
    t.add_files(src)  # creates the table (no bloom config yet)
    t.set_properties({"write.metadata.bloom-filter-columns": "doc"})
    src2, _ = _source(spark, tmp_path, "sb2", partitioned=False, n=6)
    s = t.add_files(src2)
    new = [f for f in s.data_files if f.blooms]
    assert new and all("doc" in f.blooms for f in new)


def test_add_files_strict_validation(spark, tmp_path):
    src, _ = _source(spark, tmp_path, "sv")
    loc = str(tmp_path / "tv")
    t = HadoopTable(spark, loc)
    with pytest.raises(ValueError, match="no such source"):
        t.add_files(str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="no parquet files"):
        os.makedirs(str(tmp_path / "empty"))
        t.add_files(str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="unknown add_files mode"):
        t.add_files(src, mode="move")
    t.add_files(src)
    # mismatched schema source against the existing table
    bad = str(tmp_path / "bad")
    spark.createDataFrame(
        [(1, 2.5, "0")], "id long, doc double, shard string"
    ).write.partitionBy("shard").parquet(bad)
    with pytest.raises(ValueError, match="source schema differs"):
        t.add_files(bad)
    # mismatched partitioning
    flat = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, "x", "0")], "id long, doc string, shard string"
    ).write.parquet(flat)
    with pytest.raises(ValueError, match="source partitions"):
        t.add_files(flat)
    # partition column duplicated inside the file bytes
    dup = str(tmp_path / "dup")
    os.makedirs(os.path.join(dup, "shard=0"))
    spark.createDataFrame(
        [(1, "x", "0")], "id long, doc string, shard string"
    ).coalesce(1).write.parquet(os.path.join(dup, "shard=0", "x"))
    with pytest.raises(ValueError, match="non-hive subdirectory"):
        t.add_files(dup)


def test_add_files_mixed_schema_sources_refused(spark, tmp_path):
    mixed = str(tmp_path / "mixed")
    spark.createDataFrame([(1, "a")], "id long, doc string").coalesce(
        1
    ).write.parquet(os.path.join(mixed, "p1"))
    # second directory with a different schema — but nested non-hive
    # dirs are refused even before the schema check
    with pytest.raises(ValueError, match="non-hive subdirectory"):
        HadoopTable(spark, str(tmp_path / "tm")).add_files(mixed)


def test_add_files_copy_mode(spark, tmp_path):
    src, df = _source(spark, tmp_path, "sc", partitioned=False)
    loc = str(tmp_path / "tc")
    t = HadoopTable(spark, loc)
    s = t.add_files(src, mode="copy")
    assert s.summary["add_files_mode"] == "copy"
    assert _rows(t.read()) == _rows(df)


def test_add_files_sql_procedure_and_time_travel(spark, tmp_path):
    src, df = _source(spark, tmp_path, "sq")
    loc = str(tmp_path / "tq")
    s = table_sql(
        spark, f"CALL add_files('{loc}', source_dir => '{src}')"
    )
    t = HadoopTable(spark, loc)
    assert _rows(t.read()) == _rows(df)
    # registered data participates in every table feature: tag + travel
    t.create_tag("migrated")
    t.delete([("shard", "=", "1")])
    assert t.read().count() == 8
    assert t.read(ref="migrated").count() == 12


def test_add_files_duplicate_source_refused(spark, tmp_path):
    """Iceberg's check_duplicate_files: re-registering a source the
    table already links is refused (it would double every row); the
    explicit opt-out still works."""
    src, _ = _source(spark, tmp_path, "sd", partitioned=False)
    loc = str(tmp_path / "td")
    t = HadoopTable(spark, loc)
    t.add_files(src)
    with pytest.raises(ValueError, match="already registered"):
        t.add_files(src)
    assert t.read().count() == 12
    t.add_files(src, check_duplicates=False)  # explicit double
    assert t.read().count() == 24
