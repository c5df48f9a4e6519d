"""Python DataSource API surface for the snapshot table
(sources/table_datasource.py): `spark.read.format("snapshot_table")` with
per-file split planning, pruning-only filter pushdown into the manifest
planner, task-local merge-on-read delete application, and the
Structured-Streaming incremental reader with snapshot-version offsets.

Reference parity note: the reference app (MaksimBrezho/logparserhelper)
reads whole files into a Tkinter widget (gui/app_window.py:37-51); this
suite pins the Spark-first table-scan replacement surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, StringContains

from logparserhelper_spark.sinks.hadoop_table import HadoopTable
from logparserhelper_spark.sources.table_datasource import (
    _SnapshotTableReader,
    _SnapshotTableStreamReader,
    register_table_source,
)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.fixture()
def registered(spark):
    register_table_source(spark)
    return spark


def test_batch_read_equals_table_read(registered, tmp_path):
    """Partitioned table with BOTH delete-file flavors applied: the
    format() read must be row-for-row the table's own read()."""
    spark = registered
    loc = str(tmp_path / "t")
    t = HadoopTable(spark, loc)
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2), "v%03d" % i) for i in range(100)],
        "id long, sink string, v string",
    )
    t.append(df, partition_cols=["sink"])
    # position deletes (MoR DELETE) + equality deletes (MoR upsert)
    t.delete([("id", "<", 5)], mode="merge-on-read")
    t.upsert(
        spark.createDataFrame(
            [(7, "s1", "NEW7"), (200, "s0", "new")],
            "id long, sink string, v string",
        ),
        key_cols=["id"],
        mode="merge-on-read",
    )
    assert t.snapshot().delete_files  # the MoR path is actually exercised

    got = spark.read.format("snapshot_table").load(loc)
    assert got.schema == t.read().schema
    assert _rows(got) == _rows(t.read())
    # spot semantics: deleted ids gone, upserted row visible once
    ids = {r[0] for r in got.select("id").collect()}
    assert 0 not in ids and 200 in ids
    assert got.filter("id = 7").collect()[0]["v"] == "NEW7"


def test_filter_pushdown_prunes_files_before_tasks(registered, tmp_path):
    """pushFilters routes comparison predicates into plan_files: the
    reader plans strictly fewer partitions under a selective filter, and
    results stay exact because every filter is re-applied by Spark."""
    spark = registered
    loc = str(tmp_path / "tp")
    t = HadoopTable(spark, loc)
    for lo in range(0, 400, 100):  # 4 appends with disjoint id ranges
        t.append(
            spark.createDataFrame(
                [(i, "x" * 10) for i in range(lo, lo + 100)],
                "id long, v string",
            )
        )
    r = _SnapshotTableReader({"path": loc})
    n_all = len(r.partitions())

    r2 = _SnapshotTableReader({"path": loc, "prune_files": "true"})
    leftover = list(r2.pushFilters([EqualTo(("id",), 150)]))
    assert len(leftover) == 1  # pruning-only: Spark re-applies the filter
    assert len(r2.partitions()) < n_all

    # unsupported filters are ignored by planning, returned to Spark
    r3 = _SnapshotTableReader({"path": loc, "prune_files": "true"})
    leftover3 = list(
        r3.pushFilters(
            [StringContains(("v",), "x"), GreaterThanOrEqual(("id",), 350)]
        )
    )
    assert len(leftover3) == 2
    assert len(r3.partitions()) < n_all

    # pruning is OPT-IN: the default reader plans every file no matter
    # what was pushed (Spark caches planned partitions per relation, so
    # a default-on prune could starve a later unfiltered action)
    r4 = _SnapshotTableReader({"path": loc})
    list(r4.pushFilters([EqualTo(("id",), 150)]))
    assert len(r4.partitions()) == n_all

    # end-to-end correctness through the session read path
    got = (
        spark.read.format("snapshot_table")
        .option("prune_files", "true")
        .load(loc)
        .filter("id >= 350 AND id < 355")
    )
    assert sorted(r["id"] for r in got.collect()) == [350, 351, 352, 353, 354]


def test_reused_dataframe_not_poisoned_by_filtered_action(registered, tmp_path):
    """Regression: Spark overwrites the relation's cached (read
    function, partitions) on every FILTERED action and reuses it for
    unfiltered ones — with default options a filtered count followed by
    a plain count on the SAME DataFrame must still see every row."""
    spark = registered
    loc = str(tmp_path / "tr")
    t = HadoopTable(spark, loc)
    t.append(
        spark.createDataFrame(
            [(i, "v%d" % i) for i in range(50)], "id long, v string"
        )
    )
    got = spark.read.format("snapshot_table").load(loc)
    assert got.filter("id < 0").count() == 0  # would prune every file
    assert got.count() == 50  # the reused plan must not have pruned


def test_time_travel_options_version_and_ref(registered, tmp_path):
    spark = registered
    loc = str(tmp_path / "tt")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.create_tag("first")
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))

    assert (
        spark.read.format("snapshot_table").option("version", 1).load(loc)
    ).count() == 1
    by_ref = (
        spark.read.format("snapshot_table").option("ref", "first").load(loc)
    )
    assert _rows(by_ref) == [(1, "a")]
    assert (
        spark.read.format("snapshot_table").load(loc)
    ).count() == 2


def test_hidden_partitioned_table_roundtrip(registered, tmp_path):
    """Hidden-partition dirs (derived values NOT in the schema) must not
    leak into the scan; identity string partitions keep their exact
    written form ('00' stays a string)."""
    spark = registered
    loc = str(tmp_path / "th")
    t = HadoopTable(spark, loc)
    df = spark.createDataFrame(
        [("00", "2024-03-0%d 10:00:00" % (i % 3 + 1), i) for i in range(30)],
        "key string, ts string, n long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    t.append(df, partition_cols=["key", "day(ts)"])

    got = spark.read.format("snapshot_table").load(loc)
    assert _rows(got) == _rows(t.read())
    assert dict(got.dtypes)["key"] == "string"
    assert {r["key"] for r in got.select("key").collect()} == {"00"}


def test_streaming_incremental_versions(registered, tmp_path):
    """The stream reader tails appends with snapshot-version offsets and
    a checkpoint: run 1 sees the pre-existing rows (starting_version=0),
    run 2 after two more appends delivers EXACTLY the delta."""
    spark = registered
    loc = str(tmp_path / "ts")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))

    def run_once():
        q = (
            spark.readStream.format("snapshot_table")
            .option("starting_version", 0)
            .load(loc)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not finish"

    run_once()
    assert sorted(r["id"] for r in spark.read.parquet(out).collect()) == [1, 2]

    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    t.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    run_once()
    assert sorted(r["id"] for r in spark.read.parquet(out).collect()) == [
        1,
        2,
        3,
        4,
    ]


def test_streaming_non_append_fails_or_skips(registered, tmp_path):
    spark = registered
    loc = str(tmp_path / "tn")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.delete([("id", "=", 1)])  # copy-on-write: an overwrite snapshot
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    hi = t.current_version()

    r = _SnapshotTableStreamReader({"path": loc})
    with pytest.raises(ValueError, match="non-append"):
        r.partitions({"version": 0}, {"version": hi})

    r2 = _SnapshotTableStreamReader({"path": loc, "skip_non_appends": "true"})
    parts = r2.partitions({"version": 0}, {"version": hi})
    # only the two appends' files are delivered (the delete's rewrite is
    # skipped); skip-overwrite semantics deliver v1's row even though the
    # later delete removed it — the same contract as Iceberg's
    # streaming-skip-overwrite-snapshots
    from logparserhelper_spark.sources.table_datasource import (
        _read_file_batches,
    )

    rows = [
        row
        for p in parts
        for b in _read_file_batches(p)
        for row in b.to_pylist()
    ]
    assert sorted(r["id"] for r in rows) == [1, 2]


def test_eq_delete_null_keys_match_nullsafe(tmp_path):
    """Arrow-side equality-delete masking must match the JVM reader's
    eqNullSafe semantics: a null delete key kills null data keys (and
    positions out of range are ignored). Pure pyarrow — no session."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from logparserhelper_spark.sources.table_datasource import (
        TableFilePartition,
        _read_file_batches,
    )

    data = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table({"k": [1, None, 2, None], "v": ["a", "b", "c", "d"]}),
        data,
    )
    eq = str(tmp_path / "eq.parquet")
    pq.write_table(pa.table({"k": pa.array([None, 2], type=pa.int64())}), eq)
    pos = str(tmp_path / "pos.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": ["rel/d.parquet", "other.parquet"],
                "pos": pa.array([0, 1], type=pa.int64()),
            }
        ),
        pos,
    )
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    part = TableFilePartition(
        file_path=data,
        rel_path="rel/d.parquet",
        partition={},
        seq=1,
        schema_json=schema_json,
        pos_delete_paths=[pos],
        eq_deletes=[(eq, ("k",), 2, {})],
    )
    rows = [r for b in _read_file_batches(part) for r in b.to_pylist()]
    # pos delete kills ordinal 0 (k=1); eq deletes kill k=2 AND both nulls
    assert rows == []
    # without the eq deletes, only the position delete applies
    part2 = TableFilePartition(
        file_path=data,
        rel_path="rel/d.parquet",
        partition={},
        seq=1,
        schema_json=schema_json,
        pos_delete_paths=[pos],
    )
    rows2 = [r for b in _read_file_batches(part2) for r in b.to_pylist()]
    assert [r["v"] for r in rows2] == ["b", "c", "d"]


def test_writer_roundtrip_and_replace(registered, tmp_path):
    """df.write.format('snapshot_table'): create-partitioned, append,
    dynamic partition replace, truncate overwrite — all through the
    standard write API, each an atomic snapshot commit with stats and
    field-id manifests staged by the tasks themselves."""
    spark = registered
    loc = str(tmp_path / "tw")
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2), float(i)) for i in range(20)],
        "k int, sink string, score double",
    )
    (
        df.write.format("snapshot_table")
        .option("partition_by", "sink")
        .mode("append")
        .save(loc)
    )
    t = HadoopTable(spark, loc)
    assert t.snapshot().partition_cols == ["sink"]
    assert _rows(t.read()) == _rows(df)
    f = t.snapshot().data_files[0]
    assert f.stats is not None and f.columns is not None  # full manifests
    # metrics skipping works on writer-staged stats
    assert len(t.plan_files(predicate=[("k", ">", 1000)])) == 0

    # append + schema evolution through the writer (additive column)
    (
        spark.createDataFrame(
            [(100, "s0", 1.0, "en")],
            "k int, sink string, score double, lang string",
        )
        .write.format("snapshot_table")
        .mode("append")
        .save(loc)
    )
    got = {r.k: r.lang for r in t.read().collect()}
    assert got[100] == "en" and got[0] is None and len(got) == 21

    # dynamic partition replace: s0 replaced wholesale, s1 untouched
    (
        spark.createDataFrame(
            [(500, "s0", 9.9, None)],
            "k int, sink string, score double, lang string",
        )
        .write.format("snapshot_table")
        .mode("overwrite")
        .option("replace_partitions", "true")
        .save(loc)
    )
    ids = {r.k for r in t.read().collect()}
    assert 500 in ids and 1 in ids and 0 not in ids and 100 not in ids

    # plain overwrite truncates
    (
        spark.createDataFrame([(7, "s1", 0.0, None)],
                              "k int, sink string, score double, lang string")
        .write.format("snapshot_table").mode("overwrite").save(loc)
    )
    assert t.read().count() == 1


def test_writer_null_partition_value(registered, tmp_path):
    spark = registered
    loc = str(tmp_path / "twn")
    df = spark.createDataFrame(
        [(1, None), (2, "a")], "k int, sink string"
    )
    (
        df.write.format("snapshot_table")
        .option("partition_by", "sink")
        .mode("append")
        .save(loc)
    )
    t = HadoopTable(spark, loc)
    got = {r.k: r.sink for r in t.read().collect()}
    assert got == {1: None, 2: "a"}
    # and through the data source reader
    ds = spark.read.format("snapshot_table").load(loc)
    assert {r.k: r.sink for r in ds.collect()} == got


def test_writer_guards(registered, tmp_path):
    spark = registered
    loc = str(tmp_path / "twg")
    t = HadoopTable(spark, loc)
    t.append(
        spark.createDataFrame([(1, 7)], "k int, b int"),
        partition_cols=["bucket(4, b)"],
    )
    df = spark.createDataFrame([(2, 8)], "k int, b int")
    with pytest.raises(Exception, match="identity partitioning"):
        df.write.format("snapshot_table").mode("append").save(loc)
    loc2 = str(tmp_path / "twg2")
    df2 = spark.createDataFrame([(1, 0.5)], "k int, score double")
    with pytest.raises(Exception, match="string/integral/boolean"):
        (
            df2.write.format("snapshot_table")
            .option("partition_by", "score")
            .mode("append")
            .save(loc2)
        )


def test_stream_writer_exactly_once(registered, tmp_path):
    """df.writeStream.format('snapshot_table'): batch ids stamp the
    snapshot summary; a checkpointed second run delivers only the
    delta, and the replay guard makes redelivery a no-op."""
    spark = registered
    src = str(tmp_path / "src")
    loc = str(tmp_path / "tsw")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a")], "id long, v string").write.json(src)

    def run_once():
        q = (
            spark.readStream.schema("id long, v string")
            .json(src)
            .writeStream.format("snapshot_table")
            .option("path", loc)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not finish"

    run_once()
    t = HadoopTable(spark, loc)
    assert sorted(r.id for r in t.read().collect()) == [1]
    assert t.snapshot().summary.get("streaming_batch_id") is not None

    spark.createDataFrame([(2, "b")], "id long, v string").write.mode(
        "append"
    ).json(src)
    run_once()
    assert sorted(r.id for r in t.read().collect()) == [1, 2]
    # replaying an already-committed batch through the guard is a no-op
    from logparserhelper_spark.sources.table_datasource import (
        _SnapshotTableStreamWriter,
    )

    w = _SnapshotTableStreamWriter({"path": loc}, t.read().schema, False)
    v = t.current_version()
    w.commit([], batchId=0)  # stale batch id: precondition fails silently
    assert t.current_version() == v


def test_stream_writer_complete_mode_truncates_per_batch(registered, tmp_path):
    """outputMode('complete') reaches the stream writer as
    overwrite=True: every microbatch must land as overwrite_all (the
    table holds the latest full aggregation result), never as silent
    duplicate appends."""
    spark = registered
    src = str(tmp_path / "src")
    loc = str(tmp_path / "tc")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([("a",), ("a",)], "v string").write.json(src)

    def run_once():
        q = (
            spark.readStream.schema("v string")
            .json(src)
            .groupBy("v")
            .count()
            .writeStream.format("snapshot_table")
            .option("path", loc)
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not finish"

    run_once()
    t = HadoopTable(spark, loc)
    assert {(r.v, r["count"]) for r in t.read().collect()} == {("a", 2)}
    spark.createDataFrame([("a",), ("b",)], "v string").write.mode(
        "append"
    ).json(src)
    run_once()
    # latest full result only — no accumulated duplicates
    assert {(r.v, r["count"]) for r in t.read().collect()} == {
        ("a", 3),
        ("b", 1),
    }
    assert t.snapshot().operation == "overwrite_all"


def test_stream_writer_replay_reclaims_staged_files(registered, tmp_path):
    """A redelivered (stale batchId) commit is a no-op AND its staged
    files are unlinked immediately instead of waiting for orphan GC."""
    import os as _os

    spark = registered
    loc = str(tmp_path / "tr")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(1,)], "k int"))
    t.set_properties({"x": "1"})  # ensure a batch id below commits
    from logparserhelper_spark.sources.table_datasource import (
        TableWriteMessage,
        _SnapshotTableStreamWriter,
    )

    # stamp batch 5 as committed
    t._commit(
        [], type("S", (), {"schema": t.read().schema,
                           "columns": t.read().columns})(),
        "append", [], summary_extra={"streaming_batch_id": 5},
    )
    w = _SnapshotTableStreamWriter({"path": loc}, t.read().schema, False)
    import pyarrow as pa

    # exercise commit() with a prebuilt message pointing at a real
    # staged file (stage one parquet manually under data/ — the
    # worker-side _stage_batches needs a TaskContext, absent on driver)
    import pyarrow.parquet as pq

    stage_dir = _os.path.join(loc, "data", "replaytest0000")
    _os.makedirs(stage_dir, exist_ok=True)
    fpath = _os.path.join(stage_dir, "part-0-0.parquet")
    pq.write_table(pa.table({"k": pa.array([7], type=pa.int32())}), fpath)
    from logparserhelper_spark.sinks.hadoop_table import DataFile

    entry = DataFile(
        path=_os.path.relpath(fpath, loc),
        partition={},
        records=1,
        bytes=_os.path.getsize(fpath),
    ).to_json()
    v = t.current_version()
    w.commit([TableWriteMessage([entry])], batchId=3)  # stale: 3 < 5
    assert t.current_version() == v  # no commit happened
    assert not _os.path.exists(fpath)  # staged file reclaimed NOW


def test_batch_read_pins_load_time_snapshot(registered, tmp_path):
    """The batch reader resolves the snapshot ONCE at load (Iceberg's
    load-time pinning, ADVICE r7): commits landing between .load() and an
    action — including a schema-evolution commit — neither shift the
    scanned snapshot nor tear the schema binding. Re-planning the same
    DataFrame later still reads the pinned snapshot."""
    t = HadoopTable(None, str(tmp_path / "tpin"))
    spark = registered
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    df = spark.read.format("snapshot_table").load(t.location)
    # a data commit AND a schema-evolution commit land after load
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    t.rename_column("v", "w")
    t.append(spark.createDataFrame([(3, "c")], "id long, w string"))
    # the scan still sees exactly the load-time snapshot, under its schema
    assert df.columns == ["id", "v"]
    assert _rows(df) == [(1, "a")]
    assert _rows(df.select("v")) == [("a",)]  # second action: same pin
    # a fresh load sees the current snapshot under the evolved schema
    df2 = spark.read.format("snapshot_table").load(t.location)
    assert df2.columns == ["id", "w"]
    assert _rows(df2) == [(1, "a"), (2, "b"), (3, "c")]


def test_in_filter_pushdown(registered, tmp_path):
    """Spark's In filter pushes down as the shim's ``in`` predicate and
    prunes planned partitions; NULL members strip; results stay exact."""
    from pyspark.sql.datasource import In

    from logparserhelper_spark.sources.table_datasource import (
        _filters_to_predicate,
    )

    assert _filters_to_predicate([In(("id",), (1, None, 3))]) == [
        ("id", "in", (1, 3))
    ]
    assert _filters_to_predicate([In(("id",), (object(),))]) == []

    spark = registered
    loc = str(tmp_path / "t_in_ds")
    t = HadoopTable(spark, loc)
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(10)],
                "id long, v string",
            ).coalesce(1)
        )
    r = _SnapshotTableReader({"path": loc, "prune_files": "true"})
    list(r.pushFilters([In(("id",), (5, 7))]))
    assert len(r.partitions()) == 1
    got = sorted(
        r.id
        for r in spark.read.format("snapshot_table")
        .option("prune_files", "true")
        .load(loc)
        .filter(F.col("id").isin(5, 7, 205))
        .collect()
    )
    assert got == [5, 7, 205]


def test_writer_harvests_configured_blooms(registered, tmp_path):
    """DataSource-written files carry the same manifest bloom filters a
    native _stage write would (config resolved driver-side, built in
    the write workers), so bloom file skipping works identically."""
    spark = registered
    loc = str(tmp_path / "tw_bloom")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(0, "seed")], "id long, u string"))
    t.set_properties({"write.metadata.bloom-filter-columns": "u"})
    df = spark.createDataFrame(
        [(i, f"u-{i:04d}") for i in range(100)], "id long, u string"
    )
    df.write.format("snapshot_table").mode("append").save(loc)
    new = [f for f in t.snapshot().data_files if f.blooms]
    assert new and all(f.blooms["u"]["kind"] == "str" for f in new)
    # a probe absent everywhere: every bloomed file prunes
    assert not [
        p for p in t.plan_files(predicate=[("u", "=", "zz")]) if p.blooms
    ]
    assert sorted(
        r["u"] for r in t.read(predicate=[("u", "=", "u-0042")]).collect()
    ) == ["u-0042"]
