"""Table column statistics: KMV NDV sketches harvested at write time
(sinks/hadoop_table.py:_harvest_sketches via
write.metadata.ndv-sketch-columns) merged into the metadata-only
`inspect("statistics")` ANALYZE surface (+ SHOW STATS FOR in table_sql).

Reference parity note: the reference app (MaksimBrezho/logparserhelper)
has no table metadata at all (utils/json_utils.py whole-file JSON); this
is part of the Spark-first table surface, mirroring Iceberg's Puffin
statistics files with manifest-resident mergeable sketches instead.
"""

from __future__ import annotations

from logparserhelper_spark.sinks.catalog import create_table_at
from logparserhelper_spark.sinks.hadoop_table import (
    HadoopTable,
    _kmv_estimate,
    _sketch_hashes,
)
from logparserhelper_spark.sinks.table_sql import table_sql


def _stats(t, version=None):
    return {
        r["column"]: r.asDict()
        for r in t.inspect("statistics", version=version).collect()
    }


def _mk(spark, tmp_path, name="ts", k=1024):
    """Seed file written BEFORE the sketch property: partial coverage."""
    loc = str(tmp_path / name)
    t = HadoopTable(spark, loc)
    t.append(
        spark.createDataFrame([(0, "seed", 0.5)], "id long, u string, v double")
        .coalesce(1)
    )
    t.set_properties(
        {
            "write.metadata.ndv-sketch-columns": "id,u",
            "write.metadata.ndv-sketch-k": str(k),
        }
    )
    return t


def test_sketches_harvested_only_for_configured_columns(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(
        spark.createDataFrame(
            [(i, f"u-{i % 7}", float(i)) for i in range(100)],
            "id long, u string, v double",
        ).coalesce(1)
    )
    files = t.snapshot().data_files
    pre = [f for f in files if f.records == 1]
    post = [f for f in files if f.records > 1]
    assert pre and all(f.sketches is None for f in pre)
    # v is configured-off; doubles would be refused anyway (_bloom_key)
    assert post and all(set(f.sketches) == {"id", "u"} for f in post)
    sk = post[0].sketches["u"]
    assert sk["kind"] == "str" and sk["k"] == 1024
    assert len(_sketch_hashes(sk)) == 7  # below k: sketch IS the set


def test_exact_ndv_below_k_and_cross_file_dedup(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # same 40 u-values written into 3 separate files: union must dedup
    for _ in range(3):
        t.append(
            spark.createDataFrame(
                [(i, f"u-{i % 40}", 1.0) for i in range(200)],
                "id long, u string, v double",
            ).coalesce(1)
        )
    s = _stats(t)
    assert s["u"]["row_count"] == 601
    # the un-sketched seed file's value is NOT merged (partial coverage —
    # exactly what files_with_sketch < data_files flags), so 40, not 41
    assert s["u"]["ndv"] == 40
    assert not s["u"]["ndv_exact"]
    assert s["u"]["files_with_sketch"] == 3
    assert s["u"]["data_files"] == 4
    assert s["u"]["null_count"] == 0
    # id: 0..199 in each sketched file plus seed id 0
    assert s["id"]["ndv"] == 200
    # unconfigured column: row/null counts still answered, ndv unknown
    assert s["v"]["ndv"] is None and s["v"]["row_count"] == 601
    assert s["v"]["null_count"] == 0


def test_exact_flag_when_every_file_sketched(spark, tmp_path):
    loc = str(tmp_path / "texact")
    t = create_table_at(
        spark,
        loc,
        "id long, u string",
        properties={"write.metadata.ndv-sketch-columns": "id,u"},
    )
    t.append(
        spark.createDataFrame(
            [(i, f"u-{i}") for i in range(50)], "id long, u string"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(i, f"u-{i}") for i in range(25, 75)], "id long, u string"
        ).coalesce(1)
    )
    s = _stats(t)
    assert s["u"]["ndv"] == 75 and s["u"]["ndv_exact"]
    assert s["id"]["ndv"] == 75 and s["id"]["ndv_exact"]


def test_estimate_above_k_within_tolerance(spark, tmp_path):
    loc = str(tmp_path / "test_est")
    t = create_table_at(
        spark,
        loc,
        "id long, u string",
        properties={
            "write.metadata.ndv-sketch-columns": "u",
            "write.metadata.ndv-sketch-k": "256",
        },
    )
    # 20k distinct values across 4 files, k=256 -> estimator path
    for part in range(4):
        rows = [(i, f"val-{part * 5000 + i:08d}") for i in range(5000)]
        t.append(spark.createDataFrame(rows, "id long, u string").coalesce(1))
    s = _stats(t)["u"]
    assert not s["ndv_exact"] and s["files_with_sketch"] == 4
    # KMV stderr at k=256 is ~6.3%; deterministic data, generous bound
    assert abs(s["ndv"] - 20000) / 20000 < 0.2


def test_nulls_and_time_travel(spark, tmp_path):
    loc = str(tmp_path / "tnull")
    t = create_table_at(
        spark,
        loc,
        "id long, u string",
        properties={"write.metadata.ndv-sketch-columns": "u"},
    )
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b")], "id long, u string"
        ).coalesce(1)
    )
    v1 = t.current_version()
    t.append(
        spark.createDataFrame([(4, None), (5, "c")], "id long, u string")
        .coalesce(1)
    )
    s = _stats(t)
    assert s["u"]["null_count"] == 2 and s["u"]["ndv"] == 3
    old = _stats(t, version=v1)
    assert old["u"]["null_count"] == 1 and old["u"]["ndv"] == 2
    assert old["u"]["row_count"] == 3


def test_rename_merges_by_field_id(spark, tmp_path):
    loc = str(tmp_path / "tren")
    t = create_table_at(
        spark,
        loc,
        "id long, u string",
        properties={"write.metadata.ndv-sketch-columns": "id,u"},
    )
    t.append(
        spark.createDataFrame([(1, "x"), (2, "y")], "id long, u string")
        .coalesce(1)
    )
    t.rename_column("u", "w")
    # column properties name CURRENT schema columns and are not rewritten
    # by a rename (Iceberg's per-column properties behave the same way) —
    # the writer updates it, exactly like the bloom property
    t.set_properties({"write.metadata.ndv-sketch-columns": "id,w"})
    t.append(
        spark.createDataFrame([(3, "y"), (4, "z")], "id long, w string")
        .coalesce(1)
    )
    s = _stats(t)
    assert "w" in s and "u" not in s
    # pre-rename file's 'u' sketch merges under the current name by id
    assert s["w"]["ndv"] == 3 and s["w"]["ndv_exact"]


def test_add_column_default_counts_as_one_distinct(spark, tmp_path):
    loc = str(tmp_path / "tdef")
    t = create_table_at(
        spark,
        loc,
        "id long",
        properties={"write.metadata.ndv-sketch-columns": "id,tag"},
    )
    t.append(spark.createDataFrame([(1,), (2,)], "id long").coalesce(1))
    t.add_column("tag", "string", default="legacy")
    t.append(
        spark.createDataFrame([(3, "new")], "id long, tag string").coalesce(1)
    )
    s = _stats(t)
    # predating file reads the default -> 1 distinct; new file adds "new"
    assert s["tag"]["ndv"] == 2 and s["tag"]["ndv_exact"]
    assert s["tag"]["null_count"] == 0


def test_add_column_null_default_counts_nulls(spark, tmp_path):
    loc = str(tmp_path / "tnulldef")
    t = create_table_at(
        spark,
        loc,
        "id long",
        properties={"write.metadata.ndv-sketch-columns": "tag"},
    )
    t.append(spark.createDataFrame([(1,), (2,)], "id long").coalesce(1))
    t.add_column("tag", "string")
    s = _stats(t)
    assert s["tag"]["null_count"] == 2
    assert s["tag"]["ndv"] == 0 and s["tag"]["ndv_exact"]


def test_compact_preserves_statistics(spark, tmp_path):
    t = _mk(spark, tmp_path, "tcomp")
    for _ in range(3):
        t.append(
            spark.createDataFrame(
                [(i, f"u-{i % 40}", 1.0) for i in range(200)],
                "id long, u string, v double",
            ).coalesce(1)
        )
    before = _stats(t)["u"]
    assert before["ndv"] == 40 and not before["ndv_exact"]
    t.compact()
    after = _stats(t)
    # compact rewrites under the current property config: the formerly
    # un-sketched seed row is now covered, so "seed" joins the estimate
    assert after["u"]["ndv"] == 41
    assert after["u"]["files_with_sketch"] == after["u"]["data_files"]
    assert after["u"]["ndv_exact"]


def test_show_stats_sql(spark, tmp_path):
    t = _mk(spark, tmp_path, "tsql")
    t.append(
        spark.createDataFrame(
            [(i, f"u-{i % 5}", 1.0) for i in range(50)],
            "id long, u string, v double",
        ).coalesce(1)
    )
    df = table_sql(spark, f"SHOW STATS FOR '{t.location}'")
    rows = {r["column"]: r.asDict() for r in df.collect()}
    assert rows["u"]["ndv"] == 5  # seed file is un-sketched
    v = t.current_version()
    t.append(
        spark.createDataFrame([(999, "brand-new", 0.0)],
                              "id long, u string, v double").coalesce(1)
    )
    old = table_sql(spark, f"SHOW STATS FOR '{t.location}' AS OF VERSION {v}")
    assert {r["column"]: r["ndv"] for r in old.collect()}["u"] == 5
    assert _stats(t)["u"]["ndv"] == 6


def test_kmv_estimate_unit():
    est, exact = _kmv_estimate([10, 20, 30], 5)
    assert (est, exact) == (3, True)
    # k=3, kth hash at half the domain -> ~2*(k-1) = 4
    est, exact = _kmv_estimate([1, 2, 2**63], 3)
    assert not exact and 3 <= est <= 5


def test_datasource_writer_harvests_sketches(spark, tmp_path):
    loc = str(tmp_path / "tdsw")
    create_table_at(
        spark,
        loc,
        "id long, u string",
        properties={"write.metadata.ndv-sketch-columns": "u"},
    )
    from logparserhelper_spark.sources.table_datasource import (
        register_table_source,
    )

    register_table_source(spark)
    df = spark.createDataFrame(
        [(i, f"u-{i % 9}") for i in range(60)], "id long, u string"
    ).coalesce(1)
    df.write.format("snapshot_table").mode("append").save(loc)
    t = HadoopTable(spark, loc)
    files = [f for f in t.snapshot().data_files if f.records]
    assert files and all(
        f.sketches and set(f.sketches) == {"u"} for f in files
    )
    assert _stats(t)["u"]["ndv"] == 9


def test_mor_deletes_degrade_statistics(spark, tmp_path):
    loc = str(tmp_path / "tmor")
    t = create_table_at(
        spark,
        loc,
        "id long, u string",
        properties={"write.metadata.ndv-sketch-columns": "u"},
    )
    t.append(
        spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "y")], "id long, u string"
        ).coalesce(1)
    )
    s0 = _stats(t)["u"]
    assert s0["ndv"] == 2 and s0["ndv_exact"] and s0["null_count"] == 0
    t.delete([("u", "=", "x")], mode="merge-on-read")
    s1 = _stats(t)["u"]
    # review finding: a live delete file means per-column numbers are
    # upper bounds — never assert exactness, never claim a null count
    assert not s1["ndv_exact"] and s1["null_count"] is None
    assert s1["ndv"] == 2  # advisory upper bound
    # position deletes subtract from row_count (total_records' rule)
    assert s1["row_count"] == 2
    t.compact()
    s2 = _stats(t)["u"]
    assert s2["ndv"] == 1 and s2["ndv_exact"] and s2["row_count"] == 2
    assert s2["null_count"] == 0


def test_nested_struct_sketches_surface(spark, tmp_path):
    loc = str(tmp_path / "tnest")
    t = create_table_at(
        spark,
        loc,
        "id long, props struct<lang: string, score: long>",
        properties={"write.metadata.ndv-sketch-columns": "props.lang"},
    )
    rows = [(i, (["en", "de", "fr"][i % 3], i)) for i in range(30)]
    t.append(
        spark.createDataFrame(
            rows, "id long, props struct<lang: string, score: long>"
        ).coalesce(1)
    )
    s = _stats(t)
    # review finding: dotted sketch columns must SURFACE, not just cost
    assert "props.lang" in s
    assert s["props.lang"]["ndv"] == 3 and s["props.lang"]["ndv_exact"]
    assert s["props.lang"]["null_count"] == 0
    # nested leaves without sketches still get row/null counts
    assert s["props.score"]["row_count"] == 30
    assert s["props.score"]["ndv"] is None


def test_malformed_sketch_entry_degrades_not_raises(spark, tmp_path):
    loc = str(tmp_path / "tmal")
    t = create_table_at(
        spark,
        loc,
        "id long, u string",
        properties={"write.metadata.ndv-sketch-columns": "u"},
    )
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, u string")
        .coalesce(1)
    )
    snap = t.snapshot()
    f = snap.data_files[0]
    f.sketches["u"].pop("k")  # hand-damaged manifest entry
    got = {r["column"]: r.asDict() for r in
           spark.createDataFrame(t._column_statistics(snap),
                                 "column string, row_count bigint, "
                                 "null_count bigint, ndv bigint, "
                                 "ndv_exact boolean, data_files int, "
                                 "files_with_sketch int").collect()}
    # advisory contract: degrade (k falls back to the hash count), no crash
    assert got["u"]["ndv"] == 2


def test_sketch_harvest_never_fails_a_commit(spark, tmp_path):
    """Review finding: safe arrow casts raised for uint64 > 2^63 and
    ns-precision timestamps, failing the whole append for an ADVISORY
    feature. The unsafe casts wrap/truncate instead, and any residual
    harvest error degrades to no-sketch rather than propagating."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    loc = str(tmp_path / "tedge")
    t = create_table_at(
        spark,
        loc,
        "id long, ts timestamp",
        properties={"write.metadata.ndv-sketch-columns": "id,ts"},
    )
    t.append(
        spark.createDataFrame(
            [(2**62 + i, dt.datetime(9999, 12, 31, 23, 59, 59, 999999))
             for i in range(3)],
            "id long, ts timestamp",
        ).coalesce(1)
    )
    s = _stats(t)
    assert s["id"]["ndv"] == 3 and s["ts"]["ndv"] == 1
    # scalar/vector identity on the year-9999 sentinel: a default-value
    # contribution of the same instant must not double-count
    from logparserhelper_spark.sinks.hadoop_table import (
        _kmv_hash_arrow,
        _kmv_hash_value,
    )

    v = dt.datetime(9999, 12, 31, 23, 59, 59, 999999)
    _, h = _kmv_hash_arrow(pa.array([v], pa.timestamp("us")))
    assert _kmv_hash_value(v) == h[0]
    # raw uint64 parquet (written by pyarrow, outside Spark's type set)
    # registered via add_files must harvest without raising
    src = str(tmp_path / "u64src")
    import os

    os.makedirs(src)
    pq.write_table(
        pa.table({"id": pa.array([2**64 - 1, 2**63, 7], pa.uint64()),
                  "ts": pa.array([dt.datetime(2024, 1, 1)] * 3,
                                 pa.timestamp("us"))}),
        os.path.join(src, "part-0.parquet"),
    )
    # (not added to the table — schema differs; the harvest itself is
    # what must not raise)
    from logparserhelper_spark.sinks.hadoop_table import _harvest_sketches

    sk = _harvest_sketches(pq.ParquetFile(os.path.join(src, "part-0.parquet")),
                           ["id", "ts"], 64)
    assert set(sk) == {"id", "ts"}


def test_all_null_file_still_covered(spark, tmp_path):
    """An eligible sketched column whose file is ENTIRELY null emits an
    empty sketch (h=''), so the file counts as covered-with-zero-
    contribution: ndv stays exact instead of silently degrading to a
    partial-coverage None/estimate."""
    loc = str(tmp_path / "tnullcov")
    t = create_table_at(
        spark,
        loc,
        "id long, u string",
        properties={"write.metadata.ndv-sketch-columns": "id,u"},
    )
    t.append(
        spark.createDataFrame(
            [(i, f"u-{i % 5}") for i in range(40)], "id long, u string"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(100 + i, None) for i in range(10)], "id long, u string"
        ).coalesce(1)
    )
    post = [f for f in t.snapshot().data_files if f.sketches]
    nullf = [f for f in post if (f.stats or {}).get("u", {}).get("nulls") == 10]
    assert nullf and nullf[0].sketches["u"]["h"] == ""  # empty, not absent
    s = _stats(t)
    assert s["u"]["ndv"] == 5 and s["u"]["ndv_exact"]
    assert s["u"]["null_count"] == 10
    assert s["id"]["ndv"] == 50 and s["id"]["ndv_exact"]
