"""Hidden partitioning (Iceberg partition transforms) for the snapshot
table: sinks/partition_spec.py + the spec threading in hadoop_table.py.

Reference parity note: the reference app has no table layer at all (its
only sink is a whole-file JSON overwrite, utils/json_utils.py:21-27);
these tests pin the shim against the PUBLIC Apache Iceberg spec's
partition-transform and scan-planning semantics
(https://iceberg.apache.org/spec/#partition-transforms), with the two
documented shim divergences (string-formatted time values, md5 bucket)
asserted explicitly where they matter.
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from logparserhelper_spark.sinks.hadoop_table import HadoopTable
from logparserhelper_spark.sinks.partition_spec import (
    HIVE_NULL,
    parse_partition_spec,
    partition_may_match,
)

pytestmark = pytest.mark.usefixtures("spark")


# ---------------------------------------------------------------- parsing
def test_parse_spec_forms():
    spec = parse_partition_spec(
        ["plain", "identity(a)", "days(ts)", "bucket(8, key)", "truncate(4, c)"]
    )
    assert [(f.name, f.source, f.transform, f.param) for f in spec] == [
        ("plain", "plain", "identity", None),
        ("a", "a", "identity", None),
        ("ts_day", "ts", "day", None),
        ("key_bucket", "key", "bucket", 8),
        ("c_trunc", "c", "truncate", 4),
    ]
    # aliases and the other time granularities
    spec2 = parse_partition_spec(
        ["year(ts)", "months(ts)", "hours(ts)"]
    )
    assert [f.name for f in spec2] == ["ts_year", "ts_month", "ts_hour"]


@pytest.mark.parametrize(
    "bad",
    ["bucket(key)", "truncate(c)", "bucket(0, key)", "frobnicate(3, x)",
     "days(3, ts)"],
)
def test_parse_spec_rejects(bad):
    with pytest.raises(ValueError):
        parse_partition_spec([bad])


def test_parse_spec_duplicate_names():
    with pytest.raises(ValueError, match="duplicate"):
        parse_partition_spec(["days(ts)", "day(ts)"])


# -------------------------------------------- write-side / plan-side parity
def test_bucket_and_time_py_matches_spark(spark):
    """The plan-time Python projection of a literal must equal the
    write-time Spark expression on the same value — otherwise pruning
    would diverge from the layout and silently drop matching files."""
    rows = [
        (1, datetime(2026, 1, 3, 5, 42, 7), "alpha", -17),
        (2, datetime(2024, 12, 31, 23, 59, 59), "", 0),
        (3, datetime(2026, 8, 17, 0, 0, 0), "четыре", 1234567),
        (4, datetime(2000, 2, 29, 12, 0, 0), "k" * 50, -1),
    ]
    df = spark.createDataFrame(
        rows, "id long, ts timestamp, s string, n long"
    )
    spec = parse_partition_spec(
        [
            "years(ts)", "months(ts)", "days(ts)", "hours(ts)",
            "bucket(7, s)", "bucket(5, n)", "bucket(3, id)",
            "truncate(3, s)", "truncate(10, n)",
        ]
    )
    out = df
    for f in spec:
        out = out.withColumn(f.name, f.spark_expr(df))
    got = {r["id"]: r.asDict() for r in out.collect()}
    for row in rows:
        by_src = {"ts": row[1], "s": row[2], "n": row[3], "id": row[0]}
        for f in spec:
            want = f.py_value(by_src[f.source])
            assert str(got[row[0]][f.name]) == want, (
                f"{f.name} diverges for {by_src[f.source]!r}: "
                f"spark={got[row[0]][f.name]!r} py={want!r}"
            )


# --------------------------------------------------- hidden write/read/prune
@pytest.fixture()
def hidden_table(spark, tmp_path):
    loc = str(tmp_path / "ht")
    df = spark.range(200).select(
        F.col("id"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(hours=F.col("id").cast("int") * 7)
        ).alias("ts"),
        F.concat(F.lit("u"), (F.col("id") % 13).cast("string")).alias("user"),
        (F.col("id") * 10).alias("val"),
    )
    t = HadoopTable(spark, loc)
    t.append(df, partition_cols=["days(ts)", "bucket(4, user)"])
    return t, df


def test_hidden_read_exposes_only_source_columns(hidden_table):
    t, df = hidden_table
    snap = t.snapshot()
    assert snap.partition_cols == ["ts_day", "user_bucket"]
    r = t.read()
    assert r.columns == ["id", "ts", "user", "val"]
    assert r.count() == 200
    # the derived values exist only as hive dirs; data files hold sources
    assert all("ts_day=" in f.path for f in snap.data_files)


def test_source_predicate_prunes_and_stays_exact(hidden_table):
    t, df = hidden_table
    n_all = len(t.plan_files())
    cut = datetime(2026, 1, 20)
    pruned = t.plan_files(predicate=[("ts", ">=", cut)])
    assert 0 < len(pruned) < n_all
    got = t.read(predicate=[("ts", ">=", cut)]).count()
    want = df.filter(F.col("ts") >= F.lit("2026-01-20 00:00:00")).count()
    assert got == want > 0
    # bucket transform: equality on the raw key prunes to ~1/4 of files
    pb = t.plan_files(predicate=[("user", "=", "u3")])
    assert 0 < len(pb) <= n_all // 2
    assert (
        t.read(predicate=[("user", "=", "u3")]).count()
        == df.filter("user = 'u3'").count()
    )
    # range predicates do NOT project through a hash — same files as all
    # (minus whatever footer metrics skip); the answer must still be exact
    assert (
        t.read(predicate=[("user", ">=", "u9")]).count()
        == df.filter("user >= 'u9'").count()
    )


def test_truncate_transforms(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"code{i % 7:02d}x", i * 37 - 500) for i in range(60)],
        "id long, code string, n long",
    )
    t = HadoopTable(spark, str(tmp_path / "tt"))
    t.append(df, partition_cols=["truncate(6, code)", "truncate(100, n)"])
    assert t.snapshot().partition_cols == ["code_trunc", "n_trunc"]
    assert t.read().columns == ["id", "code", "n"]
    # negative ints floor toward -inf (Iceberg truncate): -500 -> -500,
    # -463 -> -500
    parts = {f.partition["n_trunc"] for f in t.snapshot().data_files}
    assert "-500" in parts
    n_all = len(t.plan_files())
    pruned = t.plan_files(predicate=[("n", ">=", 1000)])
    assert 0 < len(pruned) < n_all
    assert (
        t.read(predicate=[("n", ">=", 1000)]).count()
        == df.filter("n >= 1000").count()
    )
    ps = t.plan_files(predicate=[("code", "=", "code03x")])
    assert 0 < len(ps) < n_all
    assert (
        t.read(predicate=[("code", "=", "code03x")]).count()
        == df.filter("code = 'code03x'").count()
    )


def test_null_source_values(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1), "a"),
            (2, None, "b"),
            (3, datetime(2026, 3, 1), None),
            (4, None, None),
        ],
        "id long, ts timestamp, key string",
    )
    t = HadoopTable(spark, str(tmp_path / "tn"))
    t.append(df, partition_cols=["months(ts)", "bucket(2, key)"])
    dirs = {f.partition["ts_month"] for f in t.snapshot().data_files}
    assert HIVE_NULL in dirs
    assert t.read().count() == 4
    # is_null projects to the null partition only
    assert len(t.plan_files(predicate=[("ts", "is_null")])) == sum(
        1 for f in t.snapshot().data_files
        if f.partition["ts_month"] == HIVE_NULL
    )
    assert t.read(predicate=[("ts", "is_null")]).count() == 2
    assert t.read(predicate=[("ts", "is_not_null")]).count() == 2
    # a comparison can never match a null-partition file
    pruned = t.plan_files(predicate=[("ts", ">=", datetime(2026, 2, 1))])
    assert all(f.partition["ts_month"] != HIVE_NULL for f in pruned)
    assert t.read(predicate=[("ts", ">=", datetime(2026, 2, 1))]).count() == 1


def test_inclusive_projection_never_false_prunes(spark, tmp_path):
    """Randomized adversarial check: for random conjunctive predicates
    over a transform-partitioned table, read(predicate=...) must equal
    the full-scan filter — pruning may only ever skip files that cannot
    match."""
    rng = random.Random(7)
    base = datetime(2026, 1, 1)
    rows = [
        (
            i,
            base + timedelta(hours=rng.randrange(0, 24 * 90)),
            f"k{rng.randrange(20)}",
            rng.randrange(-1000, 1000),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, key string, n long")
    t = HadoopTable(spark, str(tmp_path / "tr"))
    t.append(
        df, partition_cols=["days(ts)", "bucket(3, key)", "truncate(250, n)"]
    )
    full = t.read()
    for trial in range(8):
        pred = []
        if rng.random() < 0.8:
            op = rng.choice(["<", "<=", ">", ">=", "="])
            v = base + timedelta(hours=rng.randrange(0, 24 * 90))
            pred.append(("ts", op, v))
        if rng.random() < 0.6:
            pred.append(("key", "=", f"k{rng.randrange(22)}"))
        if rng.random() < 0.6:
            op = rng.choice(["<", "<=", ">", ">=", "="])
            pred.append(("n", op, rng.randrange(-1100, 1100)))
        if not pred:
            pred.append(("ts", ">=", base))
        got = sorted(
            r["id"] for r in t.read(predicate=pred).collect()
        )
        from logparserhelper_spark.sinks.hadoop_table import _pred_expr, _check_predicate

        expr = _pred_expr(_check_predicate(pred))
        want = sorted(r["id"] for r in full.filter(expr).collect())
        assert got == want, f"trial {trial} pred {pred}: {len(got)} != {len(want)}"


def test_partition_may_match_unit():
    spec = parse_partition_spec(["days(ts)", "bucket(4, key)"])
    part = {"ts_day": "2026-01-15", "key_bucket": "2"}
    # inside / boundary / outside a day
    assert partition_may_match(part, spec, [("ts", ">=", datetime(2026, 1, 15, 23))])
    assert partition_may_match(part, spec, [("ts", "<", datetime(2026, 1, 15, 0, 0, 1))])
    assert not partition_may_match(part, spec, [("ts", ">", datetime(2026, 1, 16))])
    assert not partition_may_match(part, spec, [("ts", "<", datetime(2026, 1, 14))])
    # unknown column / unprojectable literal -> keep
    assert partition_may_match(part, spec, [("other", "=", 1)])
    assert partition_may_match(part, spec, [("ts", "=", "not a date")])
    # file written before a spec field existed -> keep
    assert partition_may_match({"ts_day": "2026-01-15"}, spec, [("key", "=", "x")])


# ------------------------------------------------- mutations keep the spec
def test_mutation_family_on_transform_table(spark, tmp_path, hidden_table):
    t, df = hidden_table
    spec0 = [f.to_json() for f in t.snapshot().spec]
    # CoW upsert (matched update + new key)
    upd = spark.createDataFrame(
        [
            (5, datetime(2026, 1, 2, 11), "u5", 99999),
            (1000, datetime(2026, 2, 1), "uX", 7),
        ],
        "id long, ts timestamp, user string, val long",
    )
    t.upsert(upd, ["id"])
    r = HadoopTable(spark, t.location).read()
    assert r.count() == 201
    assert r.filter("id = 5").first()["val"] == 99999
    # MoR delete, then compact materializes and keeps the spec
    t2 = HadoopTable(spark, t.location)
    t2.delete([("user", "=", "u7")], mode="merge-on-read")
    assert t2.read().filter("user = 'u7'").count() == 0
    before = t2.read().count()
    t2.compact()
    t3 = HadoopTable(spark, t.location)
    assert t3.read().count() == before
    assert t3.snapshot().delete_files == []
    assert [f.to_json() for f in t3.snapshot().spec] == spec0
    # derived dirs are re-derived identically on rewrite
    assert all(
        "ts_day=" in f.path and "user_bucket=" in f.path
        for f in t3.snapshot().data_files
    )


def test_spec_is_fixed_at_creation(spark, tmp_path, hidden_table):
    t, df = hidden_table
    with pytest.raises(ValueError, match="fixed at table creation"):
        t.append(df, partition_cols=["days(ts)", "bucket(8, user)"])
    with pytest.raises(ValueError, match="fixed at table creation"):
        t.append(df, partition_cols=["months(ts)", "bucket(4, user)"])


def test_replace_partitions_by_derived_scope(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, datetime(2026, 1, 1 + i % 3), i) for i in range(30)],
        "id long, ts timestamp, v long",
    )
    t = HadoopTable(spark, str(tmp_path / "rp"))
    t.append(df, partition_cols=["days(ts)"])
    # replace one day wholesale with fewer rows
    repl = spark.createDataFrame(
        [(500, datetime(2026, 1, 2, 6), 0)], "id long, ts timestamp, v long"
    )
    t.replace_partitions(repl, scope={"ts_day": "2026-01-02"})
    r = HadoopTable(spark, t.location).read()
    assert r.filter(F.to_date("ts") == "2026-01-02").count() == 1
    assert r.count() == 30 - df.filter(F.to_date("ts") == "2026-01-02").count() + 1


def test_streaming_sink_with_transform_partitioning(spark, tmp_path):
    from logparserhelper_spark.sinks.hadoop_table import table_batch_sink

    loc = str(tmp_path / "st")
    sink = table_batch_sink(loc, partition_cols=["days(ts)"])
    b0 = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 5)), (2, datetime(2026, 1, 2, 6))],
        "id long, ts timestamp",
    )
    sink(b0, 0)
    sink(b0, 0)  # replay no-ops
    t = HadoopTable(spark, loc)
    assert t.current_version() == 1
    assert t.read().columns == ["id", "ts"]
    assert t.snapshot().partition_cols == ["ts_day"]
    assert t.read().count() == 2


def test_incremental_scan_on_transform_table(spark, tmp_path):
    t = HadoopTable(spark, str(tmp_path / "inc"))
    mk = lambda lo, hi: spark.createDataFrame(
        [(i, datetime(2026, 1, 1 + i % 5)) for i in range(lo, hi)],
        "id long, ts timestamp",
    )
    t.append(mk(0, 10), partition_cols=["days(ts)"])
    v1 = t.current_version()
    t.append(mk(10, 25))
    delta = t.read_incremental(v1)
    assert sorted(r["id"] for r in delta.collect()) == list(range(10, 25))
    assert delta.columns == ["id", "ts"]


# -------------------------------------------------------------- back-compat
def test_legacy_manifest_without_spec_reads_as_identity(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, str(i % 3)) for i in range(12)], "id long, b string"
    )
    t = HadoopTable(spark, str(tmp_path / "lg"))
    t.append(df, partition_cols=["b"])
    # simulate a pre-transform manifest: strip the partition_spec key
    meta = os.path.join(t.root, "metadata", "v1.metadata.json")
    d = json.load(open(meta))
    assert d.pop("partition_spec") == [
        {"name": "b", "source": "b", "transform": "identity"}
    ]
    os.unlink(meta)
    with open(meta, "w") as fh:
        json.dump(d, fh)
    t2 = HadoopTable(spark, t.location)
    snap = t2.snapshot()
    assert snap.partition_spec == []
    assert [f.to_json() for f in snap.spec] == [
        {"name": "b", "source": "b", "transform": "identity"}
    ]
    assert t2.read().count() == 12
    # identity predicate pruning through the (implied) spec
    assert len(t2.plan_files(predicate=[("b", "=", "1")])) < len(
        t2.plan_files()
    )
    assert t2.read(predicate=[("b", "=", "1")]).count() == 4
    # appends continue to work against the legacy manifest
    t2.append(spark.createDataFrame([(100, "1")], "id long, b string"))
    assert HadoopTable(spark, t.location).read().count() == 13


def test_in_predicate_projects_onto_transforms(hidden_table, spark, tmp_path):
    """``in`` projects onto partition values member-by-member: equality
    projects through EVERY transform (bucket included), the file prunes
    only when all members miss, and results stay exact."""
    t, df = hidden_table
    n_all = len(t.plan_files())
    # bucket: two users hash to <= 2 buckets of 4
    pb = t.plan_files(predicate=[("user", "in", ("u3", "u7"))])
    assert 0 < len(pb) < n_all
    assert (
        t.read(predicate=[("user", "in", ("u3", "u7"))]).count()
        == df.filter("user in ('u3','u7')").count()
    )
    # day transform: two specific days
    days = (datetime(2026, 1, 5, 12, 0), datetime(2026, 1, 20, 3, 0))
    pd_ = t.plan_files(predicate=[("ts", "in", days)])
    assert 0 < len(pd_) < n_all
    assert (
        t.read(predicate=[("ts", "in", days)]).count()
        == df.filter(F.col("ts").isin(list(days))).count()
    )
    # identity partitioning: one member hits, others prune
    ti = HadoopTable(spark, str(tmp_path / "t_ident"))
    ti.append(
        spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3)], "sink string, k int"
        ),
        partition_cols=["sink"],
    )
    assert len(ti.plan_files(predicate=[("sink", "in", ("a", "z"))])) == 1
    assert len(ti.plan_files(predicate=[("sink", "in", ("x", "z"))])) == 0
