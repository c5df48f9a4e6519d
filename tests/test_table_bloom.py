"""Manifest-level bloom-filter file skipping
(sinks/hadoop_table.py:_bloom_build/_bloom_absent + the
write.metadata.bloom-filter-columns property): plan-time point-lookup
pruning where min/max bounds can't bite (high-cardinality columns with
overlapping per-file ranges), conservative on every ambiguity.

Reference parity note: the reference app (MaksimBrezho/logparserhelper)
rescans whole files per query (main_window.py); plan-time skipping is part
of the Spark-first table surface replacing that."""

from __future__ import annotations

import datetime as dt

from logparserhelper_spark.sinks.hadoop_table import (
    HadoopTable,
    _bloom_absent,
    _bloom_build,
)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def _mk(spark, tmp_path, name="tb"):
    """Two single-file appends whose id/u ranges fully INTERLEAVE, so
    min/max bounds never separate them — only the bloom can."""
    loc = str(tmp_path / name)
    t = HadoopTable(spark, loc)
    t.append(
        spark.createDataFrame([(0, "seed")], "id long, u string").coalesce(1)
    )
    t.set_properties({"write.metadata.bloom-filter-columns": "u,id"})
    evens = [(i, f"u-{i:06d}") for i in range(0, 1000, 2)]
    odds = [(i, f"u-{i:06d}") for i in range(1, 1000, 2)]
    t.append(spark.createDataFrame(evens, "id long, u string").coalesce(1))
    t.append(spark.createDataFrame(odds, "id long, u string").coalesce(1))
    return t


def test_blooms_harvested_only_for_configured_columns(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files = t.snapshot().data_files
    pre = [f for f in files if f.records == 1]  # the pre-property seed
    post = [f for f in files if f.records > 1]
    assert pre and all(f.blooms is None for f in pre)
    assert post and all(
        set(f.blooms) == {"u", "id"}
        and f.blooms["u"]["kind"] == "str"
        and f.blooms["id"]["kind"] == "int"
        for f in post
    )


def test_point_lookup_prunes_where_bounds_cannot(spark, tmp_path):
    """u-000501 lives only in the odd file, but both files span the full
    [u-000000, u-000999] range: bounds keep both, the bloom keeps one
    (plus the conservative bloom-less seed)."""
    t = _mk(spark, tmp_path)
    n_all = len(t.snapshot().data_files)
    assert n_all == 3
    planned = t.plan_files(predicate=[("u", "=", "u-000501")])
    # the seed file's bounds exclude the probe (min=max='seed'), the
    # even file's BLOOM excludes it: one file plans
    assert len(planned) == 1 and planned[0].blooms
    assert _rows(t.read(predicate=[("u", "=", "u-000501")])) == [
        (501, "u-000501")
    ]
    # int column too (seed pruned by bounds, odd file by bloom)
    assert len(t.plan_files(predicate=[("id", "=", 500)])) == 1
    assert _rows(t.read(predicate=[("id", "=", 500)])) == [(500, "u-000500")]
    # a value in NO file: every file pruned (seed by bounds, the rest
    # by bloom) and the read is exactly empty
    assert len(t.plan_files(predicate=[("u", "=", "u-777777")])) == 0
    assert t.read(predicate=[("u", "=", "u-777777")]).count() == 0


def test_in_list_members_prune_independently(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # both members absent everywhere -> zero files plan
    assert len(t.plan_files(predicate=[("u", "in", ["zzz", "u-999999"])])) == 0
    # one present member keeps exactly its file
    planned = t.plan_files(predicate=[("u", "in", ["zzz", "u-000500"])])
    assert len(planned) == 1
    assert _rows(
        t.read(predicate=[("u", "in", ["zzz", "u-000500"])])
    ) == [(500, "u-000500")]


def test_kind_mismatch_never_consults_bloom(spark, tmp_path):
    """A datetime constant against a date column must not consult the
    date bloom (different byte encodings): the file stays planned and
    Spark's date->timestamp coercion finds the row."""
    loc = str(tmp_path / "tbd")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(0,)], "x long"))  # pre-property seed
    t.set_properties({"write.metadata.bloom-filter-columns": "d"})
    t.append(
        spark.createDataFrame(
            [(dt.date(2024, 1, 5), 1), (dt.date(2024, 1, 6), 2)],
            "d date, n long",
        ).coalesce(1)
    )
    f = [f for f in t.snapshot().data_files if f.blooms]
    assert f and f[0].blooms["d"]["kind"] == "date"
    planned = t.plan_files(
        predicate=[("d", "=", dt.datetime(2024, 1, 5, 0, 0, 0))]
    )
    assert any(p.blooms for p in planned)  # the bloomed file survived
    got = t.read(predicate=[("d", "=", dt.datetime(2024, 1, 5))]).collect()
    assert [(r["d"], r["n"]) for r in got] == [(dt.date(2024, 1, 5), 1)]
    # the same-kind constant DOES use the bloom: an absent date prunes
    assert not [
        p
        for p in t.plan_files(predicate=[("d", "=", dt.date(2030, 1, 1))])
        if p.blooms
    ]


def test_nested_column_bloom_is_silent_noop(spark, tmp_path):
    """A struct column named in the property must be a no-op, not a
    crash (pyarrow's unique kernel has no nested implementation) — the
    type eligibility check runs BEFORE any data is read."""
    loc = str(tmp_path / "tbnst")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(0,)], "x long"))
    t.set_properties(
        {"write.metadata.bloom-filter-columns": "props,id"}
    )
    t.append(
        spark.createDataFrame(
            [(1, {"a": 1}), (2, {"a": 2})],
            "id long, props struct<a: long>",
        ).coalesce(1)
    )
    f = [f for f in t.snapshot().data_files if f.blooms]
    assert f and set(f[0].blooms) == {"id"}  # struct skipped, int kept
    assert t.read().count() == 3


def test_float_columns_refuse_blooms(spark, tmp_path):
    """float equality is rounding-fragile: the property on a float
    column is a no-op (no bloom entry), never a wrong prune."""
    loc = str(tmp_path / "tbf")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(0,)], "x long"))
    t.set_properties({"write.metadata.bloom-filter-columns": "f"})
    t.append(
        spark.createDataFrame([(0.5, 1), (1.5, 2)], "f double, n long")
    )
    assert all(f.blooms is None for f in t.snapshot().data_files)
    assert t.read(predicate=[("f", ">", 1.0)]).count() == 1


def test_saturated_bloom_not_stored(spark, tmp_path):
    """ndv above the bit budget would have FPR ~1 — pure metadata
    weight, so it is not stored and pruning falls back to bounds."""
    loc = str(tmp_path / "tbs")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(0, "seed")], "id long, u string"))
    t.set_properties(
        {
            "write.metadata.bloom-filter-columns": "u",
            "write.metadata.bloom-filter-bits": "64",
        }
    )
    t.append(
        spark.createDataFrame(
            [(i, f"u-{i}") for i in range(100)], "id long, u string"
        ).coalesce(1)
    )
    assert all(f.blooms is None for f in t.snapshot().data_files)


def test_nulls_excluded_and_null_predicates_unaffected(spark, tmp_path):
    loc = str(tmp_path / "tbn")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(0, "x")], "id long, u string"))
    t.set_properties({"write.metadata.bloom-filter-columns": "u"})
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "c")], "id long, u string"
        ).coalesce(1)
    )
    f = [f for f in t.snapshot().data_files if f.blooms]
    assert f  # nulls did not disable the bloom
    assert t.read(predicate=[("u", "is_null")]).count() == 1
    assert _rows(t.read(predicate=[("u", "=", "a")]).select("id")) == [(1,)]


def test_rename_translates_bloom_lookup_by_field_id(spark, tmp_path):
    """After rename_column the predicate names the NEW name; blooms are
    keyed by the file's physical name, so the id translation must route
    the lookup (same path the stats take)."""
    t = _mk(spark, tmp_path)
    t.rename_column("u", "uid")
    assert len(t.plan_files(predicate=[("uid", "=", "u-000501")])) == 1
    assert _rows(t.read(predicate=[("uid", "=", "u-000501")])) == [
        (501, "u-000501")
    ]
    assert len(t.plan_files(predicate=[("uid", "=", "u-777777")])) == 0


def test_compact_regenerates_blooms(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.compact()
    files = t.snapshot().data_files
    assert files and all(f.blooms and "u" in f.blooms for f in files)
    assert _rows(t.read(predicate=[("u", "=", "u-000501")])) == [
        (501, "u-000501")
    ]


def test_delete_files_carry_no_blooms(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete([("id", "=", 2)], mode="merge-on-read")
    dels = [f for f in t.snapshot().files if f.content != "data"]
    assert dels and all(f.blooms is None for f in dels)
    # and the dead row is gone even though its file still plans
    assert t.read(predicate=[("id", "=", 2)]).count() == 0


def test_bloom_build_and_absent_unit():
    """Pure-unit contract: membership never false-negative, kind
    mismatch and malformed blooms never prune."""
    b = _bloom_build(["a", "b", "c", None], 1024)
    assert b["kind"] == "str"
    assert not _bloom_absent(b, "a")
    assert not _bloom_absent(b, "b")
    assert _bloom_absent(b, "zzz")
    assert not _bloom_absent(b, 5)  # int constant vs str bloom: keep
    assert not _bloom_absent(None, "a")
    assert not _bloom_absent({"kind": "str"}, "a")  # malformed: keep
    # int family: bool never participates, mixed kinds refuse
    bi = _bloom_build([1, 2, 3], 1024)
    assert _bloom_absent(bi, 99) and not _bloom_absent(bi, 2)
    assert _bloom_build([True, False], 1024) is None
    assert _bloom_build([1, "x"], 1024) is None
    assert _bloom_build([0.5], 1024) is None
    assert _bloom_build([], 1024) is None
    # saturation guard
    assert _bloom_build(list(range(100)), 64) is None


def test_timestamp_column_bloom(spark, tmp_path):
    """Timestamp values round-trip the bloom encoding: what pyarrow
    yields at harvest and what a predicate constant encodes must agree
    (the fixed-precision ISO form, UTC session)."""
    loc = str(tmp_path / "tbts")
    t = HadoopTable(spark, loc)
    t.append(spark.createDataFrame([(0,)], "x long"))
    t.set_properties({"write.metadata.bloom-filter-columns": "ts"})
    rows = [
        (dt.datetime(2024, 1, 5, 10, 30, 0, 123456), 1),
        (dt.datetime(2024, 1, 6, 0, 0, 0), 2),
    ]
    t.append(
        spark.createDataFrame(rows, "ts timestamp, n long").coalesce(1)
    )
    f = [f for f in t.snapshot().data_files if f.blooms]
    assert f and f[0].blooms["ts"]["kind"] == "ts"
    # present value: file planned AND row found (no false negative)
    got = t.read(
        predicate=[("ts", "=", dt.datetime(2024, 1, 5, 10, 30, 0, 123456))]
    ).collect()
    assert [r["n"] for r in got] == [1]
    # absent same-kind value inside the min/max range: bloom prunes
    assert not [
        p
        for p in t.plan_files(
            predicate=[("ts", "=", dt.datetime(2024, 1, 5, 12, 0, 0))]
        )
        if p.blooms
    ]
    # a tz-AWARE constant naming the same instant must also match (the
    # bloom key UTC-normalizes exactly like _stat_value)
    aware = dt.datetime(
        2024, 1, 5, 11, 30, 0, 123456,
        tzinfo=dt.timezone(dt.timedelta(hours=1)),
    )
    got = t.read(predicate=[("ts", "=", aware)]).collect()
    assert [r["n"] for r in got] == [1]
