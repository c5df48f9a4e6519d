"""Named refs on the snapshot table (sinks/hadoop_table.py): tags with
expiry pinning, rollback-as-new-commit, branches with write-audit-publish
fast-forward, and table-wide orphan liveness across chains.

Reference parity note: the reference app (MaksimBrezho/logparserhelper)
has no table layer at all — its persistence is whole-file JSON overwrite
(utils/json_utils.py:21-27). This suite pins the Spark-first replacement:
the public Apache Iceberg ref semantics (tags/branches/rollback) over the
shim's file-per-version metadata chain.
"""

from __future__ import annotations

import os
import threading

import pytest

from logparserhelper_spark.sinks.hadoop_table import (
    CommitConflict,
    HadoopTable,
    NoSuchTable,
)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def _mk(spark, tmp_path, name="t"):
    t = HadoopTable(spark, str(tmp_path / name))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    return t


# ------------------------------------------------------------------- tags
def test_tag_create_read_drop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create_tag("corpus-v1")  # pins current (v1)
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))

    assert _rows(t.read(ref="corpus-v1")) == [(1, "a"), (2, "b")]
    assert _rows(t.read_ref("corpus-v1")) == [(1, "a"), (2, "b")]
    assert _rows(t.read()) == [(1, "a"), (2, "b"), (3, "c")]
    assert t.refs()["corpus-v1"]["type"] == "tag"
    assert t.refs()["corpus-v1"]["version"] == 1

    with pytest.raises(ValueError):
        t.create_tag("corpus-v1")  # immutable: no silent repoint
    with pytest.raises(ValueError):
        t.read(version=1, ref="corpus-v1")  # one or the other
    with pytest.raises(ValueError):
        t.read(ref="nope")

    t.drop_tag("corpus-v1")
    assert "corpus-v1" not in t.refs()
    with pytest.raises(ValueError):
        t.drop_tag("corpus-v1")


def test_tag_explicit_version_and_missing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    t.create_tag("first", version=1)
    assert _rows(t.read(ref="first")) == [(1, "a"), (2, "b")]
    with pytest.raises(NoSuchTable):
        t.create_tag("ghost", version=99)


def test_tag_pins_snapshot_through_expiry(spark, tmp_path):
    """The Iceberg ref-retention rule: a tagged snapshot (and its files)
    survive expire_snapshots regardless of keep_last, until the tag is
    dropped."""
    t = _mk(spark, tmp_path)
    t.create_tag("audit")
    tagged_files = [
        os.path.join(t.root, f.path) for f in t.snapshot(1).files
    ]
    t.overwrite_all(
        spark.createDataFrame([(9, "z")], "id long, v string")
    )  # v1's files now referenced ONLY by the tag
    t.append(spark.createDataFrame([(10, "y")], "id long, v string"))

    dropped = t.expire_snapshots(keep_last=1, cleanup_older_than_sec=0)
    assert 1 not in dropped and 2 in dropped
    assert _rows(t.read(ref="audit")) == [(1, "a"), (2, "b")]
    assert all(os.path.exists(p) for p in tagged_files)

    # dropping the tag releases the pin: next expiry reclaims it
    t.drop_tag("audit")
    dropped = t.expire_snapshots(keep_last=1, cleanup_older_than_sec=0)
    assert 1 in dropped
    assert not any(os.path.exists(p) for p in tagged_files)


def test_concurrent_tag_writers_both_land(spark, tmp_path):
    """The refs chain is CAS'd: two racing tag creators serialize, both
    tags exist afterwards."""
    t = _mk(spark, tmp_path)
    errs = []

    def mk(name):
        try:
            t.create_tag(name)
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    th = [threading.Thread(target=mk, args=(f"tag-{i}",)) for i in range(4)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    assert {f"tag-{i}" for i in range(4)} <= set(t.refs())


# --------------------------------------------------------------- rollback
def test_rollback_is_a_new_commit_sharing_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1_paths = {f.path for f in t.snapshot(1).files}
    t.overwrite_all(spark.createDataFrame([(9, "z")], "id long, v string"))
    assert _rows(t.read()) == [(9, "z")]

    s = t.rollback(1)
    assert s.version == 3 and s.operation == "rollback"
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    # manifest republished by reference: no data moved or copied
    assert {f.path for f in t.snapshot(3).files} == v1_paths
    # history intact — the overwrite is still time-travelable
    assert _rows(t.read(version=2)) == [(9, "z")]
    assert t.rollback(1).version == 3  # already there: no-op commit


# --------------------------------------------------------------- branches
def test_branch_isolation_and_listing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("wap")
    assert t.branches() == ["wap"]
    assert _rows(b.read()) == [(1, "a"), (2, "b")]  # fork carries main

    b.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    assert _rows(b.read()) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(t.read()) == [(1, "a"), (2, "b")]  # main untouched
    assert t.current_version() == 1

    with pytest.raises(ValueError):
        t.create_branch("wap")
    with pytest.raises(ValueError):
        t.create_branch("../escape")
    with pytest.raises(ValueError):
        b.create_branch("nested")  # branches fork from main only
    with pytest.raises(ValueError):
        b.create_tag("x")  # tags live on the main chain


def test_fast_forward_publishes_and_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = t.create_branch("audit")
    b.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    b.append(spark.createDataFrame([(4, "d")], "id long, v string"))

    s = t.fast_forward("audit")
    assert s.operation == "fast-forward"
    assert _rows(t.read()) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    # published by reference: main's manifest is the branch head's
    assert {f.path for f in s.files} == {
        f.path for f in b.snapshot().files
    }

    # main advanced past the fork point -> a second publish must refuse
    b2 = t.create_branch("late")
    b2.append(spark.createDataFrame([(5, "e")], "id long, v string"))
    t.append(spark.createDataFrame([(6, "f")], "id long, v string"))
    with pytest.raises(CommitConflict):
        t.fast_forward("late")
    with pytest.raises(ValueError):
        t.fast_forward("ghost")


def test_branch_files_live_until_branch_dropped(spark, tmp_path):
    """Table-wide orphan liveness: files exclusive to a branch manifest
    survive main's cleanup; dropping the branch releases them."""
    t = _mk(spark, tmp_path)
    b = t.create_branch("wip")
    b.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    only_branch = {
        os.path.join(t.root, f.path)
        for f in b.snapshot().files
        if f.path not in {g.path for g in t.snapshot().files}
    }
    assert only_branch

    t.cleanup_orphans(older_than_sec=0)
    assert all(os.path.exists(p) for p in only_branch)
    assert _rows(b.read()) == [(1, "a"), (2, "b"), (3, "c")]

    t.drop_branch("wip")
    assert t.branches() == []
    removed = t.cleanup_orphans(older_than_sec=0)
    assert not any(os.path.exists(p) for p in only_branch)
    assert removed  # the branch-exclusive data was reclaimed
    with pytest.raises(ValueError):
        t.drop_branch("wip")


def test_write_audit_publish_end_to_end(spark, tmp_path):
    """The WAP flow a training-data pipeline wants: stage on a branch,
    audit the staged table, publish atomically, then maintain."""
    t = _mk(spark, tmp_path)
    b = t.create_branch("ingest-2026-08-17")
    b.append(spark.createDataFrame([(3, "c"), (4, "d")], "id long, v string"))

    # audit: consumers of main never see staged rows
    assert len(_rows(b.read())) == 4 and len(_rows(t.read())) == 2

    t.fast_forward("ingest-2026-08-17")
    t.drop_branch("ingest-2026-08-17")
    assert len(_rows(t.read())) == 4
    # maintenance after publish keeps everything readable
    t.cleanup_orphans(older_than_sec=0)
    assert len(_rows(t.read())) == 4


def test_branch_mutations_full_family(spark, tmp_path):
    """upsert / delete / compact all work on a branch view and stay
    invisible to main until fast-forward."""
    t = _mk(spark, tmp_path)
    b = t.create_branch("mut")
    b.upsert(
        spark.createDataFrame([(2, "B"), (5, "e")], "id long, v string"),
        key_cols=["id"],
    )
    b.delete([("id", "=", 1)])
    assert _rows(b.read()) == [(2, "B"), (5, "e")]
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    b.compact(target_file_bytes=1 << 20)
    assert _rows(b.read()) == [(2, "B"), (5, "e")]
    t.fast_forward("mut")
    assert _rows(t.read()) == [(2, "B"), (5, "e")]


def test_branch_names_validated_everywhere(spark, tmp_path):
    """Branch names are metadata-path components: every entry point that
    turns one into a path validates it (ADVICE r7 — drop_branch('../..')
    previously resolved to the table root and rmtree'd the whole table)."""
    t = _mk(spark, tmp_path, "t_names")
    t.create_branch("wip")
    for bad in ("../..", "../../x", "a/b", "", ".hidden", "x" * 65):
        with pytest.raises(ValueError, match="invalid branch name"):
            t.drop_branch(bad)
        with pytest.raises(ValueError, match="invalid branch name"):
            t.branch(bad)
        with pytest.raises(ValueError, match="invalid branch name"):
            t.create_branch(bad)
    # the table (and the real branch) survived every attempt
    assert t.exists() and t.branches() == ["wip"]
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    t.drop_branch("wip")
    assert t.branches() == []


def test_rollback_across_update_spec_restores_partitioning(spark, tmp_path):
    """rollback() across a metadata-only update_spec commit (same files,
    same schema, different partition spec) must land a real rollback
    commit restoring the old spec — the idempotence short-circuit
    previously compared only schema+files and returned the NEW spec's
    snapshot untouched (ADVICE r7)."""
    t = HadoopTable(spark, str(tmp_path / "t_rbspec"))
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    v1 = t.current_version()
    assert t.snapshot(v1).partition_cols == []
    t.update_spec(["v"])
    assert t.snapshot().partition_cols == ["v"]
    snap = t.rollback(v1)
    assert snap.version == t.current_version() > v1
    assert snap.operation == "rollback"
    assert snap.partition_cols == []
    # and NOW it is idempotent: a second rollback is a no-op
    again = t.rollback(v1)
    assert again.version == snap.version
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
