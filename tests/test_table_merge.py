"""General MERGE INTO (sinks/hadoop_table.py merge(), sinks/table_sql.py):
ordered WHEN clauses, first-match-wins, file-granular copy-on-write, ANSI
multiple-matches rule, and the SQL frontend round-trip.

Reference parity note: the reference app (MaksimBrezho/logparserhelper) has
no table mutations (state is whole-file JSON overwrite,
utils/json_utils.py:21-27); MERGE is part of the Spark-first table surface
replacing it."""

from __future__ import annotations

import pytest

from logparserhelper_spark.sinks.hadoop_table import HadoopTable
from logparserhelper_spark.sinks.table_sql import table_sql


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def _base(spark, tmp_path, name="tm"):
    loc = str(tmp_path / name)
    t = HadoopTable(spark, loc)
    t.append(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, v string, n long"
        )
    )
    t.append(
        spark.createDataFrame(
            [(3, "c", 30), (4, "d", 40)], "k long, v string, n long"
        )
    )
    return loc, t


def test_merge_upsert_shape_matches_expected(spark, tmp_path):
    """UPDATE SET * + INSERT * is exactly the upsert contract, and only
    the files holding a matched key rewrite."""
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "B", 200), (5, "e", 50)], "k long, v string, n long"
    )
    s = t.merge(
        src,
        ["k"],
        [
            ("matched_update", None, "*"),
            ("not_matched_insert", None, "*"),
        ],
    )
    assert s.operation == "merge"
    assert _rows(t.read()) == [
        (1, "a", 10),
        (2, "B", 200),
        (3, "c", 30),
        (4, "d", 40),
        (5, "e", 50),
    ]
    # file-granular: the (3,4) file held no matched key -> carried
    assert s.summary["rewritten_files"] == 1


def test_merge_clause_order_first_match_wins(spark, tmp_path):
    """A DELETE clause ahead of the UPDATE claims its rows first; matched
    rows claimed by neither clause carry unchanged."""
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "del"), (2, "upd"), (3, "noop")], "k long, op string"
    )
    t.merge(
        src,
        ["k"],
        [
            ("matched_delete", "s.op = 'del'", None),
            ("matched_update", "s.op = 'upd'", {"v": "upper(t.v)"}),
            # op = 'noop' matches no clause -> row carried unchanged
        ],
    )
    assert _rows(t.read()) == [(2, "B", 20), (3, "c", 30), (4, "d", 40)]


def test_merge_expressions_see_both_aliases(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame([(1, 5), (2, 7)], "k long, add long")
    t.merge(
        src,
        ["k"],
        [("matched_update", None, {"n": "t.n + s.add"})],
    )
    assert _rows(t.read()) == [
        (1, "a", 15),
        (2, "b", 27),
        (3, "c", 30),
        (4, "d", 40),
    ]


def test_merge_insert_column_list_nulls_unspecified(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame([(9, "z")], "k long, v string")
    t.merge(
        src,
        ["k"],
        [("not_matched_insert", None, {"k": "s.k", "v": "s.v"})],
    )
    assert _rows(t.read()) == [
        (1, "a", 10),
        (2, "b", 20),
        (3, "c", 30),
        (4, "d", 40),
        (9, "z", None),
    ]


def test_merge_without_insert_discards_unmatched_source(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "A", 0), (99, "x", 0)], "k long, v string, n long"
    )
    t.merge(src, ["k"], [("matched_update", None, "*")])
    assert _rows(t.read()) == [
        (1, "A", 0),
        (2, "b", 20),
        (3, "c", 30),
        (4, "d", 40),
    ]


def test_merge_no_match_no_insert_is_noop(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(99, "x", 0)], "k long, v string, n long"
    )
    assert t.merge(src, ["k"], [("matched_update", None, "*")]) is None
    assert t.current_version() == 2


def test_merge_conditional_insert_filters_source(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(7, "y", 1), (8, "n", 0)], "k long, v string, keep long"
    )
    t.merge(
        src,
        ["k"],
        [(
            "not_matched_insert",
            "s.keep = 1",
            {"k": "s.k", "v": "s.v", "n": "s.keep * 100"},
        )],
    )
    assert _rows(t.read()) == [
        (1, "a", 10),
        (2, "b", 20),
        (3, "c", 30),
        (4, "d", 40),
        (7, "y", 100),
    ]


def test_merge_schema_evolution_via_star(spark, tmp_path):
    """A new source column + INSERT */UPDATE SET * evolves the schema
    additively; carried rows read the new column as NULL."""
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "B", 200, "en"), (5, "e", 50, "fr")],
        "k long, v string, n long, lang string",
    )
    t.merge(
        src,
        ["k"],
        [
            ("matched_update", None, "*"),
            ("not_matched_insert", None, "*"),
        ],
    )
    assert _rows(t.read()) == [
        (1, "a", 10, None),
        (2, "B", 200, "en"),
        (3, "c", 30, None),
        (4, "d", 40, None),
        (5, "e", 50, "fr"),
    ]


def test_merge_duplicate_source_keys_raise(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "x", 0), (1, "y", 0)], "k long, v string, n long"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge(src, ["k"], [("matched_update", None, "*")])


def test_merge_unconditional_clause_must_be_last(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame([(1, "x", 0)], "k long, v string, n long")
    with pytest.raises(ValueError, match="omit its condition"):
        t.merge(
            src,
            ["k"],
            [
                ("matched_update", None, "*"),
                ("matched_delete", "s.n = 0", None),
            ],
        )


def test_merge_validation_errors(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame([(1, "x", 0)], "k long, v string, n long")
    with pytest.raises(ValueError, match="unknown clause kind"):
        t.merge(src, ["k"], [("matched_upsert", None, "*")])
    with pytest.raises(ValueError, match="unknown column"):
        t.merge(src, ["k"], [("matched_update", None, {"zz": "s.v"})])
    with pytest.raises(ValueError, match="must exist in both"):
        t.merge(src, ["missing"], [("matched_update", None, "*")])
    with pytest.raises(ValueError, match="takes no payload"):
        t.merge(src, ["k"], [("matched_delete", None, {"v": "s.v"})])


def test_merge_does_not_resurrect_mor_deleted_rows(spark, tmp_path):
    """A row killed by a MoR delete is NOT matched (the merge scan
    applies delete files), so the key inserts fresh instead of
    resurrecting the dead row's file."""
    loc, t = _base(spark, tmp_path)
    t.delete([("k", "=", 2)], mode="merge-on-read")
    src = spark.createDataFrame(
        [(2, "NEW", 2000)], "k long, v string, n long"
    )
    t.merge(
        src,
        ["k"],
        [
            ("matched_update", None, "*"),
            ("not_matched_insert", None, "*"),
        ],
    )
    assert _rows(t.read()) == [
        (1, "a", 10),
        (2, "NEW", 2000),
        (3, "c", 30),
        (4, "d", 40),
    ]


def test_merge_changelog_replay_reproduces_table(spark, tmp_path):
    """read_changes treats merge as a scoped mutation: replaying the
    changelog from empty reproduces the post-merge table."""
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "del"), (2, "upd"), (5, "ins")], "k long, op string"
    )
    t.merge(
        src,
        ["k"],
        [
            ("matched_delete", "s.op = 'del'", None),
            ("matched_update", None, {"v": "s.op"}),
            ("not_matched_insert", None, {"k": "s.k", "v": "s.op"}),
        ],
    )
    ch = t.read_changes(0)
    cols = [c for c in ch.columns if not c.startswith("_")]
    state: dict[tuple, int] = {}
    for r in ch.collect():
        key = tuple(r[c] for c in cols)
        if r["_change_type"] == "insert":
            state[key] = state.get(key, 0) + 1
        else:
            state[key] -= 1
            if not state[key]:
                del state[key]
    replayed = sorted(
        (k for k, n in state.items() for _ in range(n)),
        key=lambda t_: tuple((x is None, x) for x in t_),
    )
    assert replayed == _rows(t.read().select(*cols))


def test_merge_sql_frontend_round_trip(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "del", 0), (2, "upd", 9), (6, "ins", 60)],
        "k long, op string, n long",
    )
    src.createOrReplaceTempView("merge_src_v")
    s = table_sql(
        spark,
        f"""MERGE INTO '{loc}' t USING merge_src_v s ON t.k = s.k
            WHEN MATCHED AND s.op = 'del' THEN DELETE
            WHEN MATCHED THEN UPDATE SET v = concat(t.v, '!'), n = s.n
            WHEN NOT MATCHED AND s.op = 'ins'
                THEN INSERT (k, v, n) VALUES (s.k, s.op, s.n + 1)""",
    )
    assert s.operation == "merge"
    assert _rows(t.read()) == [
        (2, "b!", 9),
        (3, "c", 30),
        (4, "d", 40),
        (6, "ins", 61),
    ]


def test_merge_sql_insert_star(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    spark.createDataFrame(
        [(5, "e", 50)], "k long, v string, n long"
    ).createOrReplaceTempView("merge_src_star")
    table_sql(
        spark,
        f"MERGE INTO '{loc}' t USING merge_src_star s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert (5, "e", 50) in _rows(t.read())


def test_merge_sql_strict_refusals(spark, tmp_path):
    loc, t = _base(spark, tmp_path)
    spark.createDataFrame([(1, "x")], "k long, v string") \
        .createOrReplaceTempView("merge_src_bad")
    with pytest.raises(ValueError, match="unsupported ON term"):
        table_sql(
            spark,
            f"MERGE INTO '{loc}' t USING merge_src_bad s ON t.k = s.other "
            "WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="unsupported ON term"):
        table_sql(
            spark,
            f"MERGE INTO '{loc}' t USING merge_src_bad s ON t.k > s.k "
            "WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="at least one WHEN"):
        table_sql(
            spark,
            f"MERGE INTO '{loc}' t USING merge_src_bad s ON t.k = s.k",
        )
    with pytest.raises(ValueError, match="missing THEN"):
        table_sql(
            spark,
            f"MERGE INTO '{loc}' t USING merge_src_bad s ON t.k = s.k "
            "WHEN MATCHED AND s.v = 'x' DELETE",
        )
    with pytest.raises(ValueError, match="MATCHED action"):
        table_sql(
            spark,
            f"MERGE INTO '{loc}' t USING merge_src_bad s ON t.k = s.k "
            "WHEN MATCHED THEN TRUNCATE",
        )


def test_merge_partitioned_table_rows_land_in_partitions(spark, tmp_path):
    """Merge over a partitioned table: inserted/updated rows restage
    under the table's layout and partition pruning still plans them."""
    loc = str(tmp_path / "tmp_part")
    t = HadoopTable(spark, loc)
    t.append(
        spark.createDataFrame(
            [(1, "x", "a"), (2, "y", "b")], "k long, v string, p string"
        ),
        partition_cols=["p"],
    )
    src = spark.createDataFrame(
        [(2, "Y", "b"), (3, "z", "c")], "k long, v string, p string"
    )
    t.merge(
        src,
        ["k"],
        [
            ("matched_update", None, "*"),
            ("not_matched_insert", None, "*"),
        ],
    )
    assert _rows(t.read(predicate=[("p", "=", "c")])) == [(3, "z", "c")]
    assert _rows(t.read()) == [
        (1, "x", "a"),
        (2, "Y", "b"),
        (3, "z", "c"),
    ]


# ---------------------------------------------------------------- MoR mode

_CLAUSES = [
    ("matched_delete", "s.op = 'del'", None),
    ("matched_update", "s.op = 'upd'", {"v": "upper(s.op)", "n": "t.n + 1"}),
    ("not_matched_insert", "s.op = 'ins'", "*"),
]


def _mor_src(spark):
    return spark.createDataFrame(
        [(1, "del", 0), (2, "upd", 0), (3, "noop", 0), (5, "ins", 50)],
        "k long, op string, n long",
    )


def test_merge_mor_matches_cow_clause_for_clause(spark, tmp_path):
    """mode='merge-on-read' produces the exact same table content as
    copy-on-write for the same clause list, while rewriting NOTHING:
    every pre-merge file is carried and the commit adds only a
    position-delete file plus the update/insert data file."""
    loc_c, tc = _base(spark, tmp_path, "cow")
    loc_m, tm = _base(spark, tmp_path, "mor")
    # clause payloads referencing t.* and s.* must behave identically
    src = _mor_src(spark)
    when = [
        ("matched_delete", "s.op = 'del'", None),
        ("matched_update", "s.op = 'upd'", {"v": "concat(t.v, s.op)"}),
        ("not_matched_insert", "s.op = 'ins'", "*"),
    ]
    sc = tc.merge(src, ["k"], when, mode="copy-on-write")
    before = {f.path for f in tm.snapshot().data_files}
    sm = tm.merge(src, ["k"], when, mode="merge-on-read")
    assert _rows(tm.read()) == _rows(tc.read())
    assert sm.summary["mode"] == "merge-on-read"
    # no rewrite: every old data file survives in the MoR snapshot
    assert before <= {f.path for f in sm.data_files}
    assert sm.summary["position_delete_files"] == 1
    # claimed = the deleted row + the updated row (insert has no coords)
    assert sm.summary["claimed_records"] == 2
    # CoW did rewrite (different mechanics, same answer)
    assert sc.summary["rewritten_files"] >= 1


def test_merge_mor_write_mode_property_resolves(spark, tmp_path):
    """mode=None resolves write.merge.mode (Iceberg's knob); an explicit
    argument overrides it; a bogus value refuses."""
    loc, t = _base(spark, tmp_path)
    t.set_properties({"write.merge.mode": "merge-on-read"})
    s = t.merge(
        _mor_src(spark).filter("op = 'upd'"),
        ["k"],
        [("matched_update", None, {"n": "t.n + 100"})],
    )
    assert s.summary["mode"] == "merge-on-read"
    assert {r["n"] for r in t.read().filter("k = 2").collect()} == {120}
    s2 = t.merge(
        _mor_src(spark).filter("op = 'ins'"),
        ["k"],
        [("not_matched_insert", None, "*")],
        mode="copy-on-write",
    )
    assert "position_delete_files" not in s2.summary
    with pytest.raises(ValueError, match="unknown merge mode"):
        t.merge(
            _mor_src(spark), ["k"],
            [("matched_update", None, "*")], mode="bogus",
        )


def test_merge_mor_compact_materializes(spark, tmp_path):
    """compact() after a MoR merge materializes the position deletes:
    content unchanged, delete files retired."""
    loc, t = _base(spark, tmp_path)
    t.merge(_mor_src(spark), ["k"], _CLAUSES, mode="merge-on-read")
    want = _rows(t.read())
    assert any(f.content != "data" for f in t.snapshot().files)
    t.compact()
    assert not any(f.content != "data" for f in t.snapshot().files)
    assert _rows(t.read()) == want


def test_merge_mor_dead_rows_insert_fresh(spark, tmp_path):
    """A row killed by an earlier MoR delete is unmatched for a MoR
    merge too (the touched-file scan is delete-applied), so its key
    inserts fresh rather than resurrecting."""
    loc, t = _base(spark, tmp_path)
    t.delete([("k", "=", 2)], mode="merge-on-read")
    src = spark.createDataFrame(
        [(2, "NEW", 2000)], "k long, v string, n long"
    )
    t.merge(
        src,
        ["k"],
        [
            ("matched_update", None, "*"),
            ("not_matched_insert", None, "*"),
        ],
        mode="merge-on-read",
    )
    assert _rows(t.read()) == [
        (1, "a", 10),
        (2, "NEW", 2000),
        (3, "c", 30),
        (4, "d", 40),
    ]


def test_merge_mor_delete_only_and_insert_only(spark, tmp_path):
    """Degenerate clause lists stage only what they need: delete-only
    adds no data file, insert-only adds no position-delete file, and a
    no-claim merge is a no-op returning None."""
    loc, t = _base(spark, tmp_path)
    s = t.merge(
        _mor_src(spark),
        ["k"],
        [("matched_delete", "s.op = 'del'", None)],
        mode="merge-on-read",
    )
    assert s.summary["added_files"] == 0
    assert s.summary["position_delete_files"] == 1
    assert _rows(t.read().select("k")) == [(2,), (3,), (4,)]
    s = t.merge(
        _mor_src(spark),
        ["k"],
        [("not_matched_insert", "s.op = 'ins'", "*")],
        mode="merge-on-read",
    )
    assert s.summary["position_delete_files"] == 0
    assert s.summary["added_files"] == 1
    assert _rows(t.read().select("k")) == [(2,), (3,), (4,), (5,)]
    assert (
        t.merge(
            _mor_src(spark).filter("op = 'noop'"),
            ["k"],
            [("matched_update", "s.op = 'never'", "*")],
            mode="merge-on-read",
        )
        is None
    )


def test_merge_mor_changelog_replay_reproduces_table(spark, tmp_path):
    """read_changes treats a MoR merge like any mutation snapshot:
    replaying from empty reproduces the post-merge table."""
    loc, t = _base(spark, tmp_path)
    t.merge(_mor_src(spark), ["k"], _CLAUSES, mode="merge-on-read")
    ch = t.read_changes(0)
    cols = [c for c in ch.columns if not c.startswith("_")]
    state: dict[tuple, int] = {}
    for r in ch.collect():
        key = tuple(r[c] for c in cols)
        if r["_change_type"] == "insert":
            state[key] = state.get(key, 0) + 1
        else:
            state[key] -= 1
            if not state[key]:
                del state[key]
    replayed = sorted(
        (k for k, n in state.items() for _ in range(n)),
        key=lambda t_: tuple((x is None, x) for x in t_),
    )
    assert replayed == _rows(t.read().select(*cols))


def test_merge_mor_concurrent_added_key_conflicts(spark, tmp_path):
    """Serializable isolation holds in MoR mode too: rows a concurrent
    commit appends carrying a merged key abort the merge (they dodged
    the clause logic)."""
    from logparserhelper_spark.sinks.hadoop_table import CompactionConflict

    loc, t = _base(spark, tmp_path)
    orig_stage = HadoopTable._stage
    state = {"fired": False}

    def racing_stage(self, df, pcols, spec=None, **kw):
        out = orig_stage(self, df, pcols, spec, **kw)
        if not state["fired"]:
            state["fired"] = True
            racer = HadoopTable(spark, loc)
            HadoopTable._stage = orig_stage
            try:
                racer.append(
                    spark.createDataFrame(
                        [(2, "raced", 999)], "k long, v string, n long"
                    )
                )
            finally:
                HadoopTable._stage = racing_stage
        return out

    HadoopTable._stage = racing_stage
    try:
        with pytest.raises(CompactionConflict, match="merged key"):
            t.merge(
                _mor_src(spark).filter("op = 'upd'"),
                ["k"],
                [("matched_update", None, {"n": "t.n + 1"})],
                mode="merge-on-read",
            )
    finally:
        HadoopTable._stage = orig_stage
    # the racer's row is intact and unmodified
    assert (2, "raced", 999) in _rows(t.read())


def test_merge_mor_partitioned_rows_move_and_prune(spark, tmp_path):
    """MoR merge over a partitioned table: insert/update rows restage
    under the table's layout and pruned reads still plan them."""
    loc = str(tmp_path / "tmp_mor_part")
    t = HadoopTable(spark, loc)
    t.append(
        spark.createDataFrame(
            [(1, "x", "a"), (2, "y", "b")], "k long, v string, p string"
        ),
        partition_cols=["p"],
    )
    src = spark.createDataFrame(
        [(2, "Y", "c"), (3, "z", "c")], "k long, v string, p string"
    )
    t.merge(
        src,
        ["k"],
        [
            ("matched_update", None, "*"),
            ("not_matched_insert", None, "*"),
        ],
        mode="merge-on-read",
    )
    # k=2 moved partitions b -> c via the update's new partition value
    assert _rows(t.read(predicate=[("p", "=", "c")])) == [
        (2, "Y", "c"),
        (3, "z", "c"),
    ]
    assert _rows(t.read()) == [(1, "x", "a"), (2, "Y", "c"), (3, "z", "c")]


# ------------------------------------------ WHEN NOT MATCHED BY SOURCE
def _nms_base(spark, tmp_path):
    loc = str(tmp_path / "t_nms")
    t = HadoopTable(spark, loc)
    t.append(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
            "k long, v string, n long",
        ).coalesce(1)
    )
    return loc, t


def test_merge_nms_delete_sync(spark, tmp_path):
    """The canonical use: make the table mirror the source — rows
    absent from the source are deleted, present ones upsert."""
    loc, t = _nms_base(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "B", 200), (5, "E", 500)], "k long, v string, n long"
    )
    src.createOrReplaceTempView("nms_src")
    table_sql(
        spark,
        f"""
        MERGE INTO '{loc}' t USING nms_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE
        """,
    )
    assert set(_rows(t.read())) == {(2, "B", 200), (5, "E", 500)}


def test_merge_nms_update_and_condition(spark, tmp_path):
    loc, t = _nms_base(spark, tmp_path)
    src = spark.createDataFrame([(1,)], "k long")
    t.merge(
        src.selectExpr("k", "'x' AS v", "CAST(0 AS long) AS n"),
        ["k"],
        [
            ("nms_delete", "t.n >= 40", None),
            ("nms_update", None, {"v": "concat(t.v, '_stale')"}),
        ],
    )
    assert set(_rows(t.read())) == {
        (1, "a", 10),  # matched, no matched clause: carried unchanged
        (2, "b_stale", 20),
        (3, "c_stale", 30),
        # 4 deleted by the conditional nms clause (first-match-wins)
    }


def test_merge_nms_cow_mor_equivalence(spark, tmp_path):
    src = spark.createDataFrame(
        [(2, "B", 200), (9, "I", 900)], "k long, v string, n long"
    )
    when = [
        ("matched_update", None, "*"),
        ("not_matched_insert", None, "*"),
        ("nms_update", "t.k = 1", {"n": "t.n * 100"}),
        ("nms_delete", None, None),
    ]
    results = []
    for mode in ("copy-on-write", "merge-on-read"):
        loc, t = _nms_base(spark, tmp_path / mode)
        s = t.merge(src, ["k"], when, mode=mode)
        assert s is not None
        results.append(set(_rows(t.read())))
        if mode == "merge-on-read":
            # MoR adds delete + data files, rewrites nothing
            assert s.summary["mode"] == "merge-on-read"
            assert s.summary["position_delete_files"] >= 1
    assert results[0] == results[1] == {
        (1, "a", 1000),  # nms_update (first match wins over nms_delete)
        (2, "B", 200),  # matched update
        (9, "I", 900),  # insert
        # 3, 4: nms_delete
    }


def test_merge_nms_validation(spark, tmp_path):
    loc, t = _nms_base(spark, tmp_path)
    src = spark.createDataFrame([(1, "x", 0)], "k long, v string, n long")
    with pytest.raises(ValueError, match="SET \\*"):
        t.merge(src, ["k"], [("nms_update", None, "*")])
    with pytest.raises(ValueError, match="no payload"):
        t.merge(src, ["k"], [("nms_delete", None, {"v": "1"})])
    with pytest.raises(ValueError, match="shadows"):
        t.merge(
            src,
            ["k"],
            [("nms_delete", None, None), ("nms_update", "t.k = 1", {"v": "'x'"})],
        )
    # SQL grammar refusals
    src.createOrReplaceTempView("nms_bad_src")
    with pytest.raises(ValueError, match="no source row"):
        table_sql(
            spark,
            f"MERGE INTO '{loc}' t USING nms_bad_src s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
        )
    with pytest.raises(ValueError, match="BY qualifier"):
        table_sql(
            spark,
            f"MERGE INTO '{loc}' t USING nms_bad_src s ON t.k = s.k "
            "WHEN MATCHED BY SOURCE THEN DELETE",
        )
    with pytest.raises(ValueError, match="INSERT"):
        table_sql(
            spark,
            f"MERGE INTO '{loc}' t USING nms_bad_src s ON t.k = s.k "
            "WHEN NOT MATCHED BY SOURCE THEN INSERT *",
        )


def test_merge_nms_by_target_alias(spark, tmp_path):
    loc, t = _nms_base(spark, tmp_path)
    src = spark.createDataFrame([(9, "I", 900)], "k long, v string, n long")
    src.createOrReplaceTempView("nms_bt_src")
    table_sql(
        spark,
        f"MERGE INTO '{loc}' t USING nms_bt_src s ON t.k = s.k "
        "WHEN NOT MATCHED BY TARGET THEN INSERT *",
    )
    assert (9, "I", 900) in _rows(t.read())


def test_merge_nms_concurrent_append_conflicts(spark, tmp_path):
    """With an NMS clause, ANY concurrently added row dodged the clause
    logic (its key need not be in the source) — always a conflict."""
    from logparserhelper_spark.sinks.hadoop_table import CompactionConflict

    loc, t = _nms_base(spark, tmp_path)
    orig_stage = HadoopTable._stage
    state = {"fired": False}

    def racing_stage(self, df, pcols, spec=None, **kw):
        out = orig_stage(self, df, pcols, spec, **kw)
        if not state["fired"]:
            state["fired"] = True
            racer = HadoopTable(spark, loc)
            HadoopTable._stage = orig_stage
            try:
                racer.append(
                    spark.createDataFrame(
                        [(77, "raced", 0)], "k long, v string, n long"
                    )
                )
            finally:
                HadoopTable._stage = racing_stage
        return out

    src = spark.createDataFrame([(1, "x", 0)], "k long, v string, n long")
    HadoopTable._stage = racing_stage
    try:
        with pytest.raises(CompactionConflict, match="NOT MATCHED BY SOURCE"):
            t.merge(src, ["k"], [("nms_delete", None, None)])
    finally:
        HadoopTable._stage = orig_stage
    assert (77, "raced", 0) in _rows(t.read())
