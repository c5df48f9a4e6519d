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
