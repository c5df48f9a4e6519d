"""SQL frontend for snapshot-table DDL/DML/maintenance
(sinks/table_sql.py): each statement maps onto exactly one HadoopTable
API call with identical semantics; anything outside the strict grammar
raises rather than half-parsing.

Reference parity note: the reference app (MaksimBrezho/logparserhelper)
has no SQL surface — its persistence is whole-file JSON overwrite
(utils/json_utils.py:21-27).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logparserhelper_spark.sinks.hadoop_table import HadoopTable
from logparserhelper_spark.sinks.table_sql import table_sql


def _mk(spark, path):
    t = HadoopTable(spark, str(path))
    t.append(
        spark.createDataFrame(
            [(i, i * 2, "u%d" % i) for i in range(10)],
            "k int, v int, name string",
        )
    )
    return t


def test_ddl_statements(spark, tmp_path):
    loc = str(tmp_path / "t")
    t = _mk(spark, loc)
    s = table_sql(spark, f"ALTER TABLE '{loc}' RENAME COLUMN v TO value")
    assert s.operation == "evolve-schema"
    assert "value" in t.read().columns
    table_sql(spark, f"ALTER TABLE '{loc}' ALTER COLUMN value TYPE bigint")
    assert dict(t.read().dtypes)["value"] == "bigint"
    table_sql(
        spark, f"ALTER TABLE '{loc}' ADD COLUMN lang string DEFAULT 'en'"
    )
    assert {r.lang for r in t.read().collect()} == {"en"}
    table_sql(spark, f"ALTER TABLE '{loc}' DROP COLUMN name;")
    assert "name" not in t.read().columns
    table_sql(
        spark,
        f"ALTER TABLE '{loc}' SET TBLPROPERTIES "
        "('history.keep-last'='2', 'owner'='corpus')",
    )
    assert t.properties()["owner"] == "corpus"
    table_sql(spark, f"ALTER TABLE '{loc}' UNSET TBLPROPERTIES ('owner')")
    assert "owner" not in t.properties()


def test_delete_and_procedures(spark, tmp_path):
    loc = str(tmp_path / "t")
    t = _mk(spark, loc)
    s = table_sql(
        spark, f"DELETE FROM '{loc}' WHERE k >= 3 AND k <= 4"
    )
    assert s.operation == "delete"
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2] + list(
        range(5, 10)
    )
    table_sql(spark, f"DELETE FROM '{loc}' WHERE name IS NULL") is None
    # Iceberg procedure names work, with name => value args
    t.append(spark.createDataFrame([(99, 0, "x")], "k int, v int, name string"))
    out = table_sql(spark, f"CALL system.rewrite_data_files('{loc}')")
    assert out is not None and out.operation == "compact"
    dropped = table_sql(
        spark, f"CALL expire_snapshots('{loc}', keep_last => 1, "
        "cleanup_older_than_sec => 0)"
    )
    assert len(t.versions()) == 1 and dropped
    res = table_sql(spark, f"CALL maintain('{loc}', keep_last => 1)")
    assert "expired_versions" in res
    assert table_sql(spark, f"VACUUM '{loc}'") == []
    # rollback procedure
    v = t.current_version()
    t.append(spark.createDataFrame([(100, 0, "y")], "k int, v int, name string"))
    table_sql(
        spark, f"CALL rollback_to_snapshot('{loc}', version => {v})"
    )
    assert 100 not in {r.k for r in t.read().collect()}


def test_strict_grammar(spark, tmp_path):
    loc = str(tmp_path / "t")
    _mk(spark, loc)
    with pytest.raises(ValueError, match="unsupported statement"):
        table_sql(spark, f"SELECT * FROM '{loc}'")
    with pytest.raises(ValueError, match="unsupported"):
        table_sql(spark, f"DELETE FROM '{loc}' WHERE k = 1 OR k = 2")
    with pytest.raises(ValueError, match="unsupported literal"):
        table_sql(spark, f"DELETE FROM '{loc}' WHERE k = abc")
    with pytest.raises(ValueError, match="unknown procedure"):
        table_sql(spark, f"CALL explode('{loc}')")
    # string literals with escaped quotes round-trip
    table_sql(
        spark,
        f"ALTER TABLE '{loc}' SET TBLPROPERTIES ('note'='it''s fine')",
    )
    t = HadoopTable(spark, loc)
    assert t.properties()["note"] == "it's fine"


def test_review_hardening(spark, tmp_path):
    loc = str(tmp_path / "t")
    t = _mk(spark, loc)
    # == is a reachable operator
    s = table_sql(spark, f"DELETE FROM '{loc}' WHERE k == 9")
    assert s is not None and 9 not in {r.k for r in t.read().collect()}
    # strict TBLPROPERTIES: garbage between pairs raises, nothing applies
    with pytest.raises(ValueError, match="TBLPROPERTIES"):
        table_sql(
            spark,
            f"ALTER TABLE '{loc}' SET TBLPROPERTIES "
            "('a'='1' GARBAGE 'b'='2')",
        )
    with pytest.raises(ValueError, match="TBLPROPERTIES"):
        table_sql(
            spark,
            f"ALTER TABLE '{loc}' SET TBLPROPERTIES ('a'='1', 'b')",
        )
    assert "a" not in t.properties()
    with pytest.raises(ValueError, match="TBLPROPERTIES"):
        table_sql(
            spark, f"ALTER TABLE '{loc}' UNSET TBLPROPERTIES ('a' junk)"
        )
    # rollback arg validation
    with pytest.raises(ValueError, match="version =>"):
        table_sql(spark, f"CALL rollback_to_snapshot('{loc}')")
    with pytest.raises(ValueError, match="unknown arguments"):
        table_sql(
            spark,
            f"CALL rollback_to_snapshot('{loc}', version => 1, oops => 2)",
        )
