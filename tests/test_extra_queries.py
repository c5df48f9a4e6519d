"""The consolidated-out contract queries (EXTRA_QUERIES) stay oracle-checked.

Round 3 trimmed the driver-exposed registry to 50 entries (the driver's
correctness file records 50 rows); every query that lost its exposed slot —
either merged into a wider exposed query or covered by an overlapping one —
lives in EXTRA_QUERIES and is held to the exact same gate here: row count,
column-name set, and order-insensitive value hash vs its DuckDB oracle at
sf0.001.
"""

from __future__ import annotations

import os

import pytest

from logparserhelper_spark.plans.contract_queries import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
)

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def _value_hash(rows: list[dict]) -> str:
    import hashlib
    import math

    def canon(v) -> str:
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.6g}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    cols = sorted(rows[0].keys()) if rows else []
    lines = sorted("|".join(canon(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def test_registry_contract():
    # exactly 50 exposed (the driver's correctness-file envelope), every
    # exposed oracle keyed to an exposed query, extras fully oracle-covered
    assert len(QUERIES) == 50
    assert set(ORACLES) == set(QUERIES)  # every exposed query oracle-checked
    assert set(EXTRA_ORACLES) == set(EXTRA_QUERIES)
    assert not set(EXTRA_QUERIES) & set(QUERIES)
    assert len(EXTRA_QUERIES) >= 22  # consolidated-out + net-new capabilities


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, duck, name):
    sdf = EXTRA_QUERIES[name](spark, SF)
    srows = [r.asDict() for r in sdf.collect()]
    drows = duck.execute(EXTRA_ORACLES[name]).fetch_arrow_table().to_pylist()
    assert len(srows) == len(drows), f"{name}: row count"
    scols = sorted(srows[0]) if srows else sorted(sdf.columns)
    dcols = sorted(drows[0]) if drows else []
    if drows:
        assert scols == dcols, f"{name}: columns"
    assert _value_hash(srows) == _value_hash(drows), f"{name}: value hash"
