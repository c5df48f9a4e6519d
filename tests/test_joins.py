"""Temporal join operators (operators/joins.py) against brute-force oracles
on hand-built fixtures: as-of semantics (backward inclusive, null when no
prior right row, tie at equal ts matches) and range containment."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from logparserhelper_spark.operators.joins import asof_join, range_join_bucketed


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        (1, _ts(0), 10.0),
        (1, _ts(5), 11.0),
        (1, _ts(10), 12.0),
        (2, _ts(3), 20.0),
    ]
    return spark.createDataFrame(rows, "key long, ts timestamp, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, _ts(0), 100),   # equal ts -> inclusive match (10.0)
        (1, _ts(4, 59), 101),  # before second quote -> 10.0
        (1, _ts(5), 102),   # equal ts -> 11.0
        (1, _ts(59), 103),  # after everything -> 12.0
        (2, _ts(1), 200),   # before the only key-2 quote -> null
        (3, _ts(1), 300),   # key with no quotes -> null
    ]
    return spark.createDataFrame(rows, "key long, ts timestamp, trade_id long")


def test_asof_join_backward_inclusive(spark, quotes, trades):
    got = {
        r.trade_id: (r.px_asof, r.ts_asof)
        for r in asof_join(trades, quotes, by="key", right_value_cols=["px"]).collect()
    }
    assert got[100] == (10.0, _ts(0))
    assert got[101] == (10.0, _ts(0))
    assert got[102] == (11.0, _ts(5))
    assert got[103] == (12.0, _ts(10))
    assert got[200] == (None, None)
    assert got[300] == (None, None)
    assert len(got) == 6  # every left row survives exactly once


def test_asof_join_keeps_left_payload(spark, quotes, trades):
    out = asof_join(trades, quotes, by="key", right_value_cols=["px"])
    assert set(out.columns) == {"key", "ts", "trade_id", "px_asof", "ts_asof"}


def test_range_join_bucketed_equals_filter_join(spark, trades):
    iv_rows = [
        (1, _ts(0), _ts(5)),     # inclusive both ends: trades 100,101,102
        (1, _ts(30), _ts(59)),   # trade 103 at the inclusive end
        (2, _ts(2), _ts(3)),     # no key-2 trade inside
    ]
    iv = spark.createDataFrame(iv_rows, "key long, start timestamp, end timestamp")
    got = {
        (r.trade_id, r.start)
        for r in range_join_bucketed(trades, iv, by="key", bucket_secs=60).collect()
    }
    exp = {
        (r.trade_id, r.start)
        for r in trades.join(iv, "key")
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
        .collect()
    }
    assert got == exp
    assert {t for t, _ in got} == {100, 101, 102, 103}


def test_pii_bank_redacts(spark):
    from logparserhelper_spark.defaults import pii_transform_bank
    from logparserhelper_spark.oracle import apply_transform_bank

    bank = pii_transform_bank()
    out = apply_transform_bank(
        "mail bob.smith@corp.io or 192.168.0.1 or +555 123-4567 end", bank
    )
    assert out == "mail <EMAIL> or <IP> or <PHONE> end"
    # mixed-case emails are PII too
    assert apply_transform_bank("see John.Doe@Example.COM now", bank) == "see <EMAIL> now"
    # emails run first so a dotted-quad local part is not nibbled by the IP
    # pattern (the whole token, dots included, is one email)
    assert apply_transform_bank("a1.2.3.4@x.io b", bank) == "<EMAIL> b"


def test_repetition_stats_hand_values(spark):
    from logparserhelper_spark.functions.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),       # words: a x3, b x2 -> all 5 duplicated
            (2, "x y z"),           # no repetition
            (3, "solo"),            # single word: no bigrams
        ],
        "doc_id long, text string",
    )
    empty = spark.createDataFrame([(9, ""), (10, "   ")], "doc_id long, text string")
    assert repetition_stats(empty).count() == 0  # no phantom '' word rows
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[1].n_words == 5 and got[1].dup_words == 5
    assert got[1].dup_word_frac == 1.0
    # bigrams: 'a b' x2, 'b a' x2 -> top 2 of 4
    assert got[1].top_bigram_n == 2 and got[1].n_bigrams == 4
    assert got[1].top_bigram_frac == 0.5
    assert got[2].dup_words == 0 and got[2].top_bigram_n == 1
    assert got[3].n_bigrams is None and got[3].top_bigram_frac is None


def test_asof_join_randomized_vs_python_oracle(spark):
    """500 random events across 20 keys, duplicated timestamps on the left,
    vs a brute-force python oracle (max right ts <= left ts per key)."""
    import random

    rng = random.Random(7)
    rights = [
        (k, _ts(rng.randrange(0, 59), rng.randrange(0, 60)), float(i))
        for i, k in enumerate(rng.choices(range(20), k=200))
    ]
    # unique (key, ts) on the right, as the operator contract requires
    seen = set()
    rights = [r for r in rights if not (r[:2] in seen or seen.add(r[:2]))]
    lefts = [
        (k, _ts(rng.randrange(0, 59), rng.randrange(0, 60)), 1000 + i)
        for i, k in enumerate(rng.choices(range(22), k=300))
    ]
    rdf = spark.createDataFrame(rights, "key long, ts timestamp, px double")
    ldf = spark.createDataFrame(lefts, "key long, ts timestamp, trade_id long")
    got = {
        r.trade_id: r.px_asof
        for r in asof_join(ldf, rdf, by="key", right_value_cols=["px"]).collect()
    }
    by_key: dict[int, list] = {}
    for k, ts, px in rights:
        by_key.setdefault(k, []).append((ts, px))
    for k, ts, tid in lefts:
        cands = [(t, p) for (t, p) in by_key.get(k, []) if t <= ts]
        exp = max(cands)[1] if cands else None
        assert got[tid] == exp, tid
    assert len(got) == len(lefts)


def test_asof_join_null_timestamps(spark):
    """Null-ts right rows never match (they would otherwise sort nulls-first
    and leak into every left row); null-ts left rows survive unmatched."""
    quotes = spark.createDataFrame(
        [(1, None, 99.0), (1, _ts(5), 11.0)], "key long, ts timestamp, px double"
    )
    trades = spark.createDataFrame(
        [(1, _ts(1), 100), (1, _ts(6), 101), (1, None, 102)],
        "key long, ts timestamp, trade_id long",
    )
    got = {
        r.trade_id: r.px_asof
        for r in asof_join(trades, quotes, by="key", right_value_cols=["px"]).collect()
    }
    assert got == {100: None, 101: 11.0, 102: None}


def test_asof_join_null_right_values_not_forward_filled(spark):
    """A matched right row whose VALUE is null must yield null — not the
    previous non-null value (per-column ignorenulls would forward-fill and
    could stitch columns from different right rows)."""
    quotes = spark.createDataFrame(
        [(1, _ts(0), 10.0, 1.0), (1, _ts(5), None, 2.0)],
        "key long, ts timestamp, px double, qty double",
    )
    trades = spark.createDataFrame(
        [(1, _ts(6), 100)], "key long, ts timestamp, trade_id long"
    )
    row = asof_join(trades, quotes, by="key", right_value_cols=["px", "qty"]).collect()[0]
    # the t=5 row is the match: px null, qty 2.0, ts_asof t=5 — one coherent row
    assert row.px_asof is None
    assert row.qty_asof == 2.0
    assert row.ts_asof == _ts(5)


def test_asof_join_bucketed_equals_plain_hot_key(spark):
    """Mega-key mitigation: one key with 1e6 left rows beside normal keys.
    The (key, coarse-bucket) windowed path with boundary carry-in must
    return byte-identical rows to the single-window plain path."""
    hot_left = spark.range(1_000_000).select(
        F.lit(1).alias("key"),
        F.timestamp_seconds((F.col("id") * 7) % 864000).alias("ts"),
        F.col("id").alias("trade_id"),
    )
    cold_left = spark.range(1_000).select(
        F.lit(2).alias("key"),
        F.timestamp_seconds(F.col("id") * 11).alias("ts"),
        (F.col("id") + 2_000_000).alias("trade_id"),
    )
    orphan_left = spark.range(50).select(
        F.lit(3).alias("key"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        (F.col("id") + 3_000_000).alias("trade_id"),
    )
    left = hot_left.unionByName(cold_left).unionByName(orphan_left)
    right = spark.range(10_000).select(
        F.lit(1).alias("key"),
        F.timestamp_seconds(F.col("id") * 86).alias("ts"),  # unique (key, ts)
        F.col("id").cast("double").alias("px"),
    ).unionByName(
        spark.range(10).select(
            F.lit(2).alias("key"),
            F.timestamp_seconds(F.col("id") * 1000).alias("ts"),
            (F.col("id") + 10_000).cast("double").alias("px"),
        )
    )
    plain = asof_join(left, right, by="key", right_value_cols=["px"])
    bucketed = asof_join(
        left, right, by="key", right_value_cols=["px"], coarse_bucket_secs=3600
    )
    assert bucketed.count() == 1_001_050
    assert plain.exceptAll(bucketed).count() == 0
    assert bucketed.exceptAll(plain).count() == 0


def test_asof_join_bucketed_equals_plain_with_nulls(spark):
    """Randomized plain-vs-bucketed equality including null left timestamps
    and buckets that contain only left rows (carry must cross them)."""
    import random

    rng = random.Random(11)
    rights = [(k, _ts(m, s), float(100 * k + m)) for k in range(3)
              for m, s in {(rng.randrange(0, 59), rng.randrange(0, 60))
                           for _ in range(40)}]
    lefts = [
        (k, None if i % 17 == 0 else _ts(rng.randrange(0, 59), rng.randrange(0, 60)), i)
        for i, k in enumerate(rng.choices(range(4), k=400))
    ]
    rdf = spark.createDataFrame(rights, "key long, ts timestamp, px double")
    ldf = spark.createDataFrame(lefts, "key long, ts timestamp, trade_id long")
    plain = asof_join(ldf, rdf, by="key", right_value_cols=["px"])
    bucketed = asof_join(
        ldf, rdf, by="key", right_value_cols=["px"], coarse_bucket_secs=120
    )
    p = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in bucketed.collect()}
    assert p == b
    assert len(p) == 400


def test_asof_join_rejects_reserved_and_colliding_names(spark):
    import pytest as _pytest

    base_r = spark.createDataFrame([(1, _ts(0), 1.0)], "key long, ts timestamp, px double")
    bad_left = spark.createDataFrame([(1, _ts(1), 5)], "key long, ts timestamp, _r long")
    with _pytest.raises(ValueError, match="reserved internal"):
        asof_join(bad_left, base_r, by="key", right_value_cols=["px"])
    bad_right = spark.createDataFrame([(1, _ts(0), 0)], "key long, ts timestamp, _side long")
    good_left = spark.createDataFrame([(1, _ts(1), 7)], "key long, ts timestamp, trade_id long")
    with _pytest.raises(ValueError, match="reserved internal"):
        asof_join(good_left, bad_right, by="key")
    # output-name collision: right value 'trade' + suffix '_id'... use exact:
    clash_left = spark.createDataFrame(
        [(1, _ts(1), 7, 9.0)], "key long, ts timestamp, trade_id long, px_asof double"
    )
    with _pytest.raises(ValueError, match="collide with kept left"):
        asof_join(clash_left, base_r, by="key", right_value_cols=["px"])
