"""DSIR importance-weight semantics (functions/dsir.py). Oracle parity
for the contract shape is pinned by tests/test_oracle.py via the
`dsir_weights` extra; these cover the semantic edges."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from logparserhelper_spark.functions.dsir import dsir_logweights


def _mk(spark):
    rows = (
        # target docs: "alpha"-heavy vocabulary
        [(i, "alpha beta alpha gamma", True) for i in range(4)]
        # source-only docs: "zeta"-heavy vocabulary
        + [(10 + i, "zeta eta zeta theta", False) for i in range(4)]
        # mixed doc
        + [(20, "alpha zeta", False)]
    )
    return spark.createDataFrame(rows, ["doc_id", "text", "tgt"])


def test_target_like_docs_rank_higher(spark):
    out = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_logweights(_mk(spark), "tgt").collect()
    }
    # target-vocabulary docs must outscore source-only docs, mixed between
    assert out[0] > out[20] > out[10]
    assert out[0] > 0 > out[10]


def test_feature_count_is_unigrams_plus_bigrams(spark):
    out = {
        r["doc_id"]: r["n_features"]
        for r in dsir_logweights(_mk(spark), "tgt").collect()
    }
    assert out[0] == 4 + 3  # 4 words -> 4 unigrams + 3 bigrams
    assert out[20] == 2 + 1


def test_blank_and_single_word_docs(spark):
    df = spark.createDataFrame(
        [(1, "solo", True), (2, "   ", False), (3, "", False)],
        ["doc_id", "text", "tgt"],
    )
    rows = {r["doc_id"]: r for r in dsir_logweights(df, "tgt").collect()}
    # blank docs produce no row (documented contract); single word = 1 feat
    assert set(rows) == {1} and rows[1]["n_features"] == 1


def test_partitioning_invariance(spark):
    df = _mk(spark)
    a = sorted(map(tuple, dsir_logweights(df, "tgt").collect()))
    b = sorted(
        map(tuple, dsir_logweights(df.repartition(7, "text"), "tgt").collect())
    )
    assert a == b


def test_rejects_tiny_bucket_space(spark):
    with pytest.raises(ValueError):
        dsir_logweights(_mk(spark), "tgt", buckets=1)


def test_weights_shift_with_target_definition(spark):
    df = _mk(spark).withColumn("inv", ~F.col("tgt"))
    w_t = {r["doc_id"]: r["dsir_logweight"]
           for r in dsir_logweights(df, "tgt").collect()}
    w_i = {r["doc_id"]: r["dsir_logweight"]
           for r in dsir_logweights(df, "inv").collect()}
    # flipping the target flips the ranking direction
    assert w_t[0] > w_t[10] and w_i[10] > w_i[0]


def test_edge_whitespace_features(spark):
    # review finding: tab-only docs must produce no row; edge whitespace
    # must not emit phantom ''-token features
    df = spark.createDataFrame(
        [(1, "foo\n", True), (2, "\t", False), (3, "a  b", True)],
        ["doc_id", "text", "tgt"],
    )
    rows = {r["doc_id"]: r for r in dsir_logweights(df, "tgt").collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["n_features"] == 1  # just 'foo', no '' or 'foo ' bigram
    assert rows[3]["n_features"] == 3  # 'a','b','a b' — double space collapsed


def test_bucket_hash_modes_agree_in_distribution(spark):
    df = _mk(spark)
    fast = {r["doc_id"]: r for r in dsir_logweights(df, "tgt").collect()}
    slow = {r["doc_id"]: r
            for r in dsir_logweights(df, "tgt", bucket_hash="md5").collect()}
    # identical feature counts (hash-independent) and the same ranking
    # direction; exact weights differ (different bucket assignment)
    assert {k: v["n_features"] for k, v in fast.items()} == {
        k: v["n_features"] for k, v in slow.items()
    }
    assert fast[0]["dsir_logweight"] > fast[10]["dsir_logweight"]
    assert slow[0]["dsir_logweight"] > slow[10]["dsir_logweight"]
    with pytest.raises(ValueError):
        dsir_logweights(df, "tgt", bucket_hash="sha1")
