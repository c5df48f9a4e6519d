"""URL canonicalization unit tests (functions/urls.py) — the edge cases
the url_canonical_dedup fixture corpus doesn't reach. The corpus-level
Spark-vs-DuckDB gate lives in tests/test_extra_queries.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logparserhelper_spark.functions.urls import canonicalize_url, url_dedup


def _canon(spark, urls: list[str]) -> list:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]


CASES = [
    # scheme/host case + www + fragment
    ("HTTP://WWW.Example.COM/a#frag", "http://example.com/a"),
    # default ports drop, others stay; https:80 is NOT a default
    ("http://h.io:80/x", "http://h.io/x"),
    ("https://h.io:443/x", "https://h.io/x"),
    ("https://h.io:80/x", "https://h.io:80/x"),
    ("http://h.io:8080/x", "http://h.io:8080/x"),
    # dot segments: removal, root clamping, empty-segment collapse
    ("http://h.io/a/./b/../c", "http://h.io/a/c"),
    ("http://h.io/../../a", "http://h.io/a"),
    ("http://h.io/a//b///c/", "http://h.io/a/b/c"),
    ("http://h.io/a/b/..", "http://h.io/a"),
    # empty path and bare host
    ("http://h.io", "http://h.io/"),
    ("http://h.io/", "http://h.io/"),
    # query: utm drop, sort, empty params, emptied query loses '?'
    ("http://h.io/p?z=1&a=2&utm_campaign=x", "http://h.io/p?a=2&z=1"),
    ("http://h.io/p?utm_source=x&utm_medium=y", "http://h.io/p"),
    ("http://h.io/p?&&a=1&", "http://h.io/p?a=1"),
    # userinfo dropped
    ("http://user:pw@h.io/p", "http://h.io/p"),
    # a '?' INSIDE the fragment is fragment text, not a query
    ("http://h.io/p#a?b=1", "http://h.io/p"),
    ("http://h.io/p?a=1#frag?tab=2", "http://h.io/p?a=1"),
    # everything at once
    (
        "HTTPS://u@WWW.H.IO:443/a/./x/../y/?utm_s=1&b=2&a=1#top",
        "https://h.io/a/y?a=1&b=2",
    ),
]


def test_canonicalize_cases(spark):
    got = _canon(spark, [u for u, _ in CASES])
    for (u, want), g in zip(CASES, got):
        assert g == want, u


def test_non_url_is_null_not_guess(spark):
    assert _canon(spark, ["not a url", "h.io/path", ""]) == [None, None, None]
    # bracketed IPv6 authorities are the documented NULL boundary — the
    # ':'-split host/port parse would mangle them into colliding keys
    assert _canon(
        spark, ["http://[::1]/x", "http://[2001:db8::2]:8080/x"]
    ) == [None, None]


def test_unparseable_rows_are_singleton_groups(spark):
    """Distinct non-URL documents must never collapse into one NULL dedup
    group — each is its own kept representative."""
    rows = [(3, "not a url one"), (4, "another non url"), (5, "http://h.io/a")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_dedup(df).collect()}
    for i in (3, 4):
        assert out[i]["canonical_url"] is None
        assert out[i]["n_variants"] == 1 and out[i]["is_rep"], i
    assert out[5]["n_variants"] == 1 and out[5]["is_rep"]


def test_url_dedup_groups(spark):
    rows = [
        (1, "http://WWW.h.io:80/a/./b?utm_x=1"),
        (2, "HTTP://h.io/a/b"),
        (3, "http://h.io/a/b?c=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_dedup(df).collect()}
    assert out[1]["canonical_url"] == out[2]["canonical_url"] == "http://h.io/a/b"
    assert out[1]["n_variants"] == 2 and out[2]["n_variants"] == 2
    assert out[1]["is_rep"] and not out[2]["is_rep"]
    assert out[3]["n_variants"] == 1 and out[3]["is_rep"]
