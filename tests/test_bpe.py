"""Byte-level BPE train/apply tests (functions/bpe.py): merge-scan
semantics, the classic Sennrich corpus, trainer parity against the DuckDB
recursive-CTE replay (an independent implementation of the same learning
rule), and the Spark apply path against a pure-Python recomputation.

The corpus-level Spark-vs-oracle gate lives in tests/test_extra_queries.py
(bpe_train_merges / bpe_tokenize run against their full SQL oracles at
both SFs); these tests pin the algorithm pieces in isolation.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from logparserhelper_spark.functions.bpe import (
    merge_word,
    tokenize_pretoken,
    train_bpe_merges,
)


def _hex(s: str) -> str:
    return s.encode("utf-8").hex()


def test_merge_word_scan_order():
    # consecutive occurrences both merge (the single-separator-encoding bug)
    assert merge_word(("a", "b", "a", "b"), "a", "b") == ("ab", "ab")
    # overlapping occurrences merge left-to-right non-overlapping
    assert merge_word(("a", "a", "a"), "a", "a") == ("aa", "a")
    assert merge_word(("a", "a", "a", "a"), "a", "a") == ("aa", "aa")
    # a merged token never re-pairs within the same pass
    assert merge_word(("x", "y", "y"), "x", "y") == ("xy", "y")
    assert merge_word(("q",), "a", "b") == ("q",)


def test_train_sennrich_example():
    """The textbook corpus (low×5, lower×2, newest×6, widest×3): first
    merge is ('e','s') at count 9, second ('es','t') at 9, third ('l','o')
    winning the 7-vs-7 tie against ('o','w') lexicographically."""
    wc = [(_hex("low"), 5), (_hex("lower"), 2), (_hex("newest"), 6), (_hex("widest"), 3)]
    merges = train_bpe_merges(wc, 3)
    e, s, t, l, o = _hex("e"), _hex("s"), _hex("t"), _hex("l"), _hex("o")
    assert merges == [(e, s), (e + s, t), (l, o)]
    # applying the merges tokenizes the training words consistently
    assert tokenize_pretoken(_hex("lowest"), tuple(merges)) == (
        l + o, _hex("w"), e + s + t,
    )


def test_train_stops_when_no_pairs():
    wc = [(_hex("a"), 10), (_hex("b"), 3)]
    assert train_bpe_merges(wc, 5) == []
    # one two-byte word -> exactly one merge possible
    assert len(train_bpe_merges([(_hex("ab"), 1)], 5)) == 1


def _oracle_merges(wc: list[tuple[str, int]], n: int) -> list[tuple[str, str]]:
    """Independent replay: the same recursive-CTE learning rule the
    contract oracle uses, on an explicit histogram."""
    con = duckdb.connect()
    con.execute("CREATE TABLE wh(w VARCHAR, cnt BIGINT)")
    con.executemany("INSERT INTO wh VALUES (?, ?)", wc)
    rows = con.execute(rf"""
WITH RECURSIVE
st(lvl, w, s, cnt, ml, mr) AS (
  SELECT 0, w, regexp_replace(w, '(..)', '<\1>', 'g'), cnt,
         NULL::VARCHAR, NULL::VARCHAR FROM wh
  UNION ALL
  SELECT lvl + 1, w,
         replace(s, '<' || best.l || '><' || best.r || '>',
                    '<' || best.l || best.r || '>'),
         cnt, best.l, best.r
  FROM st,
       (SELECT l, r FROM (
          SELECT tk[i] AS l, tk[i+1] AS r, SUM(cnt2) AS c
          FROM (SELECT regexp_extract_all(s, '<([0-9a-f]+)>', 1) AS tk,
                       cnt AS cnt2 FROM st),
               UNNEST(range(1, len(tk))) AS u(i)
          GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1
       )) AS best(l, r)
  WHERE lvl < {n}
)
SELECT ml, mr FROM (SELECT DISTINCT lvl, ml, mr FROM st WHERE ml IS NOT NULL)
ORDER BY lvl
""").fetchall()
    return [(l, r) for l, r in rows]


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(
        st.tuples(st.text(alphabet="abcdef x.", min_size=1, max_size=7),
                  st.integers(1, 50)),
        min_size=1, max_size=12, unique_by=lambda t: t[0],
    ),
    n=st.integers(1, 8),
)
def test_trainer_matches_recursive_cte(words, n):
    """Property: the driver-side trainer and the SQL recursive-CTE replay
    learn the identical merge sequence on arbitrary histograms — pair
    counting (zip-overlapping, weighted), tie-breaks, and the
    left-to-right merge application all agree."""
    wc = [(_hex(w), c) for w, c in words]
    assert train_bpe_merges(wc, n) == _oracle_merges(wc, n)


def test_apply_bpe_spark_matches_python(spark):
    """apply_bpe over a tiny DataFrame (incl. empty text, whitespace-only,
    unicode multi-byte) equals a pure-Python recomputation through the
    same pretokenizer + merge table."""
    import re

    from pyspark.sql import functions as F

    from logparserhelper_spark.functions.bpe import apply_bpe, train_bpe
    from logparserhelper_spark.functions.textstats import BPE_ISH_PATTERN

    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "",
        "   ",
        "préc préc 123 !!",
        "the the the",
        None,  # NULL text: all three outputs must agree (0 / 0 / '')
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    merges = train_bpe(df, "text", n_merges=10)
    out = {
        r["doc_id"]: (r["bpe_n_pretokens"], r["bpe_n_tokens"], r["bpe_first_tokens"])
        for r in apply_bpe(df, merges).collect()
    }
    # Java regex mirror: this pattern is ASCII-class-only so Python re
    # matches identically on these inputs
    rx = re.compile(BPE_ISH_PATTERN)
    mt = tuple(merges)
    for i, t in enumerate(texts):
        pres = rx.findall(t) if t is not None else []
        toks = [tokenize_pretoken(_hex(w), mt) for w in pres]
        exp_first = "|".join(toks[0]) if toks else ""
        assert out[i] == (len(pres), sum(len(x) for x in toks), exp_first), t
    # multi-byte pretoken round-trip: 'é' is two UTF-8 bytes -> two symbols
    # before any merge involving them
    assert len(tokenize_pretoken(_hex("é"), ())) == 2
