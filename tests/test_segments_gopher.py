"""Semantic edge tests for CCNet segment dedup and Gopher quality rules.

Oracle parity for the contract shapes (paragraph_dedup, gopher_rules) is
pinned by tests/test_oracle.py through the EXTRA_QUERIES gate; these tests
cover the edges the contract corpus can't reach: separator mode, keep
policy, min_chars exemption, fully-dropped documents, and line-based
Gopher rules (the testdata corpus has no newlines).
"""

from __future__ import annotations

import pytest

from logparserhelper_spark.functions.gopher import gopher_rules
from logparserhelper_spark.functions.segments import segment_dedup


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


@pytest.fixture()
def line_docs(spark):
    rows = [
        # doc 1: unique body + shared boilerplate footer
        (1, "alpha beta gamma\nCookie Notice Applies\nunique one"),
        # doc 2: same footer (should drop here), plus blank line (kept)
        (2, "delta epsilon\n\ncookie   notice APPLIES\nunique two"),
        # doc 3: nothing but two copies of the footer -> fully dropped
        (3, "Cookie Notice Applies\ncookie notice applies"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_dedup_keep_first(line_docs):
    out = _by_id(segment_dedup(line_docs, sep="\n", min_chars=1, keep="first"))
    # doc 1 saw the footer first -> keeps everything
    assert out[1]["text"] == "alpha beta gamma\nCookie Notice Applies\nunique one"
    assert out[1]["dropped_segments"] == 0
    # doc 2: footer normalizes to the same key (case + whitespace collapse)
    # and drops; the blank line is min_chars-exempt and survives
    assert out[2]["text"] == "delta epsilon\n\nunique two"
    assert out[2]["kept_segments"] == 3
    assert out[2]["dropped_segments"] == 1
    # doc 3: first copy already burned by doc 1; second is an in-doc dup.
    # Everything drops but the document row itself survives, empty.
    assert out[3]["text"] == ""
    assert out[3]["kept_segments"] == 0
    assert out[3]["dropped_segments"] == 2


def test_line_dedup_keep_none(line_docs):
    out = _by_id(segment_dedup(line_docs, sep="\n", min_chars=1, keep="none"))
    # keep='none' drops every copy of a duplicated segment, doc 1 included
    assert out[1]["text"] == "alpha beta gamma\nunique one"
    assert out[1]["dropped_segments"] == 1
    assert out[3]["text"] == ""


def test_line_dedup_min_chars_exemption(spark):
    rows = [(1, "ok\nlong shared segment"), (2, "ok\nlong shared segment")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = _by_id(segment_dedup(df, sep="\n", min_chars=3, keep="first"))
    # 'ok' is under min_chars -> exempt in BOTH docs; the long segment dedups
    assert out[1]["text"] == "ok\nlong shared segment"
    assert out[2]["text"] == "ok"
    assert out[2]["dropped_segments"] == 1


def test_chunk_mode_counts(spark):
    # 11 words at chunk_words=4 -> segments of 4/4/3
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k"), (2, "a b c d x y z")],
        ["doc_id", "text"],
    )
    out = _by_id(segment_dedup(df, chunk_words=4, min_chars=1, keep="first"))
    assert out[1]["kept_segments"] == 3
    assert out[1]["text"] == "a b c d e f g h i j k"
    # doc 2 shares its first 4-word chunk with doc 1 -> dropped
    assert out[2]["text"] == "x y z"
    assert out[2]["dropped_segments"] == 1


def test_segment_dedup_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        segment_dedup(df, keep="last")
    with pytest.raises(ValueError):
        segment_dedup(df, chunk_words=0)


def test_gopher_line_rules_and_blank(spark):
    bullety = "\n".join(["- item one", "* item two", "• item three", "tail"])
    dotty = "\n".join(["first part...", "second...", "clean line", "end..."])
    rows = [(1, bullety), (2, dotty), (3, "   ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = _by_id(
        gopher_rules(
            df,
            min_words=1,
            min_stop_hits=0,
            max_bullet_line_frac=0.5,
            max_ellipsis_line_frac=0.5,
        )
    )
    assert out[1]["bullet_line_frac"] == 0.75
    assert not out[1]["r_bullets"]
    assert out[2]["ellipsis_line_frac"] == 0.75
    assert not out[2]["r_ellipsis"]
    # blank doc: everything zero, word-count rule fails even at min_words=1
    assert out[3]["word_count"] == 0
    assert out[3]["mean_word_len"] == 0.0
    assert not out[3]["r_word_count"]
    assert not out[3]["gopher_pass"]


def test_gopher_stop_hits_distinct(spark):
    # 'the' twice still counts once; symbol ratio counts '#' and '...'
    df = spark.createDataFrame(
        [(1, "the the of and ### word ... tail")], ["doc_id", "text"]
    )
    row = _by_id(gopher_rules(df, min_words=1, min_stop_hits=2))[1]
    assert row["stop_hits"] == 3  # the, of, and
    assert row["r_stops"]
    assert row["word_count"] == 8
    assert row["symbol_ratio"] == pytest.approx(4 / 8)  # 3x'#' + 1x'...'


def test_line_dedup_crlf_and_tab_edges(spark):
    # review finding: '\r'-only lines must be blank-exempt and 'hello\r'
    # must key equal to 'hello' across mixed LF/CRLF documents
    rows = [
        (1, "hello\r\nworld"),          # CRLF doc: lines 'hello\r', 'world'
        (2, "hello\nworld"),            # LF doc: same logical content
        (3, "\r\n\r"),                  # blank CR lines only
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = _by_id(segment_dedup(df, sep="\n", min_chars=1, keep="first"))
    # doc 2's 'hello' and 'world' are dups of doc 1's (CR-normalized) lines
    assert out[2]["dropped_segments"] == 2 and out[2]["text"] == ""
    # doc 3: both lines normalize to '' -> min_chars-exempt, all kept
    assert out[3]["dropped_segments"] == 0
    assert out[3]["kept_segments"] == 2


def test_gopher_edge_whitespace_no_phantom_tokens(spark):
    rows = [(1, "alpha beta gamma\n"), (2, "\t\t"), (3, "  x  ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = _by_id(gopher_rules(df, min_words=1, min_stop_hits=0))
    # trailing newline must not add a phantom '' token
    assert out[1]["word_count"] == 3
    assert out[1]["alpha_word_frac"] == 1.0
    assert out[1]["mean_word_len"] == 4.6667  # 14 chars / 3 words
    # tab-only doc is blank: zero words, rules fail
    assert out[2]["word_count"] == 0 and not out[2]["gopher_pass"]
    assert out[3]["word_count"] == 1
