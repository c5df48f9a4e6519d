"""C4 cleaning-rule semantics (functions/c4.py). Oracle parity for the
contract shape is pinned by tests/test_oracle.py via the `c4_rules`
extra; these cover the published rule edges directly."""

from __future__ import annotations

from logparserhelper_spark.functions.c4 import c4_rules


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_line_filter_terminal_punct_and_min_words(spark):
    text = "\n".join(
        [
            "This sentence has enough words here.",   # kept
            "Too short words.",                        # < 5 words
            "this line has no terminal punctuation",   # no terminal
            'He said "stop right there please."',      # quote-terminal kept
            "  Padded line with five words too!  ",    # trimmed, kept
        ]
    )
    out = _by_id(c4_rules(spark.createDataFrame([(1, text)], ["doc_id", "text"])))[1]
    assert out["kept_lines"] == 3 and out["total_lines"] == 5
    assert out["c4_text"].split("\n") == [
        "This sentence has enough words here.",
        'He said "stop right there please."',
        "Padded line with five words too!",
    ]
    # sentence count across kept lines: 1 + 3 (both quotes + '.') + 1
    assert out["n_sentences"] == 5
    assert out["c4_pass"]


def test_crlf_lines_trim_before_terminal_test(spark):
    # review finding: F.trim strips spaces only — a CRLF corpus left
    # '\r' on every line, where Java's $ (matches before a final line
    # terminator) and the oracle's RE2 $ disagree. The regex trim makes
    # the decision engine-independent and keeps '\r' out of c4_text.
    text = "One two three four five.\r\nSix seven eight nine ten.\r"
    out = _by_id(c4_rules(spark.createDataFrame([(1, text)], ["doc_id", "text"])))[1]
    assert out["kept_lines"] == 2
    assert "\r" not in out["c4_text"]


def test_javascript_rule_is_line_level(spark):
    # the paper drops javascript-warning LINES, not whole pages
    text = "\n".join(
        [
            "A perfectly good content sentence here.",
            "Please enable JavaScript to continue reading now.",
            "Another perfectly good content sentence here.",
            "And one more good content sentence too.",
        ]
    )
    out = _by_id(c4_rules(spark.createDataFrame([(1, text)], ["doc_id", "text"])))[1]
    assert out["js_lines"] == 1
    assert out["kept_lines"] == 3
    assert "JavaScript" not in out["c4_text"]
    assert out["c4_pass"]  # the page survives; the warning line does not


def test_page_level_rules(spark):
    ok = "A good clean sentence right here."
    rows = [
        (1, "Lorem Ipsum dolor sit amet okay fine."),
        (2, "Some code follows { return now. }"),
        (3, "Closing brace only } in this sentence."),   # either brace drops
        (4, "One good sentence with enough words."),      # only 1 sentence
        (5, "\n".join([ok] * 3)),                          # 3 sentences: passes
    ]
    out = _by_id(c4_rules(spark.createDataFrame(rows, ["doc_id", "text"])))
    assert not out[1]["r_no_lorem"] and not out[1]["c4_pass"]
    assert not out[2]["r_no_brace"] and not out[2]["c4_pass"]
    assert not out[3]["r_no_brace"] and not out[3]["c4_pass"]
    assert out[4]["r_no_lorem"] and not out[4]["r_min_sentences"]
    assert out[5]["c4_pass"] and out[5]["n_sentences"] == 3


def test_blank_doc(spark):
    out = _by_id(c4_rules(spark.createDataFrame([(1, "")], ["doc_id", "text"])))[1]
    assert out["kept_lines"] == 0 and out["c4_text"] == ""
    assert out["n_sentences"] == 0 and not out["c4_pass"]
