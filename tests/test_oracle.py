"""Ring 1 — reference-semantics unit tests (pure Python, no Spark).

Oracle = Python ``re`` (the engine the reference itself calls,
core/regex_highlighter.py:1,19,22; gui/log_generator.py:3,44). The golden
matrix test reproduces SURVEY.md §2 Table A numbers from the reference's own
bank x corpus.
"""

from __future__ import annotations

import json
import os

import pytest

from logparserhelper_spark import oracle
from logparserhelper_spark.banks import (
    CompiledBank,
    PatternBank,
    TransformBank,
    TransformEntry,
    bank_from_dicts,
    get_compiled_bank,
    load_pattern_bank,
    load_transform_bank,
)
from logparserhelper_spark.colors import PALETTE, color_for, generate_distinct_colors
from logparserhelper_spark.defaults import default_pattern_bank


@pytest.fixture(scope="module")
def bank() -> PatternBank:
    b = default_pattern_bank()
    assert len(b.entries) == 8
    return b


# --- O4 span extraction -----------------------------------------------------


def test_span_extraction_basic(bank):
    line = "2025-06-06T01:02:03 started"
    spans = oracle.extract_spans(line, bank)
    assert spans == [(0, 0, 19, "2025-06-06T01:02:03")]


def test_duplicate_pattern_multicast(bank):
    # p4 (HDFS Timestamp) == p5 (Zookeeper Timestamp): identical pattern
    # strings, each producing its own full span set (data/patterns.json:19-26).
    line = "2025-06-06 01:02:03,123 - INFO [main] - ok"
    spans = oracle.extract_spans(line, bank)
    pids = [s[0] for s in spans]
    assert pids == [4, 5]
    assert spans[0][1:] == spans[1][1:]


def test_multi_match_per_line(bank):
    # the Linux golden's 2-match case: header timestamp + in-message timestamp
    line = "Jun  9 06:06:20 combo kernel: session opened at Jun  9 06:06:19"
    spans = [s for s in oracle.extract_spans(line, bank) if s[0] == 7]
    assert len(spans) == 2
    assert spans[0][1] == 0 and spans[1][1] > spans[0][2]


def test_overlapping_spans_across_patterns_coexist(bank):
    # WinEvt (p2/p6) and nothing else here; now craft ISO8601 inside an HDFS ts:
    # "2025-06-06 01:02:03,123" matches p4/p5; no overlap with p0 (needs 'T').
    # Overlap case: RFC2822 contains a WinEvt-like fragment? Use a direct one:
    line = "01/02/2025 03:04:05"
    spans = oracle.extract_spans(line, bank)
    assert [s[0] for s in spans] == [2, 6]  # duplicate WinEvt patterns coexist


def test_empty_and_no_match(bank):
    assert oracle.extract_spans("", bank) == []
    assert oracle.extract_spans("no dates here", bank) == []


# --- compiled bank == oracle -------------------------------------------------


def test_compiled_bank_matches_oracle(bank):
    lines = [
        "2025-06-06T01:02:03 started",
        "2025-06-06 01:02:03,123 - INFO",
        "01/02/2025 03:04:05 event",
        "Jun  9 06:06:20 combo sshd[1]: x Jun  9 06:06:21",
        "[12/Jun/2025:01:02:03 +0000] GET /",
        "Mon, 9 Jun 2025 01:02:03 +0000 mail",
        "plain text, nothing to see",
        "",
    ]
    cb = get_compiled_bank(bank.spec())
    for line in lines:
        assert cb.extract(line) == oracle.extract_spans(line, bank), line


def test_compiled_bank_dedups_but_multicasts(bank):
    cb = get_compiled_bank(bank.spec())
    assert len(cb.groups) == 6  # 8 entries, 6 distinct patterns
    fanout = {pid for _rx, pids in cb.groups for pid in pids}
    assert fanout == set(range(8))


def test_compiled_bank_bad_pattern_skipped():
    b = bank_from_dicts(
        [{"name": "ok", "pattern": r"\d+"}, {"name": "bad", "pattern": "(unclosed"}]
    )
    cb = CompiledBank(b.spec())
    assert cb.bad_ids == {1}
    assert cb.extract("a 12 b") == [(0, 2, 4, "12")]


def test_prefilter_disabled_for_backrefs():
    b = bank_from_dicts(
        [{"name": "br", "pattern": r"(\d)\1"}, {"name": "w", "pattern": r"xyz"}]
    )
    cb = CompiledBank(b.spec())
    assert cb.prefilter is None
    assert cb.extract("a 22 xyz") == [(0, 2, 4, "22"), (1, 5, 8, "xyz")]


# --- O7 template substitution ------------------------------------------------


def test_transform_default_and_backrefs():
    assert oracle.apply_transform("at 2025-06-06 end", r"\d{4}-\d{2}-\d{2}") == (
        "at <DATE> end"
    )
    assert (
        oracle.apply_transform(
            "2025-06-06", r"(\d{4})-(\d{2})-(\d{2})", r"<DATE \2/\3/\1>"
        )
        == "<DATE 06/06/2025>"
    )
    assert (
        oracle.apply_transform("12:34", r"(?P<h>\d{2}):(?P<m>\d{2})", r"\g<h>h\g<m>")
        == "12h34"
    )


def test_transform_error_fallback():
    assert oracle.apply_transform("keep me", "(unclosed", "X") == "keep me"


def test_transform_bank_enabled_filter():
    bank = TransformBank(
        entries=(
            TransformEntry(pattern=r"\d+", replacement="<N>"),
            TransformEntry(pattern=r"<N>", replacement="GONE", enabled=False),
            TransformEntry(pattern="(bad", replacement="X"),
        )
    )
    assert oracle.apply_transform_bank("a 12 b", bank) == "a <N> b"
    assert bank.spec() == ((r"\d+", "<N>"), ("(bad", "X"))


# --- O2 bank load defaults ---------------------------------------------------


def test_bank_load_missing_file(tmp_path):
    assert load_pattern_bank(str(tmp_path / "nope.json")).entries == ()
    assert load_transform_bank(str(tmp_path / "nope.json")).entries == ()


def test_bank_load_corrupt_file(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text("{not json", encoding="utf-8")
    assert load_pattern_bank(str(p)).entries == ()
    assert load_transform_bank(str(p)).entries == ()


def test_bank_version_stable(bank):
    assert bank.version == default_pattern_bank().version
    other = bank_from_dicts([{"name": "x", "pattern": "y"}])
    assert other.version != bank.version


# --- O5 color cycling --------------------------------------------------------


def test_color_cycling():
    assert color_for(0) == PALETTE[0]
    assert color_for(13) == PALETTE[3]
    colors = generate_distinct_colors(23)
    assert len(colors) >= 23
    for i in range(23):
        assert colors[i] == PALETTE[i % 10] == color_for(i)


# --- golden coverage matrix (reference bank x reference corpora) -------------

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "coverage_reference_corpus.json")


def test_golden_matrix(bank, reference_corpora):
    with open(GOLDEN_PATH, "r", encoding="utf-8") as f:
        golden = json.load(f)
    for corpus, lines in reference_corpora.items():
        counts = oracle.coverage_counts(lines, bank)
        expected = {int(k): v for k, v in golden[corpus]["pattern_counts"].items()}
        assert counts == expected, corpus
    # load-bearing spot checks from SURVEY.md §2
    linux = reference_corpora["Linux"]
    assert oracle.coverage_counts(linux, bank)[7] == 710
    zk = reference_corpora["Zookeeper"]
    zc = oracle.coverage_counts(zk, bank)
    assert zc[4] == 2000 and zc[5] == 2000


def test_golden_linux_histogram(bank, reference_corpora):
    hist = oracle.matched_line_histogram(reference_corpora["Linux"], bank)
    assert hist == {1: 198, 2: 256}
