"""Pure-Python oracle for the reference semantics (no Spark).

This module is the ground truth the Spark pipeline is tested against
(SURVEY.md §5 Ring 1/Ring 2). It reimplements, with plain Python ``re`` —
the exact engine the reference uses — the observable behavior of:

- O4 multi-pattern span extraction (core/regex_highlighter.py:16-25):
  per pattern in bank order, ``finditer`` over the text; patterns are
  independent (overlapping spans across patterns coexist); duplicate bank
  entries each produce their own full span set.
- O7 template substitution (gui/log_generator.py:40-48): ``re.sub`` with the
  entry's replacement template ("<DATE>" default, :42); ``re.error`` falls
  back to the input (:43-46).
- O8 enabled-filter (gui/log_generator.py:47,76-81).
- coverage: per-pattern match counts — the implicit aggregate the reference's
  tag sets define.

Deliberately naive and sequential: correctness mirror, not performance.
"""

from __future__ import annotations

import re
from collections import Counter

from logparserhelper_spark.banks import PatternBank, TransformBank


def extract_spans(text: str, bank: PatternBank) -> list[tuple[int, int, int, str]]:
    """(pattern_id, start, end, match) spans, one finditer pass per bank
    entry in bank order — including duplicates (no dedup here: the oracle
    mirrors the reference literally; the Spark path dedups + fans out and
    must produce the identical set)."""
    out: list[tuple[int, int, int, str]] = []
    for e in bank.entries:
        try:
            rx = re.compile(e.pattern)
        except re.error:
            continue
        for m in rx.finditer(text):
            out.append((e.pattern_id, m.start(), m.end(), m.group(0)))
    out.sort(key=lambda t: (t[0], t[1]))
    return out


def coverage_counts(lines: list[str], bank: PatternBank) -> dict[int, int]:
    """Per-pattern total match counts over a corpus of lines — the golden
    matrix of SURVEY.md §2 (e.g. Linux_2k p7=710, Zookeeper_2k p4=p5=2000)."""
    counts: Counter[int] = Counter({e.pattern_id: 0 for e in bank.entries})
    for line in lines:
        for pid, _s, _e, _m in extract_spans(line, bank):
            counts[pid] += 1
    return dict(counts)


def matched_line_histogram(lines: list[str], bank: PatternBank) -> dict[int, int]:
    """matches-per-line histogram over lines with >=1 match, counting ALL
    patterns (Linux golden: 454 lines with >=1 p7 match; 198x1 + 256x2)."""
    hist: Counter[int] = Counter()
    for line in lines:
        n = len(extract_spans(line, bank))
        if n:
            hist[n] += 1
    return dict(hist)


def apply_transform(text: str, pattern: str, replacement: str = "<DATE>") -> str:
    """One O7 step: re.sub with re.error -> input fallback
    (gui/log_generator.py:43-46)."""
    try:
        return re.sub(pattern, replacement, text)
    except re.error:
        return text


def apply_transform_bank(text: str, bank: TransformBank) -> str:
    """Enabled entries applied in bank order (the reference previews entries
    independently; the pipeline composes them as a normalization chain —
    order = bank order, disabled skipped)."""
    for e in bank.enabled_entries():
        text = apply_transform(text, e.pattern, e.replacement)
    return text


def route_sinks(text: str, bank: PatternBank) -> list[str]:
    """Sinks this turn routes to: one per matching bank entry (multicast —
    duplicates double-route), or ['unmatched'] when nothing matches."""
    pids = {pid for pid, *_ in extract_spans(text, bank)}
    if not pids:
        return ["unmatched"]
    return [e.sink for e in bank.entries if e.pattern_id in pids]
