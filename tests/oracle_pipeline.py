"""Pure-Python/pandas mirror of the full pipeline for Ring-2 equality tests.

Computes, from the same transcripts parquet the Spark pipeline reads, the
expected: deduped turn set, normalized text, routed row set per sink, per-sink
aggregate counts, and conv rollups — all with Python ``re`` + plain dicts.
Naive by design (correctness mirror, not performance).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from logparserhelper_spark import oracle
from logparserhelper_spark.banks import PatternBank, TransformBank


def load_rows(path: str) -> list[dict]:
    t = pq.read_table(path)
    return t.to_pylist()


def dedup(rows: list[dict]) -> list[dict]:
    """Winner per (conv_id, turn_idx) = min (role, ts, text) — the pipeline's
    documented total-order tiebreak."""
    best: dict = {}
    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        key = (r["role"], r["ts"], r["text"])
        if k not in best or key < (best[k]["role"], best[k]["ts"], best[k]["text"]):
            best[k] = r
    return [best[k] for k in sorted(best)]


def expected_pipeline(
    rows: list[dict], bank: PatternBank, tbank: TransformBank | None
) -> dict:
    turns = dedup(rows)
    sink_of = {e.pattern_id: e.sink for e in bank.entries}
    name_of = {e.pattern_id: e.name for e in bank.entries}

    routed: dict[str, set] = defaultdict(set)
    freq: Counter = Counter()
    freq_turns: dict = defaultdict(set)
    conv_turns: Counter = Counter()
    conv_spans: Counter = Counter()
    conv_matched_turns: Counter = Counter()
    norm_text: dict = {}

    for r in turns:
        key = (r["conv_id"], r["turn_idx"])
        conv_turns[r["conv_id"]] += 1
        if tbank is not None:
            norm_text[key] = oracle.apply_transform_bank(r["text"], tbank)
        else:
            norm_text[key] = r["text"]
        spans = oracle.extract_spans(r["text"], bank)
        if not spans:
            routed["unmatched"].add(key + (None, None, None, None))
            freq[("unmatched", None, None)] += 1
            freq_turns[("unmatched", None, None)].add(key)
            continue
        conv_spans[r["conv_id"]] += len(spans)
        conv_matched_turns[r["conv_id"]] += 1
        for pid, s, e, m in spans:
            routed[sink_of[pid]].add(key + (pid, s, e, m))
            freq[(sink_of[pid], pid, name_of[pid])] += 1
            freq_turns[(sink_of[pid], pid, name_of[pid])].add(key)

    return {
        "turns": turns,
        "norm_text": norm_text,
        "routed": dict(routed),
        "sink_pattern_freq": {
            k: (v, len(freq_turns[k])) for k, v in freq.items()
        },
        "conv_turns": dict(conv_turns),
        "conv_spans": dict(conv_spans),
        "conv_matched_turns": dict(conv_matched_turns),
    }
