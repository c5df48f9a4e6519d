"""User-facing convenience API — the reference's workflows, one call each.

A user of the reference does three things (SURVEY.md §3): load a log and
highlight it (E1), edit the bank and re-run (E2), preview transformations
(E3). The equivalents:

- ``highlight(text, bank)`` — local, no Spark: class-tagged spans with
  colors for one document (the reference's in-memory path,
  core/regex_highlighter.py:5-25).
- ``preview_transformations(tbank)`` — per-entry (pattern, sample, example,
  enabled) rows exactly like the generator window's table
  (gui/log_generator.py:37-48), including the re.error -> sample fallback.
- ``run(spark, input_path, out_dir, ...)`` — the full distributed pipeline
  (E1 at scale); bank edits = pass a different bank (new version, new
  outputs — E2's reload-recompute semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

from logparserhelper_spark.banks import (
    PatternBank,
    TransformBank,
    get_compiled_bank,
)
from logparserhelper_spark.colors import color_for
from logparserhelper_spark.defaults import default_pattern_bank, default_transform_bank
from logparserhelper_spark.oracle import apply_transform


@dataclass(frozen=True)
class Highlight:
    pattern_id: int
    name: str
    color: str
    start: int
    end: int
    match: str


def highlight(text: str, bank: PatternBank | None = None) -> list[Highlight]:
    """All class-tagged spans over one document, reference semantics
    (independent patterns, duplicate multicast, leftmost non-overlapping
    within a pattern), with the reference palette colors."""
    bank = bank or default_pattern_bank()
    cb = get_compiled_bank(bank.spec())
    names = {e.pattern_id: e.name for e in bank.entries}
    return [
        Highlight(pid, names[pid], color_for(pid), s, e, m)
        for (pid, s, e, m) in cb.extract(text)
    ]


def preview_transformations(
    tbank: TransformBank | None = None,
) -> list[dict]:
    """The generator window's table rows: every entry (enabled or not) with
    its computed example (re.sub; re.error -> raw sample,
    gui/log_generator.py:40-48)."""
    tbank = tbank or default_transform_bank()
    return [
        {
            "enabled": e.enabled,
            "pattern": e.pattern,
            "sample": e.sample,
            "example": apply_transform(e.sample, e.pattern, e.replacement),
        }
        for e in tbank.entries
    ]


def run(spark, input_path: str, out_dir: str, bank: PatternBank | None = None,
        tbank: TransformBank | None = None, n_buckets: int = 4, fresh: bool = False):
    """Full pipeline run; returns the metrics dict."""
    from logparserhelper_spark.pipeline import PipelineConfig, reset_output, run_pipeline

    cfg = PipelineConfig(
        input_path=input_path,
        out_dir=out_dir,
        pattern_bank=bank or default_pattern_bank(),
        transform_bank=tbank if tbank is not None else default_transform_bank(),
        n_buckets=n_buckets,
    )
    if fresh:
        reset_output(cfg)
    return run_pipeline(spark, cfg)
