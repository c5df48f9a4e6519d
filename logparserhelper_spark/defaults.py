"""Default bank locations and loaders for the shipped reference-equivalent
pattern bank (data/pattern_bank.json — same 8 ordered entries, duplicates
included, as the reference's data/patterns.json:1-36)."""

from __future__ import annotations

import json
import os

from logparserhelper_spark.banks import (
    PatternBank,
    TransformBank,
    TransformEntry,
    bank_from_dicts,
    load_pattern_bank,
)

_HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_PATTERN_BANK_PATH = os.path.join(_HERE, "data", "pattern_bank.json")


def default_pattern_bank() -> PatternBank:
    """Zip-safe (spark-submit --py-files ships the package as a zip, where
    plain open() on a __file__-relative path fails and the permissive
    loader would silently yield an EMPTY bank): read via importlib.resources
    first, fall back to the filesystem path."""
    try:
        from importlib import resources

        payload = (
            resources.files("logparserhelper_spark")
            .joinpath("data/pattern_bank.json")
            .read_text(encoding="utf-8")
        )
        bank = bank_from_dicts(json.loads(payload).get("date_patterns", []))
        if bank.entries:
            return bank
    except Exception:
        pass
    return load_pattern_bank(DEFAULT_PATTERN_BANK_PATH)


def pii_transform_bank() -> TransformBank:
    """PII scrubbing as a TransformBank — the reference's transform machinery
    (O7 chain) applied to the training-data concern of redaction. Patterns
    stay in the Python-re ∩ RE2 shared dialect so the DuckDB oracle can
    mirror the chain with nested regexp_replace. Order is semantic: emails
    first (they contain dot-digit runs an IP pattern could nibble)."""
    return TransformBank(
        entries=(
            TransformEntry(
                # explicit a-zA-Z classes, not (?i): stays in the shared
                # dialect and real emails are routinely mixed-case
                pattern=r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
                replacement="<EMAIL>",
            ),
            TransformEntry(
                pattern=r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
                replacement="<IP>",
            ),
            TransformEntry(
                pattern=r"\+?\d{3}[- ]\d{3}[- ]\d{4}",
                replacement="<PHONE>",
            ),
        )
    )


def default_transform_bank() -> TransformBank:
    """Date -> token canonicalization: every bank pattern replaced with
    "<DATE>" (the reference's default replacement, gui/log_generator.py:42).
    Used as the normalize stage before frequency counting."""
    bank = default_pattern_bank()
    seen: set[str] = set()
    entries = []
    for e in bank.entries:
        if e.pattern in seen:
            continue  # duplicate patterns are a no-op the second time in a sub chain
        seen.add(e.pattern)
        entries.append(TransformEntry(pattern=e.pattern, replacement="<DATE>"))
    return TransformBank(entries=tuple(entries))
