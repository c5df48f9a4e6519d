"""Regenerate tests/golden/coverage_reference_corpus.json from the reference
corpora x the shipped bank, using the pure-Python oracle (never hand-write
golden numbers). Run: python tests/golden/regen.py"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO_ROOT)

from logparserhelper_spark import oracle  # noqa: E402
from logparserhelper_spark.defaults import default_pattern_bank  # noqa: E402

LOGS_DIR = "/root/reference/data/sample_logs"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "coverage_reference_corpus.json")


def main() -> None:
    bank = default_pattern_bank()
    golden: dict = {}
    for fn in sorted(os.listdir(LOGS_DIR)):
        with open(os.path.join(LOGS_DIR, fn), encoding="utf-8", errors="replace") as f:
            lines = f.read().splitlines()
        corpus = fn.split("_")[0]
        golden[corpus] = {
            "n_lines": len(lines),
            "pattern_counts": {
                str(k): v for k, v in sorted(oracle.coverage_counts(lines, bank).items())
            },
            "matched_line_histogram": {
                str(k): v
                for k, v in sorted(oracle.matched_line_histogram(lines, bank).items())
            },
        }
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(golden, f, indent=2, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
