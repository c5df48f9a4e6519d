from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_corpora() -> dict[str, list[str]]:
    """The 6 reference sample corpora as line lists, when present."""
    logs_dir = os.path.join(REFERENCE_DIR, "data", "sample_logs")
    if not os.path.isdir(logs_dir):
        pytest.skip("reference sample logs not available")
    out: dict[str, list[str]] = {}
    for fn in sorted(os.listdir(logs_dir)):
        path = os.path.join(logs_dir, fn)
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            out[fn.split("_")[0]] = f.read().splitlines()
    return out


@pytest.fixture(scope="session")
def spark():
    from logparserhelper_spark.session import build_session

    s = build_session(parallelism=4, app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()
