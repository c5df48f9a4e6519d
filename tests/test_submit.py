"""The north rule's shipping mode, exercised for real: zip the package,
run ``spark-submit --py-files pkg.zip scripts/pipeline_job.py`` from a
scratch cwd with the repo stripped from PYTHONPATH — imports must resolve
from the zip on the executors — and verify the routed sinks appear with
the expected per-sink semantics (unmatched included)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return cand if os.path.exists(cand) else None
    except ImportError:
        return None


def _build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "lph_pkg.zip")
    pkg_root = os.path.join(REPO, "logparserhelper_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return zpath


def test_spark_submit_py_files_end_to_end():
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not available")
    work = tempfile.mkdtemp(prefix="lph_submit_")
    try:
        zpath = _build_zip(work)
        out = os.path.join(work, "out")
        job = os.path.join(REPO, "scripts", "pipeline_job.py")
        env = dict(os.environ)
        # the repo must NOT be importable except through the zip
        env["PYTHONPATH"] = ""
        env.setdefault("SPARK_GRAFT_CPUS", "2")
        proc = subprocess.run(
            [
                submit,
                "--master", "local[2]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zpath,
                job,
                "--scale", "tiny",
                "--out", out,
                "--fresh",
            ],
            cwd=work,  # scratch cwd: no accidental repo-relative imports
            capture_output=True,
            text=True,
            timeout=540,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr[-4000:] + proc.stdout[-2000:]
        routed = os.path.join(out, "routed")
        assert os.path.isdir(routed), os.listdir(out)
        # layout: routed/bucket=N/sink=<name>/*.parquet
        sinks = {
            d
            for b in os.listdir(routed)
            if b.startswith("bucket=")
            for d in os.listdir(os.path.join(routed, b))
            if d.startswith("sink=")
        }
        assert "sink=unmatched" in sinks, sinks
        assert len(sinks) >= 2  # at least one pattern sink + unmatched
        # row conservation, independent engine: turns == distinct
        # (conv_id, turn_idx) of the input (the dedup key); routed >= turns
        # (multicast fan-out: a turn matching k patterns lands in k sinks)
        import duckdb

        n_turns = duckdb.sql(
            f"select count(*) from read_parquet('{out}/turns/**/*.parquet', hive_partitioning=1)"
        ).fetchone()[0]
        n_routed = duckdb.sql(
            f"select count(*) from read_parquet('{routed}/**/*.parquet', hive_partitioning=1)"
        ).fetchone()[0]
        n_key = duckdb.sql(
            "select count(*) from (select distinct conv_id, turn_idx"
            " from read_parquet('/tmp/lph_data_tiny/transcripts.parquet'))"
        ).fetchone()[0]
        assert n_turns == n_key > 0
        assert n_routed >= n_turns
    finally:
        shutil.rmtree(work, ignore_errors=True)
