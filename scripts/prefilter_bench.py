"""A/B bench for the JVM rlike parse prefilter (operators/prefilter.py).

Question (r5 verdict task 7): does routing definitely-miss turns around
the Python crossing pay on a miss-heavy corpus? Two corpora built from
the reference sample logs (replicated into many conversations so the
parse stage has real parallelism):

- ``mixed``: every corpus line as-is (the realistic blend — Linux/HDFS/
  Zookeeper lines match, Apache/proxifier/Windows lines mostly miss),
- ``miss``: only the lines the compiled bank extracts nothing from and
  no transform rewrites (the prefilter's best case).

Protocol mirrors scaling_run.py: interleaved reps, fresh JVM per leg
(subprocess), median across reps. Usage::

    python scripts/prefilter_bench.py [--copies 40] [--repeats 3] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOGS_DIR = "/root/reference/data/sample_logs"

RUNNER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from logparserhelper_spark.defaults import default_transform_bank
from logparserhelper_spark.pipeline import PipelineConfig, run_pipeline
from logparserhelper_spark.session import build_session

spark = build_session(parallelism={cpus}, app_name="prefilter-bench")
out = "/tmp/lph_prefilter_out"
if os.path.isdir(out):
    shutil.rmtree(out)
cfg = PipelineConfig(
    input_path={data!r}, out_dir=out,
    transform_bank=default_transform_bank(),
    n_buckets=1, parse_prefilter={flag},
)
t0 = time.monotonic()
m = run_pipeline(spark, cfg)
dt = time.monotonic() - t0
n = sum(b["turns_in"] for b in m["buckets"].values() if isinstance(b, dict))
spark.stop()
print("RESULT " + json.dumps({{"wall_sec": dt, "turns": n}}))
"""


def _corpus_lines() -> tuple[list[str], list[str]]:
    from logparserhelper_spark.banks import get_compiled_bank, get_compiled_transforms
    from logparserhelper_spark.defaults import default_pattern_bank, default_transform_bank

    cb = get_compiled_bank(default_pattern_bank().spec())
    ct = get_compiled_transforms(default_transform_bank().spec())
    all_lines: list[str] = []
    for fn in sorted(os.listdir(LOGS_DIR)):
        with open(os.path.join(LOGS_DIR, fn), encoding="utf-8", errors="replace") as f:
            all_lines.extend(f.read().splitlines())
    miss = [
        t
        for t in all_lines
        if not cb.extract(t) and not any(rx.search(t) for rx, _ in ct.steps)
    ]
    return all_lines, miss


def _build(lines: list[str], copies: int, out_dir: str) -> str:
    from datetime import timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    from logparserhelper_spark.datagen import BASE_TS

    os.makedirs(out_dir, exist_ok=True)
    conv_len = 500
    conv_id, turn_idx, text, ts = [], [], [], []
    k = 0
    for c in range(copies):
        for line in lines:
            conv_id.append(f"c{k // conv_len}")
            turn_idx.append(k % conv_len)
            text.append(line)
            ts.append(BASE_TS + timedelta(seconds=k % conv_len))
            k += 1
    n = len(text)
    table = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(["system"] * n, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "transcripts.parquet"))
    return out_dir


def _run(data: str, flag: bool, cpus: int) -> dict:
    code = RUNNER.format(repo=REPO, data=data, flag=flag, cpus=cpus)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
    raise RuntimeError("no RESULT line")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=40)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    all_lines, miss_lines = _corpus_lines()
    corpora = {
        "mixed": _build(all_lines, args.copies, "/tmp/lph_prefilter_mixed"),
        "miss": _build(miss_lines, args.copies, "/tmp/lph_prefilter_miss"),
    }
    print(
        f"corpora: mixed={len(all_lines)}x{args.copies} lines "
        f"({1 - len(miss_lines)/len(all_lines):.1%} py-fire rate), "
        f"miss={len(miss_lines)}x{args.copies} lines (0% fire)",
        flush=True,
    )
    walls: dict[tuple[str, bool], list[float]] = {}
    turns: dict[str, int] = {}
    for rep in range(args.repeats):
        for name, data in corpora.items():
            for flag in (False, True):
                r = _run(data, flag, args.cpus)
                walls.setdefault((name, flag), []).append(r["wall_sec"])
                turns[name] = r["turns"]
                print(
                    f"rep {rep} {name} prefilter={flag}: {r['wall_sec']:.1f}s "
                    f"({r['turns']/r['wall_sec']:.0f} turns/s)",
                    flush=True,
                )
    report: dict = {"cpus": args.cpus, "repeats": args.repeats}
    for name in corpora:
        off = statistics.median(walls[(name, False)])
        on = statistics.median(walls[(name, True)])
        report[name] = {
            "turns": turns[name],
            "wall_off": round(off, 2),
            "wall_on": round(on, 2),
            "walls_off": [round(x, 1) for x in walls[(name, False)]],
            "walls_on": [round(x, 1) for x in walls[(name, True)]],
            "speedup_pct": round((off - on) / off * 100, 1),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
