"""Table-sink scaling A/B: the same parse->enrich->route->aggregate
pipeline at two parallelism levels, with the routed sink as plain
parquet vs the snapshot table (sinks/hadoop_table.py REPLACE commits —
the Iceberg-shaped sink the north rule names).

The committed 1->4 scaling gate (scripts/scaling_run.py, GATE region of
BENCH/BASELINE.md) measures the default parquet sink; this companion
run answers "does the table sink change the scaling shape?" — commit
protocol cost is driver-side metadata work (stage + one atomic swap per
bucket), so it must stay a near-constant additive term, not a scaling
term. Interleaved reps (p1, t1, p4, t4 per rep) so box drift hits all
four series equally.

Usage: python scripts/table_scaling_ab.py [--scale bench] [--repeats 2]
Prints one JSON line; paste the table into BENCH/BASELINE.md by hand
(this script deliberately does NOT rewrite any committed region).
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

RUNNER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from logparserhelper_spark.datagen import generate_transcripts
from logparserhelper_spark.defaults import default_transform_bank
from logparserhelper_spark.pipeline import PipelineConfig, run_pipeline
from logparserhelper_spark.session import build_session

scale = {scale!r}
cpus = {cpus}
routed_format = {routed_format!r}
data_dir = generate_transcripts(f"/tmp/lph_data_{{scale}}", scale)
n_turns = json.load(open(os.path.join(data_dir, "_MANIFEST.json")))["rows"]
spark = build_session(parallelism=cpus, app_name=f"tabab-{{cpus}}")
out = f"/tmp/lph_tabab_out_{{cpus}}_{{routed_format}}"
if os.path.isdir(out):
    shutil.rmtree(out)
cfg = PipelineConfig(
    input_path=data_dir, out_dir=out,
    transform_bank=default_transform_bank(),
    role_dim_path=os.path.join(data_dir, "role_dim.parquet"),
    tool_dim_path=os.path.join(data_dir, "tool_dim.parquet"),
    n_buckets=1, routed_format=routed_format)
t0 = time.monotonic()
run_pipeline(spark, cfg)
dt = time.monotonic() - t0
spark.stop()
print("RESULT " + json.dumps({{"cpus": cpus, "routed": routed_format,
                               "wall_sec": dt, "turns": n_turns,
                               "turns_per_sec": n_turns / dt}}))
"""


def run_one(cpus: int, scale: str, routed_format: str) -> dict:
    code = RUNNER.format(repo=REPO, scale=scale, cpus=cpus,
                         routed_format=routed_format)
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (rc={p.returncode}):\n{p.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="bench")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--n4", type=int, default=4)
    args = ap.parse_args()

    walls: dict[tuple, list[float]] = {}
    for rep in range(args.repeats):
        # interleave all four configs inside each rep: thermal drift is
        # shared, not attributed to whichever config ran last
        for cpus in (args.n, args.n4):
            for routed in ("parquet", "table"):
                r = run_one(cpus, args.scale, routed)
                walls.setdefault((cpus, routed), []).append(r["wall_sec"])
                print(f"rep{rep} cpus={cpus} routed={routed}: "
                      f"{r['wall_sec']:.1f}s ({r['turns_per_sec']:.0f} t/s)",
                      file=sys.stderr)

    med = {k: statistics.median(v) for k, v in walls.items()}
    out = {
        "scale": args.scale,
        "repeats": args.repeats,
        "walls": {f"{c}_{r}": v for (c, r), v in walls.items()},
        "median": {f"{c}_{r}": v for (c, r), v in med.items()},
        "eff_parquet": med[(args.n, "parquet")]
        / med[(args.n4, "parquet")] / (args.n4 / args.n),
        "eff_table": med[(args.n, "table")]
        / med[(args.n4, "table")] / (args.n4 / args.n),
        "table_overhead_n": med[(args.n, "table")] / med[(args.n, "parquet")],
        "table_overhead_n4": med[(args.n4, "table")] / med[(args.n4, "parquet")],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
