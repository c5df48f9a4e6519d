"""Absolute-capacity probe: run the full pipeline once on a big corpus and
report wall, turns/sec, and the shuffle/spill story from the Spark event
log (total + per-stage-peak shuffle write, memory/disk spill, peak
execution memory) — the numbers that say whether the single-exchange parse
stage survives inputs far past executor-memory comfort.

Usage: python scripts/capacity_run.py [--scale xlarge] [--cpus 32]
       [--buckets 4] [--gen-procs 24]

Writes nothing outside /tmp; prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from logparserhelper_spark.datagen import (  # noqa: E402
    generate_transcripts,
    generate_transcripts_parallel,
)
from logparserhelper_spark.defaults import default_transform_bank  # noqa: E402
from logparserhelper_spark.pipeline import (  # noqa: E402
    PipelineConfig,
    reset_output,
    run_pipeline,
)
from logparserhelper_spark.session import build_session  # noqa: E402


def summarize_event_log(path: str) -> dict:
    """Fold SparkListenerTaskEnd metrics from one event-log file."""
    tot_shuffle_write = 0
    tot_shuffle_read = 0
    tot_mem_spill = 0
    tot_disk_spill = 0
    peak_exec_mem = 0
    per_stage_write: dict[int, int] = {}
    n_tasks = 0
    n_failed = 0
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            n_tasks += 1
            if ev.get("Task End Reason", {}).get("Reason") != "Success":
                n_failed += 1
            tm = ev.get("Task Metrics") or {}
            sw = (tm.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0
            )
            sr = (tm.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0)
            sr += (tm.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            tot_shuffle_write += sw
            tot_shuffle_read += sr
            tot_mem_spill += tm.get("Memory Bytes Spilled", 0)
            tot_disk_spill += tm.get("Disk Bytes Spilled", 0)
            peak_exec_mem = max(peak_exec_mem, tm.get("Peak Execution Memory", 0))
            sid = ev.get("Stage ID", -1)
            per_stage_write[sid] = per_stage_write.get(sid, 0) + sw
    top_stage = max(per_stage_write.values(), default=0)
    return {
        "n_tasks": n_tasks,
        "n_failed_tasks": n_failed,
        "shuffle_write_bytes_total": tot_shuffle_write,
        "shuffle_read_bytes_total": tot_shuffle_read,
        "peak_single_stage_shuffle_write_bytes": top_stage,
        "memory_bytes_spilled": tot_mem_spill,
        "disk_bytes_spilled": tot_disk_spill,
        "peak_task_execution_memory_bytes": peak_exec_mem,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="xlarge")
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--buckets", type=int, default=4)
    p.add_argument("--gen-procs", type=int, default=24)
    a = p.parse_args()

    data_dir = f"/tmp/lph_data_{a.scale}"
    if a.gen_procs > 1:
        generate_transcripts_parallel(data_dir, a.scale, n_procs=a.gen_procs)
    else:
        generate_transcripts(data_dir, a.scale)
    with open(os.path.join(data_dir, "_MANIFEST.json")) as f:
        n_turns = json.load(f)["rows"]

    ev_dir = "/tmp/lph_capacity_events"
    shutil.rmtree(ev_dir, ignore_errors=True)
    os.makedirs(ev_dir)
    spark = build_session(
        parallelism=a.cpus,
        app_name="capacity_run",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": ev_dir,
            # plain JSON lines so the summary fold below needs no codec
            "spark.eventLog.compress": "false",
        },
    )
    out_dir = f"/tmp/lph_capacity_out_{a.scale}"
    cfg = PipelineConfig(
        input_path=data_dir,
        out_dir=out_dir,
        transform_bank=default_transform_bank(),
        role_dim_path=os.path.join(data_dir, "role_dim.parquet"),
        tool_dim_path=os.path.join(data_dir, "tool_dim.parquet"),
        n_buckets=a.buckets,
    )
    reset_output(cfg)
    t0 = time.monotonic()
    run_pipeline(spark, cfg)
    wall = time.monotonic() - t0
    spark.stop()
    time.sleep(2)  # let the event-log writer flush/close

    # Spark 4 writes rolling v2 logs: <dir>/eventlog_v2_<app>/events_*_<app>
    logs = [
        f
        for f in glob.glob(os.path.join(ev_dir, "**", "events_*"), recursive=True)
        + glob.glob(os.path.join(ev_dir, "*"))
        if os.path.isfile(f) and not f.endswith(".crc")
    ]
    ev: dict = {}
    for f in sorted(set(logs)):
        part = summarize_event_log(f)
        for k, v in part.items():
            if k.startswith("peak"):
                ev[k] = max(ev.get(k, 0), v)
            else:
                ev[k] = ev.get(k, 0) + v
    print(
        json.dumps(
            {
                "metric": "capacity_run",
                "scale": a.scale,
                "turns": n_turns,
                "cpus": a.cpus,
                "buckets": a.buckets,
                "wall_sec": round(wall, 1),
                "turns_per_sec": round(n_turns / wall, 1),
                **ev,
            }
        )
    )


if __name__ == "__main__":
    main()
