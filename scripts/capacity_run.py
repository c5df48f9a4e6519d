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


def summarize_event_log(path: str, boundary_ms: float | None = None) -> dict:
    """Fold SparkListenerTaskEnd metrics from one event-log file.

    ``boundary_ms``: epoch-millis wall boundary; when set, only tasks that
    FINISHED before it are folded (used to attribute pipeline vs
    maintenance phases — compaction's rewrite shuffle must not be read as
    pipeline spill)."""
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
            if boundary_ms is not None:
                finish = (ev.get("Task Info") or {}).get("Finish Time", 0)
                if finish and finish > boundary_ms:
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
    p.add_argument(
        "--routed-format",
        default="parquet",
        choices=["parquet", "table"],
        help="routed sink: parquet directory (default) or the snapshot "
        "table; table mode also runs compact()+expire_snapshots() on the "
        "accreted table afterwards and reports manifest growth",
    )
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
        routed_format=a.routed_format,
    )
    reset_output(cfg)
    t0 = time.monotonic()
    run_pipeline(spark, cfg)
    wall = time.monotonic() - t0
    pipeline_end_ms = time.time() * 1000  # phase boundary for metric split

    table_report: dict = {}
    if a.routed_format == "table":
        # maintenance on the accreted table at capacity scale: where the
        # O(files) inline manifest bends, and that compact+expire+re-read
        # preserve the row count exactly
        from logparserhelper_spark.sinks.hadoop_table import HadoopTable

        t = HadoopTable(spark, os.path.join(out_dir, "routed_table"))
        meta_sizes = {v: os.path.getsize(t._meta_path(v)) for v in t.versions()}
        # manifest-list layout (round 8): commit cost = the version JSON
        # (tiny, O(1)) + that commit's DELTA manifest; report both so the
        # O(commit files) claim is measured, not asserted
        man_dir = os.path.join(t.location, "metadata", "manifests")
        manifest_sizes = (
            sorted(
                os.path.getsize(os.path.join(man_dir, f))
                for f in os.listdir(man_dir)
            )
            if os.path.isdir(man_dir)
            else []
        )
        rows_before = t.snapshot().total_records
        files_before = len(t.snapshot().files)
        tc = time.monotonic()
        t.compact(target_file_bytes=128 << 20)
        compact_sec = time.monotonic() - tc
        tc = time.monotonic()
        expired = t.expire_snapshots(keep_last=1, cleanup_older_than_sec=0)
        expire_sec = time.monotonic() - tc
        rows_after = t.read().count()
        table_report = {
            "routed_rows": rows_before,
            "routed_files_before_compact": files_before,
            "routed_files_after_compact": len(t.snapshot().files),
            "meta_bytes_final": max(meta_sizes.values()),
            "meta_versions": len(meta_sizes),
            "manifest_files": len(manifest_sizes),
            "manifest_bytes_total": sum(manifest_sizes),
            "manifest_bytes_max": max(manifest_sizes, default=0),
            "compact_sec": round(compact_sec, 1),
            "expired_versions": len(expired),
            "expire_sec": round(expire_sec, 1),
            "maintenance_preserves_rows": rows_after == rows_before,
        }

    spark.stop()
    time.sleep(2)  # let the event-log writer flush/close

    # Spark 4 writes rolling v2 logs: <dir>/eventlog_v2_<app>/events_*_<app>
    logs = [
        f
        for f in glob.glob(os.path.join(ev_dir, "**", "events_*"), recursive=True)
        + glob.glob(os.path.join(ev_dir, "*"))
        if os.path.isfile(f) and not f.endswith(".crc")
    ]
    def fold(boundary_ms: float | None) -> dict:
        acc: dict = {}
        for f in sorted(set(logs)):
            part = summarize_event_log(f, boundary_ms)
            for k, v in part.items():
                if k.startswith("peak"):
                    acc[k] = max(acc.get(k, 0), v)
                else:
                    acc[k] = acc.get(k, 0) + v
        return acc

    # pipeline-phase metrics only: tasks finished before maintenance began
    ev = fold(pipeline_end_ms)
    if a.routed_format == "table":
        whole = fold(None)
        table_report["maintenance_shuffle_write_bytes"] = (
            whole["shuffle_write_bytes_total"] - ev["shuffle_write_bytes_total"]
        )
        table_report["maintenance_memory_bytes_spilled"] = (
            whole["memory_bytes_spilled"] - ev["memory_bytes_spilled"]
        )
        table_report["maintenance_disk_bytes_spilled"] = (
            whole["disk_bytes_spilled"] - ev["disk_bytes_spilled"]
        )
    print(
        json.dumps(
            {
                "metric": "capacity_run",
                "scale": a.scale,
                "turns": n_turns,
                "cpus": a.cpus,
                "buckets": a.buckets,
                "routed_format": a.routed_format,
                "wall_sec": round(wall, 1),
                "turns_per_sec": round(n_turns / wall, 1),
                **ev,
                **table_report,
            }
        )
    )


if __name__ == "__main__":
    main()
