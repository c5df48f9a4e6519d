"""A/B the routed sink at bench scale: parquet directory vs snapshot table.

The snapshot table (sinks/hadoop_table.py) had only ever executed at tiny
test scale; this runs the SAME bench-scale pipeline (3.4M turns) through
both routed formats and measures what the table layer costs and where the
inline-manifest shim bends:

- wall clock per format + routed-ROW EQUALITY (per-(bucket,sink) count and
  order-independent value hash must match exactly);
- per-bucket REPLACE commit split into stage (parquet write) vs swap (the
  atomic metadata promotion) — the swap is the part Iceberg serializes;
- metadata JSON size per version (the O(files) inline manifest growth);
- compact() + expire_snapshots() on the accreted table, then a re-read
  proving maintenance changed nothing.

Usage: python scripts/table_scale_run.py [--scale bench] [--buckets 8]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from logparserhelper_spark.datagen import generate_transcripts  # noqa: E402
from logparserhelper_spark.defaults import default_transform_bank  # noqa: E402
from logparserhelper_spark.pipeline import PipelineConfig, run_pipeline  # noqa: E402
from logparserhelper_spark.session import build_session  # noqa: E402
import logparserhelper_spark.sinks.hadoop_table as ht  # noqa: E402


def routed_signature(df) -> dict[str, list[int]]:
    """Order-independent per-(bucket,sink) signature: row count + sum of
    xxhash64 over every column (cast to string with a null sentinel so a
    null never collides with a real value)."""
    cols = sorted(df.columns)
    hashed = df.select(
        "bucket",
        "sink",
        F.xxhash64(
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                for c in cols
            ]
        ).alias("h"),
    )
    rows = (
        hashed.groupBy("bucket", "sink")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) accumulation: a long sum of xxhash64 values
            # overflows under ANSI mode
            F.sum(F.col("h").cast("decimal(38,0)")).alias("hs"),
        )
        .collect()
    )
    return {
        f"{r['bucket']}/{r['sink']}": [r["n"], str(r["hs"])] for r in rows
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="bench")
    p.add_argument("--buckets", type=int, default=8)
    p.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    a = p.parse_args()

    data_dir = generate_transcripts(f"/tmp/lph_data_{a.scale}", a.scale)
    with open(os.path.join(data_dir, "_MANIFEST.json")) as f:
        n_turns = json.load(f)["rows"]
    spark = build_session(parallelism=a.cpus, app_name="table_scale_run")

    def cfg_for(fmt: str, out: str) -> PipelineConfig:
        return PipelineConfig(
            input_path=data_dir,
            out_dir=out,
            transform_bank=default_transform_bank(),
            role_dim_path=os.path.join(data_dir, "role_dim.parquet"),
            tool_dim_path=os.path.join(data_dir, "tool_dim.parquet"),
            n_buckets=a.buckets,
            routed_format=fmt,
        )

    # ---- parquet side -----------------------------------------------------
    out_pq = "/tmp/lph_tablescale_pq"
    shutil.rmtree(out_pq, ignore_errors=True)
    t0 = time.monotonic()
    run_pipeline(spark, cfg_for("parquet", out_pq))
    wall_pq = time.monotonic() - t0

    # ---- table side, with the commit protocol instrumented -----------------
    stage_times: list[float] = []
    commit_times: list[dict] = []
    orig_stage, orig_commit = ht.HadoopTable._stage, ht.HadoopTable._commit

    def timed_stage(self, df, pcols):
        t = time.monotonic()
        out = orig_stage(self, df, pcols)
        stage_times.append(time.monotonic() - t)
        return out

    def timed_commit(self, staged, df, op, pcols, **kw):
        t = time.monotonic()
        snap = orig_commit(self, staged, df, op, pcols, **kw)
        commit_times.append(
            {
                "version": snap.version,
                "op": snap.operation,
                "swap_sec": round(time.monotonic() - t, 3),
                "stage_sec": round(stage_times[-1], 3) if stage_times else None,
                "added_files": snap.summary.get("added_files"),
                "total_files": len(snap.files),
                "meta_bytes": os.path.getsize(
                    self._meta_path(snap.version)
                ),
            }
        )
        return snap

    ht.HadoopTable._stage = timed_stage
    ht.HadoopTable._commit = timed_commit
    out_tb = "/tmp/lph_tablescale_tb"
    shutil.rmtree(out_tb, ignore_errors=True)
    try:
        t0 = time.monotonic()
        run_pipeline(spark, cfg_for("table", out_tb))
        wall_tb = time.monotonic() - t0
    finally:
        ht.HadoopTable._stage = orig_stage
        ht.HadoopTable._commit = orig_commit

    # ---- routed-row equality ------------------------------------------------
    pq_df = spark.read.parquet(os.path.join(out_pq, "routed"))
    table = ht.HadoopTable(spark, os.path.join(out_tb, "routed_table"))
    tb_df = table.read()
    sig_pq = routed_signature(pq_df)
    sig_tb = routed_signature(tb_df)
    rows_equal = sig_pq == sig_tb
    n_routed = sum(v[0] for v in sig_pq.values())

    # ---- maintenance on the accreted table -----------------------------------
    files_before = len(table.snapshot().files)
    versions_before = len(table.versions())
    meta_sizes = {
        v: os.path.getsize(table._meta_path(v)) for v in table.versions()
    }
    t0 = time.monotonic()
    snap_c = table.compact(target_file_bytes=128 << 20)
    compact_sec = time.monotonic() - t0
    files_after_compact = len(table.snapshot().files)
    t0 = time.monotonic()
    expired = table.expire_snapshots(keep_last=1, cleanup_older_than_sec=0)
    expire_sec = time.monotonic() - t0
    sig_after = routed_signature(table.read())
    maintenance_preserves_rows = sig_after == sig_pq

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "table_scale_run",
                "scale": a.scale,
                "turns": n_turns,
                "routed_rows": n_routed,
                "buckets": a.buckets,
                "cpus": a.cpus,
                "wall_sec_parquet": round(wall_pq, 1),
                "wall_sec_table": round(wall_tb, 1),
                "table_overhead_pct": round(100 * (wall_tb / wall_pq - 1), 1),
                "rows_equal": rows_equal,
                "commits": commit_times,
                "swap_sec_max": max(c["swap_sec"] for c in commit_times),
                "meta_bytes_per_version": meta_sizes,
                "files_before_compact": files_before,
                "versions_before_expire": versions_before,
                "compacted": snap_c is not None,
                "compact_sec": round(compact_sec, 1),
                "files_after_compact": files_after_compact,
                "expired_versions": len(expired),
                "expire_sec": round(expire_sec, 1),
                "maintenance_preserves_rows": maintenance_preserves_rows,
            }
        )
    )
    if not (rows_equal and maintenance_preserves_rows):
        sys.exit(1)


if __name__ == "__main__":
    main()
