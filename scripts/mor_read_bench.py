"""A/B the merge-on-read read-path cost of accreted delete files vs the
rewrite_delete_files consolidation vs full compact.

A CDC-fed table accretes ONE equality-delete file per micro-batch; every
scan pays one eqNullSafe anti-join side per file. This script builds that
worst case deterministically, then times the same full-scan aggregate at
each maintenance state, back-to-back on one box so noise cancels:

  A. N_BATCHES equality-delete files (the raw CDC backlog)
  B. after rewrite_delete_files(): ONE position-delete file, data untouched
  C. after compact(): zero delete files (deletes materialized)

Usage: python scripts/mor_read_bench.py [--rows 4000000] [--batches 64]
Prints one JSON line; paste the numbers into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--batch-rows", type=int, default=2_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from logparserhelper_spark.sinks.hadoop_table import (
        HadoopTable,
        table_cdc_sink,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .appName("mor_read_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="morbench_")
    loc = os.path.join(work, "t")
    try:
        t = HadoopTable(spark, loc)
        base = spark.range(args.rows).select(
            F.col("id").alias("key"),
            (F.col("id") * 7 % 1000).alias("val"),
            F.sha1(F.col("id").cast("string")).alias("payload"),
        )
        t.append(base)
        # deterministic CDC backlog: each batch updates batch-rows keys
        # and deletes a handful — one equality-delete file per batch
        sink = table_cdc_sink(loc, ["key"])
        for b in range(args.batches):
            lo = (b * args.batch_rows * 3) % args.rows
            upd = spark.range(lo, lo + args.batch_rows).select(
                F.col("id").alias("key"),
                F.lit(b).cast("long").alias("val"),
                F.lit(f"u{b}").alias("payload"),
                F.lit("U").alias("op"),
            )
            dl = spark.range(lo + args.batch_rows, lo + args.batch_rows + 16).select(
                F.col("id").alias("key"),
                F.lit(0).cast("long").alias("val"),
                F.lit("").alias("payload"),
                F.lit("D").alias("op"),
            )
            sink(upd.unionAll(dl), b)

        def scan_wall() -> tuple[float, int, int]:
            walls = []
            res = None
            for _ in range(args.reps):
                t0 = time.monotonic()
                row = (
                    t.read()
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum("val").alias("s"),
                    )
                    .first()
                )
                walls.append(time.monotonic() - t0)
                res = (int(row["n"]), int(row["s"]))
            walls.sort()
            return walls[len(walls) // 2], res[0], res[1]

        snap = t.snapshot()
        n_dels_a = len(snap.delete_files)
        wall_a, n_a, s_a = scan_wall()

        t0 = time.monotonic()
        s = t.rewrite_delete_files()
        rewrite_wall = time.monotonic() - t0
        n_dels_b = len(s.delete_files)
        wall_b, n_b, s_b = scan_wall()

        t0 = time.monotonic()
        t.compact()
        compact_wall = time.monotonic() - t0
        wall_c, n_c, s_c = scan_wall()

        assert (n_a, s_a) == (n_b, s_b) == (n_c, s_c), (
            "content diverged across maintenance states",
            (n_a, s_a), (n_b, s_b), (n_c, s_c),
        )
        print(
            json.dumps(
                {
                    "rows": args.rows,
                    "batches": args.batches,
                    "cpus": cpus,
                    "reps_median": args.reps,
                    "delete_files_raw": n_dels_a,
                    "scan_sec_raw_backlog": round(wall_a, 3),
                    "rewrite_delete_files_sec": round(rewrite_wall, 3),
                    "delete_files_after_rewrite": n_dels_b,
                    "scan_sec_after_rewrite": round(wall_b, 3),
                    "compact_sec": round(compact_wall, 3),
                    "scan_sec_after_compact": round(wall_c, 3),
                    "live_rows": n_a,
                    "content_stable": True,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
