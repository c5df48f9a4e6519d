"""A/B the manifest-level bloom filters' plan-time file skipping on the
workload they exist for: point lookups on a high-cardinality column whose
per-file ranges fully overlap (so min/max bounds can never prune).

Builds the same table twice — with and without
``write.metadata.bloom-filter-columns`` — as N_FILES single-file commits
whose doc-id ranges interleave (file i holds ids congruent to i mod
N_FILES: every file spans the whole id domain). Then times a batch of
point lookups ``read(predicate=[(col, '=', value)])`` end to end and
reports files planned per lookup. Same box, back-to-back, so noise
cancels.

Usage: python scripts/bloom_skip_bench.py [--files 64] [--rows-per-file 100000]
Prints one JSON line; paste into BENCH/BASELINE.md.
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
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--rows-per-file", type=int, default=100_000)
    ap.add_argument("--lookups", type=int, default=12)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from logparserhelper_spark.sinks.hadoop_table import HadoopTable

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .appName("bloom_skip_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bloombench_")
    n, rpf = args.files, args.rows_per_file

    def build(loc: str, bloom: bool) -> HadoopTable:
        t = HadoopTable(spark, loc)
        if bloom:
            # property must exist before the first data commit
            t.append(
                spark.createDataFrame(
                    [(int(-1), "bootstrap")], "doc_id long, doc string"
                ).coalesce(1)
            )
            t.set_properties(
                {
                    "write.metadata.bloom-filter-columns": "doc_id,doc",
                    # 100k distinct values/file needs ~1M bits at the
                    # adaptive ~10 bits/value — the documented knob for
                    # point-lookup-heavy high-NDV tables (the 16384-bit
                    # default cap stores nothing at this NDV)
                    "write.metadata.bloom-filter-bits": str(4 << 20),
                }
            )
        for i in range(n):
            # file i holds ids = i (mod n): every file spans the whole
            # domain, so min/max bounds can never separate them
            df = spark.range(rpf).select(
                (F.col("id") * n + i).alias("doc_id"),
                F.concat(
                    F.lit("doc-"),
                    F.lpad((F.col("id") * n + i).cast("string"), 10, "0"),
                ).alias("doc"),
            )
            t.append(df.coalesce(1))
        return t

    try:
        t_plain = build(os.path.join(work, "plain"), bloom=False)
        t_bloom = build(os.path.join(work, "bloom"), bloom=True)
        total = n * rpf
        probes = [
            (total * (k + 1)) // (args.lookups + 1) for k in range(args.lookups)
        ]

        def run(t: HadoopTable) -> tuple[float, int, int]:
            planned = 0
            hits = 0
            t0 = time.monotonic()
            for p in probes:
                pred = [("doc_id", "=", p)]
                planned += len(t.plan_files(predicate=pred))
                hits += t.read(predicate=pred).count()
            return time.monotonic() - t0, planned, hits

        # warm the JVM/page cache once on each table, then measure
        run(t_plain)
        wall_plain, planned_plain, hits_plain = run(t_plain)
        run(t_bloom)
        wall_bloom, planned_bloom, hits_bloom = run(t_bloom)
        assert hits_plain == hits_bloom == args.lookups, (
            hits_plain,
            hits_bloom,
        )
        print(
            json.dumps(
                {
                    "files": n,
                    "rows_per_file": rpf,
                    "lookups": args.lookups,
                    "cpus": cpus,
                    "plain_wall_sec": round(wall_plain, 3),
                    "plain_files_planned": planned_plain,
                    "bloom_wall_sec": round(wall_bloom, 3),
                    "bloom_files_planned": planned_bloom,
                    "speedup": round(wall_plain / wall_bloom, 2),
                    "rows_found_each": True,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
