"""NDV-sketch statistics A/B: what the manifest-resident KMV sketches
cost at write time, and what the metadata-only ANALYZE buys at read
time, measured on one box (see BENCH/BASELINE.md for recorded runs).

Two identical tables (N single-file appends of R rows each), one with
`write.metadata.ndv-sketch-columns` on. Measures:

- append wall with/without the sketch harvest (the write-side cost);
- `inspect("statistics")` wall (manifest-only merge) vs the Spark
  COUNT(DISTINCT) scan it replaces (the read-side win);
- estimate error vs the true NDV for the estimator-path column (id,
  NDV >> k) and exactness for the below-k column (u).

Usage: python scripts/ndv_stats_bench.py [--files 64] [--rows 250000]
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

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--rows", type=int, default=250_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from logparserhelper_spark.session import build_session
    from logparserhelper_spark.sinks.catalog import create_table_at
    from logparserhelper_spark.sinks.hadoop_table import HadoopTable

    spark = build_session(
        parallelism=args.cpus, app_name="ndv_stats_bench",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lph_ndv_bench_")
    n_rows = args.files * args.rows
    true_ndv_id = n_rows
    true_ndv_u = 100_000

    def batch(i: int):
        return (
            spark.range(i * args.rows, (i + 1) * args.rows)
            .select(
                F.col("id"),
                F.concat(F.lit("u-"), (F.col("id") % true_ndv_u)).alias("u"),
            )
            .coalesce(1)
        )

    results: dict[str, object] = {
        "files": args.files, "rows_per_file": args.rows,
        "true_ndv": {"id": true_ndv_id, "u": true_ndv_u},
    }
    tables = {}
    for mode, props in (
        ("plain", None),
        ("sketched", {"write.metadata.ndv-sketch-columns": "id,u"}),
    ):
        loc = f"{root}/{mode}"
        t = create_table_at(spark, loc, "id long, u string", properties=props)
        t0 = time.monotonic()
        for i in range(args.files):
            t.append(batch(i))
        results[f"append_wall_{mode}_s"] = round(time.monotonic() - t0, 2)
        tables[mode] = t

    t = tables["sketched"]
    t0 = time.monotonic()
    stats = {r["column"]: r.asDict()
             for r in t.inspect("statistics").collect()}
    results["analyze_wall_s"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    exact = tables["plain"].read().agg(
        F.countDistinct("id").alias("id"), F.countDistinct("u").alias("u")
    ).collect()[0]
    results["count_distinct_scan_wall_s"] = round(time.monotonic() - t0, 2)
    results["ndv_estimates"] = {
        "id": stats["id"]["ndv"], "u": stats["u"]["ndv"],
        "u_exact_flag": stats["u"]["ndv_exact"],
    }
    results["ndv_error_pct"] = {
        "id": round(abs(stats["id"]["ndv"] - exact["id"]) / exact["id"] * 100, 2),
        "u": round(abs(stats["u"]["ndv"] - exact["u"]) / exact["u"] * 100, 2),
    }
    # manifest weight attributable to the sketches
    def meta_bytes(tab):
        total = 0
        d = os.path.join(tab.root, "metadata", "manifests")
        for fn in os.listdir(d):
            total += os.path.getsize(os.path.join(d, fn))
        return total

    results["manifest_bytes_plain"] = meta_bytes(tables["plain"])
    results["manifest_bytes_sketched"] = meta_bytes(tables["sketched"])
    print(json.dumps(results))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
