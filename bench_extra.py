"""Optimization-round profiling harness (guide §1): times each headline
query in isolation with the noop sink (so the computation is measured, not
the collect), dumps ``explain("formatted")`` plans, and labels jobs.

Does NOT replace bench.py (frozen for measurement) — numbers from here are
cited in OPTIMIZATION_r09.md only.

Usage:
  python bench_extra.py [--queries a,b,c] [--plans-dir plans/r09] \
      [--suffix before] [--runs 3] [--no-plans]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from logparserhelper_spark.session import build_session  # noqa: E402

HEADLINE_QUERIES = [
    "doc_pattern_coverage",
    "doc_route_counts",
    "pricing_summary",
    "top_customers",
    "regional_revenue",
    "top_suppliers_per_nation",
    "sessionization",
    "event_type_stats",
    "minhash_lsh_pairs",
    "ngram_top_similar",
    "quality_score",
    "embedding_topk",
]


def _hw_work(args):
    from logparserhelper_spark.banks import get_compiled_bank

    spec, chunk = args
    cb = get_compiled_bank(spec)
    n = 0
    for t in chunk:
        n += len(cb.extract(t))
    return n


def hw_calibrate(n_rows: int = 60000) -> dict:
    """Box-state calibration (the r8 verdict's self-evidencing ask, hosted
    here because bench.py is frozen for measurement): the embarrassingly-
    parallel compiled-regex ceiling of THIS machine at 1 and 8 procs over
    deterministic synthetic lines — plain multiprocessing, no Spark, the
    same probe scripts/scaling_run.py gates on. ``box_eff`` near 1.0 means
    a quiet window; the box's documented noisy states read 0.5-0.85.
    Emit next to any bench number you intend to compare across sessions."""
    import multiprocessing as mp

    from logparserhelper_spark.defaults import default_pattern_bank

    spec = default_pattern_bank().spec()
    texts = [
        f"turn {i}: at 2025-06-{i % 28 + 1:02d}T0{i % 10}:1{i % 6}:2{i % 9} "
        f"tool={i % 7} value {i * 37 % 1000} ok"
        for i in range(n_rows)
    ]
    rates = {}
    for nproc in (1, 8):
        chunks = [texts[i::nproc] for i in range(nproc)]
        with mp.Pool(nproc) as p:
            t0 = time.monotonic()
            p.map(_hw_work, [(spec, c) for c in chunks])
            rates[nproc] = round(len(texts) / (time.monotonic() - t0))
    return {
        "box_hw_1p": rates[1],
        "box_hw_8p": rates[8],
        "box_eff": round(rates[8] / rates[1] / 8, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--plans-dir", default=os.path.join(REPO, "plans", "r09"))
    ap.add_argument("--suffix", default=None, help="e.g. before/after: dump plans")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--calibrate", action="store_true",
        help="print the hw box-state probe (no Spark) and exit",
    )
    a = ap.parse_args()

    if a.calibrate:
        print(json.dumps(hw_calibrate()))
        return

    names = a.queries.split(",") if a.queries else HEADLINE_QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(parallelism=cpus, app_name="bench_extra")

    from logparserhelper_spark.plans.contract_queries import QUERIES

    os.makedirs(a.plans_dir, exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, a.sf)
        if a.suffix:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(a.plans_dir, f"{name}_{a.suffix}.txt"), "w") as f:
                f.write(plan)
        samples = []
        for i in range(a.runs):
            spark.sparkContext.setJobDescription(f"{name} noop rep{i}")
            t0 = time.monotonic()
            fn(spark, a.sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "noop_median": round(statistics.median(samples), 3),
            "samples": samples,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out, "sf": a.sf}))
    spark.stop()


if __name__ == "__main__":
    main()
