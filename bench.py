"""Per-round benchmark harness.

Runs the headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "pipeline_turns_per_sec": ...}.

Headline = the full transcript pipeline (the north-rule metric, turns/sec
through parse -> enrich -> route -> aggregate on the deterministic synthetic
transcripts) plus a representative slice of the contract queries over the
provided sf tables. Two-parallelism scaling evidence is produced separately
by scripts/scaling_run.py (subprocess-isolated sessions).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from logparserhelper_spark.datagen import generate_transcripts  # noqa: E402
from logparserhelper_spark.defaults import default_transform_bank  # noqa: E402
from logparserhelper_spark.pipeline import PipelineConfig, run_pipeline  # noqa: E402
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

# 'bench' = 3.4M turns: large enough that fixed per-job overhead (~10s)
# doesn't dominate the turns/sec headline (datagen is cached and excluded
# from timing)
PIPELINE_SCALE = os.environ.get("SPARK_GRAFT_PIPELINE_SCALE", "bench")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(parallelism=cpus, app_name="bench")

    from logparserhelper_spark.plans.contract_queries import QUERIES

    results: dict[str, float] = {}
    total = 0.0

    # 1. the transcript pipeline (north-rule headline)
    data_dir = generate_transcripts(f"/tmp/lph_data_{PIPELINE_SCALE}", PIPELINE_SCALE)
    with open(os.path.join(data_dir, "_MANIFEST.json")) as f:
        n_turns = json.load(f)["rows"]
    out_dir = "/tmp/lph_bench_out"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    cfg = PipelineConfig(
        input_path=data_dir,
        out_dir=out_dir,
        transform_bank=default_transform_bank(),
        role_dim_path=os.path.join(data_dir, "role_dim.parquet"),
        tool_dim_path=os.path.join(data_dir, "tool_dim.parquet"),
        n_buckets=1,
    )
    # median of 3: this box's run-to-run variance is ~2x same-code (see
    # BENCH/BASELINE.md noise band) — single-shot round-over-round numbers
    # were unreadable, so every timing reports median + [min, max] spread
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spread: dict[str, list[float]] = {}
    samples: list[float] = []
    for _ in range(runs):
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        t0 = time.monotonic()
        run_pipeline(spark, cfg)
        samples.append(time.monotonic() - t0)
    dt = statistics.median(samples)
    results["transcript_pipeline"] = round(dt, 3)
    spread["transcript_pipeline"] = [round(min(samples), 3), round(max(samples), 3)]
    total += dt
    turns_per_sec = n_turns / dt

    # 2. contract-query slice over the provided sf tables
    for name in HEADLINE_QUERIES:
        fn = QUERIES[name]
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            rows = fn(spark, sf_dir).collect()
            samples.append(time.monotonic() - t0)
            assert rows is not None
        dt = statistics.median(samples)
        results[name] = round(dt, 3)
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]
        total += dt

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": results,
                "spread": spread,
                "runs_per_query": runs,
                "statistic": "median",
                "sf": sf_dir,
                "cpus": cpus,
                "pipeline_scale": PIPELINE_SCALE,
                "pipeline_turns": n_turns,
                "pipeline_turns_per_sec": round(turns_per_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
