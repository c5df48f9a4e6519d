"""spark-submit entrypoint: the package arrives via --py-files (zip on the
executors' PYTHONPATH), so imports resolve without the repo checkout —
the cluster shipping mode the north rule requires."""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession

from logparserhelper_spark.datagen import generate_transcripts
from logparserhelper_spark.defaults import default_transform_bank
from logparserhelper_spark.pipeline import PipelineConfig, reset_output, run_pipeline


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default=None)
    p.add_argument("--input", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--buckets", type=int, default=4)
    p.add_argument("--fresh", action="store_true")
    a = p.parse_args()

    spark = SparkSession.builder.getOrCreate()  # conf comes from spark-submit
    spark.sparkContext.setLogLevel("WARN")
    if a.input is None:
        if a.scale is None:
            p.error("--scale or --input required")
        a.input = generate_transcripts(f"/tmp/lph_data_{a.scale}", a.scale)
    cfg = PipelineConfig(
        input_path=a.input,
        out_dir=a.out,
        transform_bank=default_transform_bank(),
        role_dim_path=os.path.join(a.input, "role_dim.parquet"),
        tool_dim_path=os.path.join(a.input, "tool_dim.parquet"),
        n_buckets=a.buckets,
    )
    if a.fresh:
        reset_output(cfg)
    print(json.dumps(run_pipeline(spark, cfg), default=str))
    spark.stop()


if __name__ == "__main__":
    main()
