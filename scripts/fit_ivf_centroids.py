"""Fit the committed IVF centroid fixture (one-time; provenance for
logparserhelper_spark/data/ivf_centroids_v1.json).

The contract query ``ivf_topk`` must be checkable by a DuckDB oracle, which
cannot replay an iterative k-means fit. So the model is fit ONCE here —
spherical k-means over the sf0.01 embeddings table (k=8, iters=3, seed=42,
the same parameters the round-2 query used per-run) — and committed as a
versioned JSON fixture of unit-norm float64 centroids. Both the Spark query
and the oracle then embed the same literal doubles, exactly like the SRP
planes in lsh_topk. Re-running this script reproduces the file bit-for-bit
(deterministic sample + seeded init).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(
    REPO, "logparserhelper_spark", "data", "ivf_centroids_v1.json"
)
FIT_SF = "/root/testdata/sf0.01"
PARAMS = {"k": 8, "iters": 3, "seed": 42, "sample_limit": 100_000}


def main() -> None:
    from logparserhelper_spark.functions.ivf import kmeans_fit
    from logparserhelper_spark.session import build_session

    spark = build_session(parallelism=8, app_name="fit_ivf", shuffle_partitions=16)
    emb = spark.read.parquet(f"{FIT_SF}/embeddings.parquet")
    cents = kmeans_fit(emb, **PARAMS)
    spark.stop()
    doc = {
        "version": 1,
        "fit": {"sf_dir": FIT_SF, **PARAMS},
        "dim": int(cents.shape[1]),
        "centroids": [[float(x) for x in row] for row in cents],
    }
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(doc, f)
    print(f"wrote {OUT}: k={cents.shape[0]} dim={cents.shape[1]}")


if __name__ == "__main__":
    main()
