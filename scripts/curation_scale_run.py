"""Scale run for the corpus-curation operators (segment dedup / Gopher /
C4 / DSIR): the testdata `documents` table is 500 rows at every SF, so
this drives the same code paths at millions of documents to evidence the
100-TB design claims (recorded in BENCH/BASELINE.md).

The corpus is generated ON the cluster (spark.range + JVM expressions,
no driver materialization): ~`--docs` documents of ~110 words drawn
from a 64-word vocabulary by md5-derived indices, with REAL dedup work
planted — every doc whose id % 10 == 0 carries one of 4 shared
boilerplate segments, and ids % 1000 == 0 duplicate another doc's whole
text — plus a lang column for the DSIR target split.

Usage: python scripts/curation_scale_run.py [--docs 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

VOCAB = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "part", "window", "small", "hash", "join", "batch", "stream", "spark",
    "dup", "group", "query", "row", "data", "slow", "filter", "customer",
    "line", "value", "agg", "column", "a", "vector", "big", "code",
    "plan", "task", "stage", "shuffle", "cache", "disk", "core", "node",
    "rack", "byte", "page", "block", "file", "path", "name", "type",
    "null", "true", "false", "zero", "one", "two", "ten", "max",
    "min", "sum", "avg", "count", "rank", "lead", "lag", "mode",
]
BOILER = [
    "cookie notice applies to this page always",
    "subscribe to the newsletter for updates today",
    "all rights reserved by the site owner",
    "click here to accept the terms now",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from logparserhelper_spark.functions.c4 import c4_rules
    from logparserhelper_spark.functions.dsir import dsir_logweights
    from logparserhelper_spark.functions.gopher import gopher_rules
    from logparserhelper_spark.functions.segments import segment_dedup
    from logparserhelper_spark.session import build_session

    spark = build_session(
        parallelism=args.cpus, app_name="curation_scale",
        shuffle_partitions=args.cpus * 4,
    )
    spark.sparkContext.setLogLevel("ERROR")

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    boiler = F.array(*[F.lit(b) for b in BOILER])
    i = F.col("id")
    n_words = (F.pmod(F.conv(F.substring(F.md5(i.cast("string")), 1, 8),
                             16, 10).cast("long"), F.lit(81)) + 30).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(
            vocab,
            (F.pmod(F.conv(F.substring(
                F.md5(F.concat_ws(":", i.cast("string"), j.cast("string"))),
                1, 8), 16, 10).cast("long"), F.lit(64)) + 1).cast("int"),
        ),
    )
    base_text = F.array_join(words, " ")
    text = F.when(
        i % 1000 == 0,  # whole-doc duplicate of a neighbor's text
        F.lit("the fast key order sort table scan merge part window "
              "small hash join batch stream spark dup group query row"),
    ).otherwise(
        F.when(
            i % 10 == 0,  # shared boilerplate segment planted mid-corpus
            F.concat(base_text, F.lit(" "),
                     F.element_at(boiler, ((i / 10) % 4 + 1).cast("int"))),
        ).otherwise(base_text)
    )
    docs = spark.range(args.docs).select(
        i.alias("doc_id"),
        text.alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"),
                    F.lit("zh")),
            (i % 5 + 1).cast("int"),
        ).alias("lang"),
    )
    docs.persist()
    n = docs.count()
    results: dict[str, object] = {"docs": n, "cpus": args.cpus}

    t0 = time.monotonic()
    seg = segment_dedup(docs.select("doc_id", "text"), chunk_words=8,
                        min_chars=1, keep="first")
    dropped = seg.agg(
        F.sum("dropped_segments").cast("long").alias("d"),
        F.sum("kept_segments").cast("long").alias("k"),
    ).collect()[0]
    w = time.monotonic() - t0
    results["segment_dedup"] = {
        "wall_s": round(w, 1), "docs_per_s": round(n / w),
        "kept_segments": dropped["k"], "dropped_segments": dropped["d"],
    }

    t0 = time.monotonic()
    g = gopher_rules(docs.select("doc_id", "text"), min_words=50,
                     min_stop_hits=1)
    gp = g.agg(F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0))
               .cast("long").alias("p")).collect()[0]["p"]
    w = time.monotonic() - t0
    results["gopher_rules"] = {
        "wall_s": round(w, 1), "docs_per_s": round(n / w), "passed": gp,
    }

    t0 = time.monotonic()
    c = c4_rules(docs.select("doc_id", "text"))
    cp = c.agg(F.sum("kept_lines").cast("long").alias("kl")).collect()[0]["kl"]
    w = time.monotonic() - t0
    results["c4_rules"] = {
        "wall_s": round(w, 1), "docs_per_s": round(n / w), "kept_lines": cp,
    }

    t0 = time.monotonic()
    d = dsir_logweights(
        docs.select("doc_id", "text", (F.col("lang") == "en").alias("t")),
        "t",
    )
    ds = d.agg(F.count(F.lit(1)).alias("n"),
               F.avg("dsir_logweight").alias("avg")).collect()[0]
    w = time.monotonic() - t0
    results["dsir_logweights"] = {
        "wall_s": round(w, 1), "docs_per_s": round(n / w),
        "rows": ds["n"], "avg_logweight": round(float(ds["avg"]), 4),
    }
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
