"""Physical-plan snapshots for the most expensive queries.

``python scripts/plan_snapshots.py``          — (re)write BENCH/plans/*.txt
``python scripts/plan_snapshots.py --check``  — diff current plans against
the committed snapshots and exit 1 on drift (a lost broadcast, a new
shuffle, a join strategy flip). Plans are normalized (exprIds, plan ids,
codegen ids, absolute paths stripped) so only STRUCTURAL changes show up.

Snapshots are taken at a fixed sf (sf0.01) so scan arguments stay constant
across rounds.
"""

from __future__ import annotations

import argparse
import difflib
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"
PLANS_DIR = os.path.join(REPO, "BENCH", "plans")

# the expensive / regression-prone plans (judge-audited set + flagship)
SNAPSHOT_QUERIES = [
    "doc_pattern_coverage",
    "top_customers",
    "minhash_lsh_pairs",
    "ngram_top_similar",
    "embedding_topk",
    "embedding_near_dup",
    "lsh_topk",
    "asof_purchase_last_view",
    "contamination",
    "char_lm_quality",
]

_NORMALIZERS = [
    (re.compile(r"#\d+"), "#N"),               # exprIds
    (re.compile(r"plan_id=\d+"), "plan_id=N"),
    (re.compile(r"\[codegen id : \d+\]"), "[codegen id : N]"),
    (re.compile(r"file:[^\],\s]*"), "file:PATH"),
    (re.compile(r"Location: \S+"), "Location: PATH"),
    (re.compile(r"cteId=\d+"), "cteId=N"),
    (re.compile(r"statsEstimate=\S+"), "stats=N"),
]


def normalize(plan: str) -> str:
    for rx, repl in _NORMALIZERS:
        plan = rx.sub(repl, plan)
    return plan


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from logparserhelper_spark.plans.contract_queries import QUERIES
    from logparserhelper_spark.session import build_session

    spark = build_session(parallelism=8, app_name="plan_snapshots", shuffle_partitions=16)
    drift = 0
    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in SNAPSHOT_QUERIES:
        df = QUERIES[name](spark, SF_DIR)
        plan = normalize(formatted_plan(spark, df))
        path = os.path.join(PLANS_DIR, f"{name}.txt")
        if args.check:
            if not os.path.exists(path):
                print(f"MISSING snapshot for {name} — run without --check")
                drift += 1
                continue
            with open(path) as f:
                old = f.read()
            if old != plan:
                drift += 1
                print(f"PLAN DRIFT in {name}:")
                sys.stdout.writelines(
                    difflib.unified_diff(
                        old.splitlines(keepends=True),
                        plan.splitlines(keepends=True),
                        fromfile=f"committed/{name}",
                        tofile=f"current/{name}",
                    )
                )
            else:
                print(f"ok    {name}")
        else:
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}")
    spark.stop()
    if args.check and drift:
        print(f"{drift} plan(s) drifted")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
