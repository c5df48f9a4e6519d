"""KMV (k-minimum-values) distinct-count sketch.

The classic bottom-k sketch (Bar-Yossef et al. 2002): hash every value to
[0, 1); keep the k smallest hashes per group; if fewer than k distinct
hashes exist the count is exact, otherwise estimate D ≈ (k-1) / h_(k),
where h_(k) is the k-th smallest hash. Properties that matter here:

- **mergeable**: union of two sketches' values, keep the smallest k — the
  partial-aggregation shape (unlike a plain COUNT DISTINCT, whose partials
  are full value sets).
- **deterministic & engine-portable**: the hash is md5 (first 8 hex chars as
  a fraction of 2^32, the same construction as curation.hash_split), so a
  DuckDB oracle reproduces the estimate bit-for-bit — something no HLL
  implementation pair can do.

Plan shape: distinct (group, hash) -> per-group rank <= k (Spark 4 plans
WindowGroupLimit: each task pre-ranks locally, the exchange carries at most
k rows per group per task) -> one tiny final aggregation. No collect_list
of the full value set anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logparserhelper_spark.functions.curation import hash_fraction


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct estimate: (group_col, n_kept, kth_hash,
    est_distinct). est_distinct is exact when the group has < k distinct
    values (rounded to 4 for engine-stable hashing of the double)."""
    hashed = (
        df.select(F.col(group_col).alias("_g"), F.col(value_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .select("_g", hash_fraction(F.col("_v")).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy("_g").orderBy(F.asc("_h"))
    kept = hashed.withColumn("_rnk", F.row_number().over(w)).filter(F.col("_rnk") <= k)
    agg = kept.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("_h").alias("kth_hash"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        (F.lit(float(k - 1))) / F.col("kth_hash")
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n_kept",
        F.round("kth_hash", 6).alias("kth_hash"),
        F.round(est, 4).alias("est_distinct"),
    )
