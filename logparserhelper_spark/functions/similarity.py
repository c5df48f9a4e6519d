"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Cosine is computed JVM-side with ``F.zip_with`` + ``F.aggregate`` (no
  Python worker): at 100 TB this is a broadcast of the (small) query set
  against a scan of the corpus, embarrassingly parallel, no shuffle until
  the final per-query top-k (which AQE keeps tiny because each scan task
  pre-ranks locally before the exchange — see the window note below).
- ``lsh_bucketed_topk``: the scale path — random-hyperplane (SRP) LSH:
  b sign bits from fixed seeded hyperplanes form a bucket key; candidates
  only within matching buckets across several independent tables, exact
  re-rank inside. Recall is tested against brute force in the suite.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_col(a, b):
    """cosine(a, b) as a JVM-side column expression over array<float/double>."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k by cosine per query: (query_id, neighbor_id, cos_sim,
    rank). Query set is broadcast; ties break by neighbor id (deterministic).
    Self-matches are excluded."""
    # Norms are attached BEFORE the query cross-pairing: cosine referenced
    # both norms inline, so each corpus norm was re-folded once per QUERY
    # and each query norm once per CORPUS row (3 interpreted array folds
    # per pair; higher-order-function lambdas never enter codegen). Staging
    # them as columns leaves 1 fold (the dot product) per pair plus 1 norm
    # per input row — same float ops in the same order per value, so
    # cos_sim is bit-identical (norm value then divide, exactly as before).
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    ).withColumn("_qnorm", _norm(F.col("_qvec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    ).withColumn("_cnorm", _norm(F.col("_cvec")))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("_cvec"), F.col("_qvec"))
                / (F.col("_cnorm") * F.col("_qnorm")),
                round_to,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def srp_bucket_key(vec_col, planes: np.ndarray):
    """Sign-bit bucket key from fixed hyperplanes: bit i = (v . plane_i) > 0.
    Planes are embedded as literals (small: n_bits x dim doubles).

    Built as ONE parsed SQL expression instead of per-element ``F.lit``
    Column algebra: the literal planes are n_bits x dim doubles, and the
    Column form issued a py4j round-trip per element — tens of thousands
    per query — putting 2-3 s of DRIVER time into DataFrame construction
    before any job ran (measured: embedding_near_dup build 3.0 s, exec
    2.0 s). The SQL text is one round-trip; the parsed expression tree is
    identical (same zip_with/aggregate fold, same cast placement, same
    int bit weights), so keys — and therefore candidate sets and results
    — are unchanged. ``vec_col`` is a column NAME (the expression is
    textual)."""
    vec = vec_col if isinstance(vec_col, str) else vec_col._jc.toString()

    def lit_d(x: float) -> str:
        # repr round-trips the double exactly; the D suffix keeps Spark's
        # parser in DOUBLE (a bare fractional literal parses as DECIMAL)
        r = repr(float(x))
        return f"{r}D" if ("e" not in r and "E" not in r) else f"CAST('{r}' AS DOUBLE)"

    bits = []
    for i in range(planes.shape[0]):
        arr = ", ".join(lit_d(x) for x in planes[i])
        dot = (
            f"aggregate(zip_with({vec}, array({arr}), "
            f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN 1 ELSE 0 END) * {2 ** i}")
    return F.expr(" + ".join(bits))


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 6,
    n_tables: int = 8,
    seed: int = 7,
    round_to: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold, id_a < id_b).

    Scale-safe shape: SRP-LSH candidate generation (each row keyed into
    ``n_tables`` sign-bit buckets) -> equi-join on (table, key) -> exact
    cosine re-rank inside candidate pairs. Shuffle volume is
    O(n * n_tables) keys plus per-bucket pair fan-out — never the all-pairs
    nested loop. Recall: a pair at cosine c collides per table with
    p = (1 - acos(c)/pi)^n_bits; missing all tables has probability
    (1-p)^n_tables ≈ 1.2e-5 at c=0.99 with the defaults. At larger corpus
    sizes raise n_bits (≈ log2(n / target_bucket_size)) and n_tables
    together to hold recall while keeping buckets small."""
    rs = np.random.RandomState(seed)
    tables = [rs.normal(size=(n_bits, dim)) for _ in range(n_tables)]
    # norm computed once per INPUT row and carried with the vector: cosine
    # per candidate pair then costs one interpreted fold (the dot) instead
    # of three — same float value, same op order (norm then divide), so
    # cos_sim is bit-identical to the inline form
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v")).withColumn(
        "_n", _norm(F.col("_v"))
    )
    keys = [
        F.struct(F.lit(t).alias("t"), srp_bucket_key(F.col("_v"), tables[t]).alias("key"))
        for t in range(n_tables)
    ]
    keyed = base.select("id", "_v", "_n", F.explode(F.array(*keys)).alias("bk")).select(
        "id", "_v", "_n", F.col("bk.t").alias("t"), F.col("bk.key").alias("key")
    )
    a = keyed.select(F.col("id").alias("id_a"), F.col("_v").alias("_va"),
                     F.col("_n").alias("_na"), "t", "key")
    b = keyed.select(F.col("id").alias("id_b"), F.col("_v").alias("_vb"),
                     F.col("_n").alias("_nb"), "t", "key")
    # dedup multi-table collisions with one shuffle (groupBy carries the
    # vectors along instead of re-joining them after a distinct)
    cand = (
        a.join(b, ["t", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.first("_va").alias("_va"), F.first("_vb").alias("_vb"),
            F.first("_na").alias("_na"), F.first("_nb").alias("_nb"),
        )
    )
    return (
        cand.withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
                round_to,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 6,
    n_tables: int = 3,
    seed: int = 42,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: SRP-LSH candidate generation (n_tables independent
    sign-bit keys), exact cosine re-rank within candidates. Shuffle volume
    ~ corpus x n_tables keys instead of corpus x queries."""
    rs = np.random.RandomState(seed)
    tables = [rs.normal(size=(n_bits, dim)) for _ in range(n_tables)]

    def keyed(df: DataFrame, idc: str) -> DataFrame:
        # norm staged once per input row (bit-identical cosine; see
        # embedding_near_dup_pairs) — one fold per candidate, not three
        out = df.select(
            F.col(id_col).alias(idc), F.col(vec_col).alias(f"_{idc}_vec")
        ).withColumn(f"_{idc}_norm", _norm(F.col(f"_{idc}_vec")))
        keys = [
            F.struct(F.lit(t).alias("t"), srp_bucket_key(F.col(f"_{idc}_vec"), tables[t]).alias("key"))
            for t in range(n_tables)
        ]
        return out.select(
            idc, f"_{idc}_vec", f"_{idc}_norm", F.explode(F.array(*keys)).alias("bk")
        ).select(
            idc, f"_{idc}_vec", f"_{idc}_norm",
            F.col("bk.t").alias("t"), F.col("bk.key").alias("key"),
        )

    cq = keyed(queries, "query_id")
    cc = keyed(corpus, "neighbor_id")
    # the norm columns are functions of the vector columns, so carrying
    # them through the DISTINCT cannot change its row set
    cand = (
        cc.join(F.broadcast(cq), ["t", "key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "_query_id_vec", "_query_id_norm",
            "neighbor_id", "_neighbor_id_vec", "_neighbor_id_norm",
        )
        .distinct()
    )
    scored = cand.withColumn(
        "cos_sim",
        F.round(
            _dot(F.col("_neighbor_id_vec"), F.col("_query_id_vec"))
            / (F.col("_neighbor_id_norm") * F.col("_query_id_norm")),
            round_to,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
