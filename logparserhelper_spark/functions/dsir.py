"""DSIR: data selection via hashed n-gram importance resampling
(Xie et al., NeurIPS 2023).

The standard way to pick pretraining data that "looks like" a target
domain without a model in the loop: featurize every document as hashed
word uni+bi-gram counts over a small bucket space, fit two smoothed
bucket distributions — p from the target sample, q from the raw corpus —
and score each document with its log importance weight
``sum_b count_b(doc) * log(p_b / q_b)``. High-weight documents are
target-like; selection is then a top-k or threshold over the weights.

Shape here (all built-ins, no UDF, no collect):

- features: word unigrams + bigrams, bucketed by ``xxhash64`` (JVM
  intrinsic — the scale default) or the engine-portable md5 idiom
  shared with the minhash/hash-split family (``bucket_hash="md5"``,
  the form the DuckDB oracle replays exactly).
- model: ONE aggregation over the exploded features (cnt_target via a
  conditional sum, cnt_source = all rows); totals come from a window
  over the tiny ``buckets``-row model table, not a second corpus pass.
  Laplace smoothing ``(cnt+1)/(total+B)`` keeps every bucket finite.
- determinism: each bucket's log ratio is quantized to FIXED-POINT
  micro-nats (round(ln(r) * 1e6) as long) and per-document weights are
  integer sums of ``count * lr_micro`` — associative and order-free, so
  any partitioning gives the same bits (the char_bigram_logprob trick).
  The ln argument is built from exact integer counts each cast to
  double BEFORE multiplying (no int64 overflow at any corpus size) —
  the same IEEE op sequence in every engine, so identical doubles.
- scale: the per-doc probe pre-aggregates to (doc, bucket, count) —
  at most ``buckets`` rows per document regardless of length — and the
  B-row model broadcasts into the join. One wide shuffle (the
  doc-bucket groupBy), one broadcast join, one final groupBy(doc): the
  same plan at 500 docs and 500 billion.

MEASURED DEAD END (2M docs, local[32], kept as a warning): replacing
the probe side with a log-ratio map LITERAL inside an
``F.aggregate(grams, ...)`` lambda — "zero probe shuffles" on paper —
ran 2.7x SLOWER (183s vs 68s): higher-order-function lambdas evaluate
interpreted (outside whole-stage codegen) and the per-element hash +
map lookup repeats per feature occurrence. The explode + hash-aggregate
below stays in codegen; its shuffles are cheaper than leaving codegen.

Documents with no words produce no row (same contract as
char_bigram_logprob). No reference-parity citation: the reference tool
(see SURVEY §1) has no data selection; this extends the SURVEY §2
curation family alongside functions/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket(col, buckets: int, bucket_hash: str):
    """Feature-bucket hash. ``xxhash64`` (default) is the scale path —
    a JVM intrinsic, measurably faster than md5 at 2M docs (the hash
    runs once per n-gram occurrence); ``md5`` is the engine-portable
    form the oracle-checked contract query uses (DuckDB:
    CAST('0x' || substr(md5(g),1,8) AS BIGINT) % buckets). Bucket
    ASSIGNMENT differs between the two, but the estimator's statistics
    do not — any uniform hash gives equivalent importance weights in
    distribution."""
    if bucket_hash == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(buckets))
    if bucket_hash == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        )
    raise ValueError(
        f"bucket_hash must be 'xxhash64' or 'md5', got {bucket_hash!r}"
    )


def dsir_logweights(
    df: DataFrame,
    target_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """(id_col, n_features, dsir_logweight) per document with >=1 word.

    ``target_col`` names a boolean column marking the target-domain
    sample (rows the importance weights should up-rank toward);
    the source distribution is the whole input, DSIR's "raw" side.
    ``bucket_hash``: see :func:`_bucket` — xxhash64 for scale (default),
    md5 for cross-engine reproducibility.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    # filter empties rather than trimming (F.trim strips spaces only): a
    # tab/newline-edged doc must not emit ''-token features, and a
    # whitespace-only doc must produce no row
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(target_col).cast("boolean").alias("_tgt"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
        ).alias("_ws"),
    ).filter(F.size("_ws") >= 1)
    n = F.size("_ws")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at("_ws", i.cast("int")),
                F.element_at("_ws", (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = base.select(
        "_id", "_tgt",
        F.explode(F.concat("_ws", bigrams)).alias("_g"),
    ).select(
        "_id", "_tgt", _bucket(F.col("_g"), buckets, bucket_hash).alias("_b")
    )

    # model: smoothed target/source bucket distributions -> fixed-point
    # log ratios; totals via a window over the <= ``buckets``-row table
    model = ex.groupBy("_b").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).cast("long").alias("_ct"),
        F.count(F.lit(1)).cast("long").alias("_cs"),
    )
    w_all = Window.partitionBy()
    t_t = (F.sum("_ct").over(w_all) + buckets).cast("double")
    t_s = (F.sum("_cs").over(w_all) + buckets).cast("double")
    # each factor cast to double BEFORE multiplying: the long product
    # (ct+1)*total would overflow int64 around ~2e10 corpus features,
    # wrapping negative and nulling the log; double products lose no
    # determinism (same IEEE ops in Spark and the DuckDB oracle)
    lr = F.log(
        ((F.col("_ct") + 1).cast("double") * t_s)
        / ((F.col("_cs") + 1).cast("double") * t_t)
    )
    model = model.select(
        "_b", F.round(lr * 1000000.0, 0).cast("long").alias("_lr_micro")
    )

    doc_b = ex.groupBy("_id", "_b").agg(F.count(F.lit(1)).alias("_cnt"))
    packed = doc_b.join(F.broadcast(model), "_b")
    return packed.groupBy("_id").agg(
        F.sum("_cnt").cast("long").alias("n_features"),
        F.round(
            F.sum(F.col("_cnt") * F.col("_lr_micro")).cast("double")
            / 1000000.0,
            4,
        ).alias("dsir_logweight"),
    ).select(F.col("_id").alias(id_col), "n_features", "dsir_logweight")
