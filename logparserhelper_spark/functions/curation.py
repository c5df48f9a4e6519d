"""Dataset curation operators for training-data pipelines: deterministic
hash splits, per-group quality top-k, and sequence packing.

All three stay in built-in functions (JVM-side, codegen'd, oracle-able):

- ``hash_split``: content-addressed train/val/test assignment. The split is
  a pure function of the id (first 8 hex chars of md5 as a fraction of
  2^32), so it is stable under reprocessing, shard-count changes, and
  engine changes — the property that keeps a held-out set held out across
  pipeline re-runs. Cutoffs like 0.8 are never exactly k/2^32, so there is
  no boundary ambiguity between engines.
- ``quality_topk_per_group``: per-group top-k by a score column with a
  deterministic tiebreak — the domain-mixing primitive (e.g. best N docs
  per language). row_number + filter plans as WindowGroupLimit in Spark 4:
  each task pre-ranks locally, so the exchange carries at most k rows per
  group per task.
- ``pack_offsets``: offset-based sequence packing — documents get a bin id
  by prefix token count within a deterministic shard, bins hold ~``budget``
  tokens (documents may straddle bin boundaries; true greedy packing is
  stateful and serial). Packing WITHIN a shard keeps the prefix-sum window
  partitioned — never a single global sort at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def hash_fraction(id_col) -> F.Column:
    """Deterministic uniform fraction in [0, 1) from an id: first 8 hex chars
    of md5(id-as-string) over 2^32. Engine-portable (DuckDB: CAST('0x'||...)."""
    h = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(float(2**32))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    out_col: str = "split",
) -> DataFrame:
    frac = hash_fraction(F.col(id_col))
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        cond = frac < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(splits[-1][0]) if expr is not None else F.lit(splits[-1][0])
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: within every stratum, keep rows
    whose md5 fraction of (stratum || '|' || id) is below ``fraction`` —
    a pure per-row function, so the sample is stable under reprocessing,
    repartitioning, and engine changes (unlike ``df.sample``, whose output
    depends on partition layout), and including the stratum in the hash key
    decorrelates the selection across strata (the same id can be sampled in
    one stratum and not another). Scan-shaped: no shuffle, no state.

    NULL stratum / NULL id hash under a tagged encoding ('n' for null,
    'v' || value otherwise) instead of null-propagating through concat — a
    plain concat would make the filter NULL (= dropped) and silently lose
    100% of null-stratum rows at any fraction; the tag (rather than a
    sentinel string) means no real value can collide with the null key."""

    def tagged(c):
        return F.when(c.isNull(), F.lit("n")).otherwise(
            F.concat(F.lit("v"), c.cast("string"))
        )

    key = F.concat(tagged(F.col(strata_col)), F.lit("|"), tagged(F.col(id_col)))
    return df.filter(hash_fraction(key) < F.lit(fraction))


def quality_topk_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    w = Window.partitionBy(group_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


def contamination_overlap(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per train document, the number of distinct
    word n-grams it shares with a benchmark corpus (only contaminated docs
    are returned — inner join on the shingle). The benchmark shingle set is
    broadcast by default (eval sets are tiny next to a training corpus); at
    100 TB the train side streams through the broadcast filter at scan
    speed with no shuffle of train data."""
    from logparserhelper_spark.functions.dedup import word_shingles

    tsh = word_shingles(train, text_col, id_col, k=n)
    bsh = word_shingles(bench, text_col, id_col, k=n).select("shingle").distinct()
    if broadcast_bench:
        bsh = F.broadcast(bsh)
    return (
        tsh.join(bsh, "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))  # tsh is distinct per doc
        .select(F.col("id").alias(id_col), F.col("n_hits").cast("long").alias("n_hits"))
    )


def weighted_sample_topk(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis-Spirakis A-Res) per group:
    each row gets priority u^(1/w) for deterministic md5-uniform u — rank
    by ln(u)/w equivalently — and the k largest priorities win. Items are
    selected with probability proportional to weight, the selection is
    reproducible under reprocessing (unlike rand()-based sampling), and
    the plan is a WindowGroupLimit: each task pre-ranks locally so the
    exchange carries at most k rows per group per task. The ranking key is
    rounded to integer pico-nats ((ln u)/w * 1e12) with an id tiebreak so
    both engines order identically despite libm ulp differences; the 1e12
    scale keeps ~7 significant digits of resolution even at weights ~1e6
    (a 1e6 scale would collapse most keys to 0 there and hand selection to
    the tiebreak). u is (h + 0.5)/2^32, strictly inside (0, 1): a doc_id
    whose md5 starts with eight zero hex digits must not produce ln(0) —
    Spark would yield NULL but DuckDB raises, killing the oracle query."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    u = (h + F.lit(0.5)) / F.lit(float(2**32))
    key = F.round(F.log(u) / F.col(weight_col) * 1e12).cast("long")
    ranked = df.withColumn("_key", key).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.desc("_key"), F.asc(id_col)
            )
        ),
    )
    return ranked.filter(F.col("_rn") <= k).drop("_key", "_rn")


def temperature_mix(
    df: DataFrame,
    source_col: str,
    tau: float = 0.5,
    budget_frac: float = 0.3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source mixing (the Gopher/Pile data-mixing knob):
    target source proportions are renormalized counts^tau — tau < 1
    flattens the source distribution, upweighting rare sources — and each
    source is sampled at the deterministic fraction that hits an overall
    ``budget_frac`` of the corpus (capped at taking a source whole). The
    per-source fractions are computed IN-PLAN from a tiny counts aggregate
    broadcast back onto the rows (no driver collect), and membership is
    md5-deterministic, so the mix is reproducible under reprocessing.

    Engine-portability: selection compares the integer 32-bit hash against
    FLOOR(fraction * 2^32) — a libm pow() ulp difference between engines
    would have to move fraction*2^32 across an integer boundary to flip a
    row (~2^-30 per source), rather than the ~2^-1 chance of comparing
    raw doubles. Returns the kept rows with a ``mix_fraction`` column."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    qcol = F.pow(F.col("_n").cast("double"), F.lit(float(tau)))
    weighted = counts.select(source_col, "_n", qcol.alias("_q"))
    tot = weighted.agg(
        F.sum("_q").alias("_qsum"), F.sum("_n").alias("_ntot")
    )
    fracs = weighted.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(budget_frac))
            * F.col("_ntot")
            * (F.col("_q") / F.col("_qsum"))
            / F.col("_n"),
        ).alias("mix_fraction"),
    )
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        df.join(F.broadcast(fracs), source_col)
        .filter(h < F.floor(F.col("mix_fraction") * F.lit(float(2**32))))
    )


def contamination_bloom(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = 3,
    m: int = 131072,
) -> DataFrame:
    """Bloom-filter decontamination: the scale path for benchmark overlap
    when even the DISTINCT benchmark shingle strings are too wide to
    broadcast. The bench side collapses to its set bit positions (at most
    k per shingle, <= m total ints — bounded by the filter size, not the
    benchmark size), which broadcasts; each train shingle is flagged when
    all k of its positions are set. Returns per-doc
    (doc_id, n_shingles, n_bloom_hits, n_exact_hits) for every doc with at
    least one Bloom hit, so the false-positive mass is visible next to the
    exact inner-join count (n_bloom_hits >= n_exact_hits always).

    Deterministic md5 position hashes (``sketch.md5_slot``) make the whole
    construction — including which false positives fire — reproducible in a
    DuckDB oracle. A production variant would pack the positions into an
    actual bitset inside a pandas UDF; the join form keeps the identical
    semantics with engine-portable hashing."""
    from logparserhelper_spark.functions.dedup import word_shingles
    from logparserhelper_spark.functions.sketch import md5_slot

    tsh = word_shingles(train, text_col, id_col, k=n)  # (id, shingle), distinct per doc
    bsh = word_shingles(bench, text_col, id_col, k=n).select("shingle").distinct()

    def positions(col):
        return F.array(*[md5_slot(col, i, m) for i in range(k)])

    bits = (
        bsh.select(F.explode(positions(F.col("shingle"))).alias("pos")).distinct()
    )
    probe = tsh.select("id", "shingle", F.explode(positions(F.col("shingle"))).alias("pos"))
    # a shingle is a Bloom hit iff ALL k probe rows find their bit set
    # (duplicate positions from colliding salts each match independently,
    # so the row count still reaches k exactly when every position is set)
    bloom_hits = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy("id", "shingle")
        .agg(F.count(F.lit(1)).alias("_nset"))
        .filter(F.col("_nset") == k)
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bloom_hits"))
    )
    exact_hits = (
        tsh.join(F.broadcast(bsh), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact_hits"))
    )
    n_shingles = tsh.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    return (
        bloom_hits.join(n_shingles, "id")
        .join(exact_hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "n_bloom_hits",
            F.coalesce(F.col("n_exact_hits"), F.lit(0)).cast("long").alias("n_exact_hits"),
        )
    )


def pack_offsets(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Adds (shard, bin): shard = pmod(id, n_shards); bin = exclusive prefix
    token count within the shard (ordered by id) div budget.

    n_shards bounds the packing parallelism (one sorted window per shard) —
    size it to ~4x the executor-core count at scale; 16 suits the sandbox."""
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return out.withColumn("bin", F.floor(prefix / budget).cast("int"))
