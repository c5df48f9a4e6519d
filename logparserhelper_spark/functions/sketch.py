"""Mergeable sketches: KMV distinct-count, count-min frequency, Bloom bits.

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


def md5_slot(col, salt: int, mod: int) -> F.Column:
    """Deterministic hash slot in [0, mod): first 8 hex chars of
    md5('<salt>:' || value) mod ``mod``. Engine-portable — DuckDB reproduces
    it as CAST('0x' || substr(md5(...), 1, 8) AS BIGINT) % mod — which is
    what makes the count-min and Bloom sketches below oracle-checkable
    bit-for-bit (no HLL/CMS library pair can promise that)."""
    h = F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 8)
    return F.conv(h, 16, 10).cast("long") % mod


def hll_rho(rest: int, rest_bits: int) -> int:
    """HLL rank of the remainder bits: leading-zero count + 1 within
    ``rest_bits`` (rest == 0 -> rest_bits + 1). The ONE Python source of
    truth for the rank rule — used by the streaming fold and the test
    mirrors; the batch Spark expressions and the DuckDB oracle each encode
    it independently (that independence IS the oracle's value)."""
    return rest_bits + 1 if rest == 0 else rest_bits - rest.bit_length() + 1


def hll_estimate(registers, m: int) -> tuple[int, float]:
    """(n_registers, estimate) from a register array — harmonic mean with
    the small-range linear-counting branch, the same formula the Spark
    expressions in hll_distinct compute. Rounding is left to callers
    (Spark ROUND is HALF_UP; Python round() is HALF_EVEN — do not mix)."""
    import math

    alpha = 0.7213 / (1 + 1.079 / m)
    nz = [int(r) for r in registers if r > 0]
    s = sum(2.0 ** -r for r in nz) + (m - len(nz))
    raw = alpha * m * m / s
    v_zero = m - len(nz)
    est = m * math.log(m / v_zero) if (raw <= 2.5 * m and v_zero > 0) else raw
    return len(nz), est


def round_half_up(x: float, digits: int) -> float:
    """Spark's ROUND semantics (half away from zero) for non-negative x —
    Python's built-in round() is banker's and disagrees at ties."""
    import math

    scale = 10 ** digits
    return math.floor(x * scale + 0.5) / scale


def hll_registers(
    df: DataFrame, group_col: str, value_col: str, p: int = 8
) -> DataFrame:
    """The HLL register table (_g, _bucket, _M) behind ``hll_distinct`` —
    max leading-zero rank of the 32-bit md5 remainder per (group, bucket).
    Exposed so tests can fold the SAME registers through the shared Python
    ``hll_estimate`` and compare the streaming sketch exactly (no libm
    tolerance). Only buckets that saw a value appear (register > 0)."""
    rest_bits = 32 - p
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("h:"), F.col("_v").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    base = (
        df.select(F.col(group_col).alias("_g"), F.col(value_col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .select(
            "_g",
            F.shiftright(h, rest_bits).alias("_bucket"),
            (h % F.lit(1 << rest_bits)).alias("_rest"),
        )
    )
    rho = F.when(F.col("_rest") == 0, rest_bits + 1).otherwise(
        rest_bits - F.length(F.bin(F.col("_rest"))) + 1
    )
    return (
        base.select("_g", "_bucket", rho.alias("_rho"))
        .groupBy("_g", "_bucket")
        .agg(F.max("_rho").alias("_M"))
    )


def hll_distinct(
    df: DataFrame, group_col: str, value_col: str, p: int = 8
) -> DataFrame:
    """HyperLogLog distinct estimate (Flajolet et al. 2007) per group —
    the production-standard distinct sketch beside KMV: hash each value to
    32 bits (md5, engine-portable), bucket on the top ``p`` bits, register
    = max leading-zero rank of the remainder, estimate via the harmonic
    mean with the small-range linear-counting correction. The shuffle
    carries at most 2^p registers per group (map-side combined maxes), so
    cardinality never inflates the exchange — the property that lets a
    10^12-row distinct run in one bounded pass.

    Deterministic and oracle-checkable: the rank uses integer bit-length
    (via the binary-string trick both engines share), the harmonic sum is
    a sum of exact powers of two (order-independent in IEEE double), and
    the estimate is rounded at 2 decimals to absorb libm ln() ulp
    differences. Returns (group, n_registers, hll_est)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    regs = hll_registers(df, group_col, value_col, p)
    agg = regs.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("_M"))).alias("_s"),
    )
    raw = (
        F.lit(alpha * m * m) / (F.col("_s") + (F.lit(m) - F.col("n_registers")))
    )
    v_zero = F.lit(m) - F.col("n_registers")
    est = F.when(
        (raw <= 2.5 * m) & (v_zero > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero)
    ).otherwise(raw)
    return agg.select(
        F.col("_g").alias(group_col),
        "n_registers",
        F.round(est, 2).alias("hll_est"),
    )


def log_histogram_bins(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The bin table (_g, _bin, _c, _rep) behind ``log_histogram_quantiles``
    — integer-micro scaling, (bit_length, next-2-bits) binning, per-group
    counts with map-side combine. Exposed so the streaming twin's state can
    be compared against it bin-for-bin (same role as ``hll_registers`` for
    the HLL pair). ``log_bin_value`` is the Python mirror of this exact
    expression tree. NULLs and (for float columns) NaN data values are
    both excluded — a NaN would otherwise cast to bin 1 here while the
    streaming fold cannot tell it apart from a SQL NULL, breaking the
    bit-for-bit parity contract."""
    vc = F.col(value_col)
    not_nan = (
        ~F.isnan(vc)
        if dict(df.dtypes).get(value_col) in ("float", "double")
        else F.lit(True)
    )
    df = df.filter(vc.isNotNull() & not_nan)
    m = F.greatest(F.round(F.col(value_col) * 1e6).cast("long"), F.lit(1))
    bl = F.length(F.bin(m))
    p = F.pow(F.lit(2.0), (bl - 3).cast("double"))
    sub = F.when(bl >= 3, F.floor(m / p) % 4).otherwise(F.lit(0)).cast("int")
    lower = F.when(
        bl >= 3, (4 + sub) * p
    ).otherwise(F.pow(F.lit(2.0), (bl - 1).cast("double")))
    upper = F.when(
        bl >= 3, (5 + sub) * p
    ).otherwise(F.pow(F.lit(2.0), bl.cast("double")))
    return (
        df.select(
            F.col(group_col).alias("_g"),
            (bl * 4 + sub).alias("_bin"),
            ((lower + upper) / 2.0 / 1e6).alias("_rep"),
        )
        .groupBy("_g", "_bin")
        .agg(F.count(F.lit(1)).alias("_c"), F.min("_rep").alias("_rep"))
    )


def log_bin_value(v: float) -> tuple[int, float]:
    """Python mirror of ``log_histogram_bins``'s per-value expressions:
    (bin, rep) for one value. Float ops deliberately mimic the Spark tree
    (long -> double division for the sub-bin, power-of-two products exact
    in IEEE double) so a streaming fold lands values in bit-identical
    bins. The ONE Python source of truth for the streaming sketch."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    # Spark ROUND(double) = BigDecimal on the double's SHORTEST repr,
    # HALF_UP. floor(x + 0.5) is not that: for odd integer micros in
    # [2^52, 2^53) the +0.5 add ties-to-even and lands on m+1 where
    # HALF_UP keeps m. Python repr() is the same shortest round-trip
    # string Java's Double.toString produces, so Decimal(repr(x))
    # quantized HALF_UP matches Spark bit-for-bit across the range.
    x = v * 1e6
    m = max(int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP)), 1)
    bl = m.bit_length()
    if bl >= 3:
        p = 2.0 ** (bl - 3)
        sub = int(math.floor(float(m) / p)) % 4
        lower, upper = (4 + sub) * p, (5 + sub) * p
    else:
        sub = 0
        lower, upper = 2.0 ** (bl - 1), 2.0 ** bl
    return bl * 4 + sub, (lower + upper) / 2.0 / 1e6


def quantiles_from_bins(
    bins: dict[int, tuple[int, float]], qs: tuple
) -> tuple[int, list[float]]:
    """(n, [q estimates]) from a {bin: (count, rep)} histogram — the same
    first-bin-reaching-ceil(q*n/100) rule the batch window expressions
    compute, with Spark's HALF_UP rounding at 6. Shared by the streaming
    fold and the batch-parity test (one code path => exact comparisons)."""
    import math

    n = sum(c for c, _ in bins.values())
    out = []
    for q in qs:
        need = math.ceil(n * q / 100)
        cum = 0
        est = None
        for b in sorted(bins):
            c, rep = bins[b]
            cum += c
            if cum >= need:
                est = round_half_up(rep, 6)
                break
        out.append(est)
    return n, out


def pack_bins(bins: dict[int, tuple[int, float]]) -> bytes:
    """Canonical byte form of a bin histogram (sorted bin ids; int32 bin,
    int64 count, float64 rep arrays) — the streaming state layout, reused
    to serialize batch bins for bit-for-bit parity assertions."""
    import numpy as np

    ks = sorted(bins)
    return (
        np.array(ks, dtype=np.int32).tobytes()
        + np.array([bins[k][0] for k in ks], dtype=np.int64).tobytes()
        + np.array([bins[k][1] for k in ks], dtype=np.float64).tobytes()
    )


def unpack_bins(blob: bytes) -> dict[int, tuple[int, float]]:
    import numpy as np

    nb = len(blob) // 20
    ks = np.frombuffer(blob, dtype=np.int32, count=nb)
    cs = np.frombuffer(blob, dtype=np.int64, count=nb, offset=4 * nb)
    rs = np.frombuffer(blob, dtype=np.float64, count=nb, offset=12 * nb)
    return {int(k): (int(c), float(r)) for k, c, r in zip(ks, cs, rs)}


def log_histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple = (50, 95),
) -> DataFrame:
    """Mergeable quantile sketch with a DETERMINISTIC, engine-portable
    construction: values are scaled to integer micros, binned by
    (bit_length, next-2-bits) — 4 sub-bins per octave, <= ~12.5% relative
    error — and per-group bin counts aggregate with map-side combine (the
    shuffle carries at most ~120 bins per group, never the values). The
    q-th percentile estimate is the midpoint of the first bin whose
    cumulative count reaches ceil(q*n/100).

    Unlike t-digest/GK/KLL, whose centroids depend on arrival ORDER (and
    so are not partition-invariant), this binning is a pure function of
    each value — the same property that makes every other sketch in this
    module oracle-checkable bit-for-bit. Bit-length comes from the binary
    string length (integer, no float log), and the power-of-two products
    in the bin bounds are exact in IEEE double, so both engines compute
    identical bins and midpoints. Returns (group, n, q<q>_est ...)."""
    binned = log_histogram_bins(df, group_col, value_col)
    # single pass over the histogram: running count + per-group total as
    # window functions, then ONE conditional aggregation picks every
    # quantile's first qualifying bin (min of (bin, rep) structs — a
    # second aggregation pass per quantile would rescan the input)
    cum = binned.withColumn(
        "_cum", F.sum("_c").over(Window.partitionBy("_g").orderBy("_bin"))
    ).withColumn("_n", F.sum("_c").over(Window.partitionBy("_g")))
    aggs = [F.max("_n").cast("long").alias("n")]
    for q in qs:
        hit = F.col("_cum") >= F.ceil(F.col("_n") * q / 100)
        aggs.append(
            F.min(F.when(hit, F.struct("_bin", "_rep"))).alias(f"_q{q}")
        )
    out = cum.groupBy("_g").agg(*aggs)
    return out.select(
        F.col("_g").alias(group_col),
        "n",
        *[F.round(F.col(f"_q{q}")["_rep"], 6).alias(f"q{q}_est") for q in qs],
    )


def count_min_table(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a depth×width
    count table: rows (d, slot, cnt). One pass over the data; the groupBy
    partial-aggregates map-side to at most depth×width rows per task, so
    the shuffle carries a bounded sketch no matter the input size — the
    property that makes CMS the right frequency structure at 10^12 rows
    (an exact per-key count would shuffle every distinct key)."""
    pairs = df.select(
        F.posexplode(
            F.array(*[md5_slot(F.col(key_col), d, width) for d in range(depth)])
        ).alias("d", "slot")
    )
    return pairs.groupBy("d", "slot").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_estimates(
    keys: DataFrame, sketch: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point-query the sketch for each key in ``keys``: est = min over the
    depth rows the key hashes to. CMS never underestimates (every slot holds
    the key's true count plus non-negative collision mass). The sketch is
    depth×width rows -> broadcast; keys stream through with no shuffle until
    the tiny per-key min. Keys absent from the sketched data may hit missing
    slots and drop out (inner join) — callers query keys drawn from the
    data, where every slot exists."""
    slots = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[md5_slot(F.col(key_col), d, width) for d in range(depth)])
        ).alias("d", "slot"),
    )
    return (
        slots.join(F.broadcast(sketch), ["d", "slot"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )
