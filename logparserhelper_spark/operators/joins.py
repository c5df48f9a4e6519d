"""Temporal join operators Spark lacks as built-ins: as-of join and
bucketed range join.

Both are expressed as compositions of existing DataFrame ops (the preferred
realization per the build rules) — no Pandas UDF, no nested-loop join:

- ``asof_join``: the union + ordered-window trick. Left and right rows are
  unioned on the join key, ordered by (ts, side) with right rows sorting
  first at equal timestamps (inclusive ``left.ts >= right.ts`` semantics),
  and ``last(value, ignorenulls=True)`` over an unbounded-preceding window
  carries the most recent right payload onto every left row. ONE shuffle by
  key — never the O(|L|x|R|) inequality join Catalyst would otherwise plan.
  At 100 TB the window sort is per-key; a single mega-key serializes — for
  that shape pre-partition by (key, coarse time range) and run per range
  with boundary carry-in.
- ``range_join_bucketed``: interval containment via time-bucket equi-join.
  Intervals explode into the fixed-width buckets they cover; points carry
  exactly one bucket, so each qualifying (point, interval) pair meets on
  exactly one key — the residual BETWEEN filter needs no dedup. Shuffle
  volume is O(|points| + |intervals| * spans) instead of a broadcast
  nested loop; bucket width tunes the explode factor vs join selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward (inclusive) as-of join: each left row gains the right row's
    value columns from the most recent right timestamp <= left timestamp in
    the same ``by`` group, or nulls when no prior right row exists.

    The right side should be unique per (by, ts): ties between right rows at
    the identical timestamp are ambiguous in every as-of formulation —
    pre-aggregate (e.g. ``max_by``) before calling.

    Null handling: right rows with a null timestamp can never be "the most
    recent prior row" (a null comparison matches nothing in any as-of
    semantics) and are dropped — left alone they would sort nulls-first and
    leak their values into every left row. Left rows with a null timestamp
    survive with null match columns.
    """
    right = right.filter(F.col(ts_col).isNotNull())
    left_only = [c for c in left.columns if c not in (by, ts_col)]
    rv = right_value_cols or [c for c in right.columns if c not in (by, ts_col)]
    ltypes = dict(left.dtypes)
    # the matched right row is carried as ONE struct: last(ignorenulls) then
    # skips left rows (struct null there) but never skips a right row whose
    # VALUE columns are null — per-column fills would forward-fill past a
    # legitimately-null value and could stitch columns from different rows
    rstruct = F.struct(F.col(ts_col).alias("_ts"), *[F.col(c).alias(c) for c in rv])

    l2 = left.select(
        by,
        ts_col,
        F.lit(1).alias("_side"),
        *left_only,
        F.lit(None).cast(
            right.select(rstruct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r2 = right.select(
        by,
        ts_col,
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_only],
        rstruct.alias("_r"),
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        by,
        ts_col,
        "_side",
        *left_only,
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            by,
            ts_col,
            *left_only,
            *[F.col(f"_r.{c}").alias(f"{c}{suffix}") for c in rv],
            F.col("_r._ts").alias(f"{ts_col}{suffix}"),
        )
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    by: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_secs: int = 1800,
) -> DataFrame:
    """Inner join of points to intervals with ``start <= ts <= end``
    (inclusive) within the same ``by`` group, planned as a bucket equi-join
    plus residual filter. Output: point columns + interval columns."""
    p = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_secs)
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_secs),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_secs),
            )
        ),
    )
    return (
        p.join(iv, [by, "_b"])
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_b")
    )
