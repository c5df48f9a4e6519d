"""Enrichment — broadcast-hash joins against tiny dimensions.

The reference has no joins (SURVEY.md §2 Table B); these are the north-rule
additions: role/tool lookups plus the pattern-bank dimension (class name,
sink, color — the reference's O5 class tagging as data). All dims are
O(10-10^3) rows, so every join is pinned ``F.broadcast`` — AQE must never
demote them to a shuffle join at any input scale. Left joins preserve
unmatched lookups as nulls (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logparserhelper_spark.banks import PatternBank
from logparserhelper_spark.colors import color_for


def bank_dim(spark: SparkSession, bank: PatternBank) -> DataFrame:
    """The pattern bank as a dimension: (pattern_id, pattern_name, pattern,
    sink, color). Color is the reference's palette[i % 10]
    (utils/color_utils.py:18)."""
    rows = [
        (e.pattern_id, e.name, e.pattern, e.sink, color_for(e.pattern_id))
        for e in bank.entries
    ]
    return spark.createDataFrame(
        rows, "pattern_id int, pattern_name string, pattern string, sink string, color string"
    )


def enrich(
    df: DataFrame,
    role_dim: DataFrame | None = None,
    tool_dim: DataFrame | None = None,
) -> DataFrame:
    """Left-join role/tool dimensions, broadcast-pinned."""
    out = df
    if role_dim is not None:
        out = out.join(F.broadcast(role_dim), on="role", how="left")
    if tool_dim is not None:
        out = out.join(F.broadcast(tool_dim), on="tool", how="left")
    return out
