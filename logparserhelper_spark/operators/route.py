"""Routing — multicast fan-out by matched pattern class.

Reference semantics: a char range can carry tags from several patterns at
once, and duplicate bank entries each produce their own tag set
(core/regex_highlighter.py:16-25) — so routing is MULTICAST: a turn matching
k bank entries lands in all k sinks; duplicate patterns double-route
(Zookeeper rows go to both 'hdfs-timestamp' and 'zookeeper-timestamp').
"No match" is the common case in log corpora, so ``unmatched`` is a
first-class sink.

Spark realization: the fused parse output already has one row per (turn,
span); routing is a broadcast join to the bank dim for sink/class/color plus
a coalesce to 'unmatched' for null pattern_ids. Crucially this is
shuffle-free — the write fans out via ``partitionBy("sink")`` within each
task (SURVEY.md §7 hard-part #2: one pass, no per-sink recompute, no
persist+N actions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNMATCHED_SINK = "unmatched"


def route(parsed: DataFrame, bank_dim_df: DataFrame) -> DataFrame:
    """parsed = output of parse_and_explode (one row per span; null-span rows
    for unmatched turns). Returns routed rows with sink/pattern_name/color."""
    dim = bank_dim_df.select("pattern_id", "pattern_name", "sink", "color")
    out = parsed.join(F.broadcast(dim), on="pattern_id", how="left")
    return out.withColumn("sink", F.coalesce(F.col("sink"), F.lit(UNMATCHED_SINK)))
