"""D1 — the conversation as a char-offset-addressable document.

The reference loads one whole log file and addresses matches by global char
offset (``"1.0 + N chars"``, gui/app_window.py:43-48,
core/regex_highlighter.py:23-24). Here a "document" is one conversation:
turns concatenated in stable (conv_id, turn_idx) order with ``\\n``
separators, and each turn's global starting offset reconstructed as
``sum(length(text) + 1)`` over the preceding turns (SURVEY.md §2 Table B,
window row).

For the shipped bank, full-document matching is provably equal to per-turn
matching with offsets shifted by the turn's global offset (no pattern can
cross a newline — verified on the reference corpora and pinned by
``test_document_vs_turn_equivalence``). The pipeline therefore parses
per-turn (parallel, skew-free) while this operator provides the
document-level view and offsets for consumers that need reference-style
global addressing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_offsets(turns: DataFrame) -> DataFrame:
    """Adds ``doc_offset`` — the char offset of each turn's first character
    in the conversation document (turns joined with '\\n')."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(F.length("text") + 1).over(w), F.lit(0))
    return turns.withColumn("doc_offset", off.cast("int"))


def conversation_documents(turns: DataFrame) -> DataFrame:
    """(conv_id, document, n_turns): turns concatenated in stable order.
    ``sort_array`` over (turn_idx, text) structs gives order inside the
    aggregation without a window — one shuffle, map-side partial."""
    return (
        turns.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("turn_idx", "text"))
                    ),
                    lambda s: s["text"],
                ),
                "\n",
            ).alias("document"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )


def document_spans(turns: DataFrame, bank, text_col: str = "text") -> DataFrame:
    """Per-turn spans lifted to document coordinates: (conv_id, turn_idx,
    pattern_id, doc_start, doc_end, match). Equal to matching the whole
    document when no bank pattern can cross a turn boundary."""
    from logparserhelper_spark.operators.extract import parse_and_explode

    parsed = parse_and_explode(with_global_offsets(turns), bank, text_col)
    return parsed.filter(F.col("pattern_id").isNotNull()).select(
        "conv_id",
        "turn_idx",
        "pattern_id",
        (F.col("doc_offset") + F.col("start")).alias("doc_start"),
        (F.col("doc_offset") + F.col("end")).alias("doc_end"),
        "match",
    )
