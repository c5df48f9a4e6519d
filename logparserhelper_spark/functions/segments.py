"""Corpus-level segment (line / paragraph) deduplication, CCNet-style.

CCNet (Wenzek et al., 2020) drops duplicated *paragraphs* across the whole
corpus before document-level dedup: boilerplate (cookie banners, navbars,
license headers) repeats across millions of pages while the surrounding
documents stay distinct, so document-hash dedup never catches it.

Shape here (all built-ins, no UDF, never collects):

1. segment: split each document into positioned segments — either on a
   literal separator (``sep='\\n'`` for lines, ``'\\n\\n'`` for paragraphs)
   or into non-overlapping ``chunk_words``-word windows (for corpora whose
   text carries no newlines; also the fixed-width variant used by
   suffix-array span dedup pipelines).
2. key: md5 of the whitespace-collapsed lowercase segment. The shuffle
   carries (32-byte key, id, pos) — never the segment text twice.
3. keep rule over a window partitioned by key:
   - ``keep='first'``: row_number ordered by (doc_id, pos) == 1 — the
     canonical CCNet semantics (first occurrence survives, later copies
     drop). Deterministic: (doc_id, pos) is unique.
   - ``keep='none'``: count() > 1 drops every copy (the stricter variant
     used when boilerplate itself is unwanted).
   Segments whose normalized form is shorter than ``min_chars`` are always
   kept: blank/near-blank lines are both semantically harmless and the
   corpus's hottest keys — exempting them removes the one guaranteed skew
   partition from the window shuffle.
4. rebuild: one groupBy(doc_id) re-assembles surviving segments in
   position order. Documents that lose every segment still surface with
   empty text (the conditional collect_list skips dropped rows but the
   group row itself survives).

100-TB notes: two shuffles total (window by key, rebuild by doc_id), both
hash-partitioned on high-cardinality keys. Hot boilerplate keys carry only
(id, pos) tuples after the md5 projection, so even a million-way duplicate
is a few MB in one partition. The md5 keeps shuffle width independent of
segment length.

No reference-parity citation: the reference tool (see SURVEY §1) has no
corpus dedup; this extends the SURVEY §2 LLM-pipeline dedup family
alongside functions/dedup.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _chunk_segments(text_col, chunk_words: int):
    """Non-overlapping ``chunk_words``-word segments, single-space joined."""
    ws = F.split(F.trim(text_col), r"\s+")
    n_seg = F.ceil(F.size(ws) / F.lit(float(chunk_words))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_seg, F.lit(1)) - 1),
        lambda i: F.array_join(
            F.slice(ws, i * chunk_words + 1, chunk_words), " "
        ),
    )


def seg_norm(c):
    """Segment canonical form: collapse \\s+ FIRST, then trim — a '\\r'
    or '\\t'-only line must normalize to '' so the min_chars blank
    exemption sees it, and 'hello\\r' must key equal to 'hello' across
    mixed LF/CRLF corpora. (Deliberately NOT dedup.normalize_text_col,
    whose trim-first form is pinned by its oracles and the streaming
    stateful mirror — there the form only needs to be self-consistent,
    here edge whitespace changes keep/drop decisions.)"""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def segment_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str,
    chunk_words: int | None,
    min_chars: int,
) -> tuple[DataFrame, str]:
    """(positioned-segment rows, rebuild joiner) — the ONE segmentation
    + keying expression tree, shared by the batch op and the streaming
    twin so the two can never disagree on a segment's dedup key.
    Columns: _id, _pos, _seg, _key (md5 of :func:`seg_norm`), _eligible
    (False = under ``min_chars`` after normalization: always kept)."""
    c = F.col(text_col)
    if chunk_words is not None:
        if chunk_words < 1:
            raise ValueError("chunk_words must be >= 1")
        segs_col, joiner = _chunk_segments(c, chunk_words), " "
    else:
        segs_col, joiner = F.split(c, re.escape(sep)), sep
    segs = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(segs_col).alias("_pos", "_seg"),
    )
    norm = seg_norm(F.col("_seg"))
    return (
        segs.select(
            "_id", "_pos", "_seg",
            F.md5(norm).alias("_key"),
            (F.length(norm) >= min_chars).alias("_eligible"),
        ),
        joiner,
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    chunk_words: int | None = None,
    min_chars: int = 1,
    keep: str = "first",
) -> DataFrame:
    """Drop corpus-duplicated segments and rebuild documents.

    Returns one row per input document: (id_col, text [rebuilt],
    kept_segments, dropped_segments). ``chunk_words`` switches from
    separator splitting to fixed word windows; the rebuild joiner is then
    a single space instead of ``sep``.
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    segs, joiner = segment_rows(
        df, text_col, id_col, sep, chunk_words, min_chars
    )
    if keep == "first":
        w = Window.partitionBy("_key").orderBy("_id", "_pos")
        survives = F.row_number().over(w) == 1
    else:
        w = Window.partitionBy("_key")
        survives = F.count(F.lit(1)).over(w) == 1
    segs = segs.select(
        "_id", "_pos", "_seg",
        (~F.col("_eligible") | survives).alias("_kept"),
    )
    return segs.groupBy(F.col("_id").alias(id_col)).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_kept"), F.struct("_pos", "_seg"))
                    )
                ),
                lambda x: x["_seg"],
            ),
            joiner,
        ).alias(text_col),
        F.sum(F.when(F.col("_kept"), 1).otherwise(0))
        .cast("int")
        .alias("kept_segments"),
        F.sum(F.when(F.col("_kept"), 0).otherwise(1))
        .cast("int")
        .alias("dropped_segments"),
    )
