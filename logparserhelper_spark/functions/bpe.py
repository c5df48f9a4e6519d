"""Byte-pair-encoding tokenization as a distributed op: train a merge
table over a corpus and apply it — the real LLM-pipeline tokenizer shape
(Sennrich et al. 2016; GPT-2-style byte-level symbols), not the
pretokenizer-count proxy in ``textstats.py``.

Architecture (the one real tokenizer trainers use, scaled Spark-first):

- **Pretokenize JVM-side** with the shared ``BPE_ISH_PATTERN`` via
  ``regexp_extract_all`` — train and apply see byte-identical pretokens,
  and the Python/Java regex-dialect question never enters the hot path.
- **Word histogram = the one distributed pass**: explode pretokens,
  hash-groupBy count (map-side combine, single shuffle). At 100 TB this
  is the only stage that touches the corpus; everything after runs on
  the histogram, exactly like HuggingFace/SentencePiece trainers.
- **Cap + collect**: top ``max_words`` by (count DESC, word ASC) — a
  TakeOrderedAndProject, bounded by construction. Merge learning then
  runs driver-side on the histogram (``n_merges`` × Σ|word| work).
- **Apply** is an Arrow-batched pandas UDF over the JVM-extracted
  pretoken arrays with a per-worker cache — tokenization is a pure
  function of the pretoken, so each distinct pretoken merges once per
  worker (mirrors the oracle's distinct-pretoken recursion).

Symbols live in a **lowercase-hex byte domain** ("68" = byte 0x68):
byte-level like GPT-2, and — deliberately — a pure-ASCII alphabet so the
(count DESC, pair ASC) tie-break collates identically in Python and in
the DuckDB oracle, which replays training as a recursive CTE and apply
as chained delimiter-replaces (see contract_queries.SQL_BPE_*).

Merge application is left-to-right non-overlapping per merge, merges
applied in learned-rank order (Sennrich's reference ``apply_bpe``).
Reference repo (MaksimBrezho/logparserhelper) has no tokenizer — this
is LLM-pipeline surface (SURVEY.md §2 "token counting" extended).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logparserhelper_spark.functions.textstats import BPE_ISH_PATTERN

__all__ = [
    "pretokens_col",
    "word_histogram",
    "train_bpe_merges",
    "train_bpe",
    "apply_bpe",
    "merge_word",
    "tokenize_pretoken",
]


def pretokens_col(col: Column) -> Column:
    """All pretokenizer matches of BPE_ISH_PATTERN, JVM-side (group 0)."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def _hex_word(col: Column) -> Column:
    """Lowercase hex of the string's UTF-8 bytes — the byte-level BPE
    symbol-source domain (pure ASCII, so orderings collate identically
    across Python / Spark / DuckDB)."""
    return F.lower(F.hex(F.encode(col, "UTF-8")))


def word_histogram(
    df: DataFrame, text_col: str = "text", max_words: int = 100_000
) -> list[tuple[str, int]]:
    """(hex_word, count) histogram of pretokens, capped at the
    ``max_words`` most frequent (ties broken by word ASC — a total order,
    so the cap is deterministic). One shuffle over the corpus; the
    result is bounded by construction before collect."""
    rows = (
        df.select(F.explode(pretokens_col(F.col(text_col))).alias("w"))
        .select(_hex_word(F.col("w")).alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["count"]) for r in rows]


def _symbols(hex_word: str) -> tuple[str, ...]:
    """Initial symbol sequence: one 2-hex-digit token per byte."""
    return tuple(hex_word[i : i + 2] for i in range(0, len(hex_word), 2))


def merge_word(toks: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Merge all left-to-right non-overlapping (left, right) adjacencies
    — the same scan order a single-pass string replace performs, which is
    what the DuckDB oracle uses."""
    out: list[str] = []
    i, n = 0, len(toks)
    while i < n:
        if i + 1 < n and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return tuple(out)


def train_bpe_merges(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Sennrich merge learning on a (hex_word, count) histogram: each
    round counts adjacent symbol pairs (zip-overlapping, weighted by word
    count), picks the (max count, then lexicographically smallest pair)
    winner, and merges it everywhere. Stops early when no pairs remain.
    Pure driver-side function of the histogram — deterministic, and
    replayed exactly by the oracle's recursive CTE."""
    words: list[tuple[tuple[str, ...], int]] = [
        (_symbols(w), c) for w, c in word_counts
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for toks, c in words:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = [
            (merge_word(toks, best[0], best[1]) if len(toks) > 1 else toks, c)
            for toks, c in words
        ]
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 24,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Distributed histogram → driver-side merge learning. Returns the
    ordered merge table [(left_hex, right_hex), ...]."""
    return train_bpe_merges(word_histogram(df, text_col, max_words), n_merges)


def tokenize_pretoken(hex_word: str, merges: tuple[tuple[str, str], ...]) -> tuple[str, ...]:
    """Apply the merge table to one pretoken, in learned-rank order."""
    toks = _symbols(hex_word)
    for left, right in merges:
        if len(toks) < 2:
            break
        toks = merge_word(toks, left, right)
    return toks


# Worker-lifetime memo shared across Arrow batches (a cache built inside
# the UDF body would reset per batch, making the Python cost O(distinct
# pretokens x batches)). Defined as its own decorated function, not
# lru_cache(fn) applied at module level — the latter inherits fn's
# __qualname__ and breaks cloudpickle's pickle-by-reference.
@lru_cache(maxsize=1 << 16)
def _cached_tokens(hex_word: str, merges: tuple) -> tuple[str, ...]:
    return tokenize_pretoken(hex_word, merges)


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_prefix: str = "bpe_",
) -> DataFrame:
    """Tokenize under a fixed merge table. Adds:

    - ``{p}n_pretokens``   — pretokenizer match count (pure JVM),
    - ``{p}n_tokens``      — BPE token count after merging,
    - ``{p}first_tokens``  — the first pretoken's merged hex symbols
      joined by '|' ('' when the text has no pretokens) — a value-level
      probe of actual token boundaries, not just counts.

    The pandas UDF receives the JVM-extracted pretoken array and merges
    each distinct pretoken once per worker via the module-level
    ``_cached_tokens`` memo (shared across Arrow batches), so the Python
    cost is O(distinct pretokens per worker), not O(corpus) — the same
    memoization the oracle's distinct-pretoken recursion expresses."""
    mt = tuple((l, r) for l, r in merges)

    @F.pandas_udf("struct<n_tokens: int, first_tokens: string>")
    def _apply(pretoks: pd.Series) -> pd.DataFrame:
        n_out, f_out = [], []
        for arr in pretoks:
            if arr is None or len(arr) == 0:
                n_out.append(0)
                f_out.append("")
                continue
            hexes = [w.encode("utf-8").hex() for w in arr]
            n_out.append(sum(len(_cached_tokens(h, mt)) for h in hexes))
            f_out.append("|".join(_cached_tokens(hexes[0], mt)))
        return pd.DataFrame({"n_tokens": n_out, "first_tokens": f_out})

    p = out_prefix
    # NULL text -> empty pretoken array so every output column agrees
    # (n_pretokens 0, n_tokens 0, first_tokens '') instead of a NULL/0 mix
    with_pre = df.withColumn(
        "__pretoks",
        F.coalesce(
            pretokens_col(F.col(text_col)), F.array().cast("array<string>")
        ),
    )
    applied = with_pre.withColumn("__bpe", _apply(F.col("__pretoks")))
    return (
        applied.withColumn(p + "n_pretokens", F.size("__pretoks").cast("int"))
        .withColumn(p + "n_tokens", F.col("__bpe.n_tokens"))
        .withColumn(p + "first_tokens", F.col("__bpe.first_tokens"))
        .drop("__pretoks", "__bpe")
    )
