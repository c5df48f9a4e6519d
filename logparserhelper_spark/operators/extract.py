"""O4 — multi-pattern span extraction, the core operator.

Reference semantics (core/regex_highlighter.py:16-25): for each bank entry in
order, ``re.finditer`` over the text; entries are independent (overlapping
spans across patterns coexist); duplicate entries each produce their own full
span set (multicast).

Spark realization — two shapes over the same per-worker ``CompiledBank``
(compiled once per Python worker, bank deduped to distinct pattern strings,
cheap alternation prefilter for the no-match common case):

- ``with_spans``: a scalar Arrow-batched pandas UDF producing the D4 span
  column ``array<struct<pattern_id,start,end,match>>`` per turn. Matching
  stays in Python ``re`` deliberately: Spark SQL's ``regexp_extract_all`` is
  the Java dialect, and oracle equality demands Python semantics
  (SURVEY.md §4.3).
- ``parse_and_explode``: the fused hot path — one ``mapInPandas`` pass that
  emits one output row per span plus one ``pattern_id IS NULL`` row per
  unmatched turn. This skips materializing the array<struct> column and the
  separate explode + anti passes: a single JVM->Python->JVM Arrow round trip
  per batch, with the fan-out built by ``np.repeat`` on batch indices (no
  per-row Python beyond the regex scan itself).

Both paths are tested equal to the pure-Python oracle and to each other.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logparserhelper_spark.banks import PatternBank, get_compiled_bank

SPAN_STRUCT = T.StructType(
    [
        T.StructField("pattern_id", T.IntegerType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("match", T.StringType()),
    ]
)
SPAN_ARRAY_TYPE = T.ArrayType(SPAN_STRUCT)


def make_extract_spans_udf(bank: PatternBank):
    spec = bank.spec()  # plain tuple: cheap closure capture, hashable cache key

    @F.pandas_udf(SPAN_ARRAY_TYPE)
    def extract_spans(texts: pd.Series) -> pd.Series:
        cb = get_compiled_bank(spec)
        return pd.Series(
            [cb.extract(t) if isinstance(t, str) else [] for t in texts.tolist()],
            index=texts.index,
            dtype=object,
        )

    return extract_spans


def with_spans(df: DataFrame, bank: PatternBank, text_col: str = "text") -> DataFrame:
    return df.withColumn("spans", make_extract_spans_udf(bank)(F.col(text_col)))


def parse_and_explode(
    df: DataFrame, bank: PatternBank, text_col: str = "text"
) -> DataFrame:
    """Fused extract+explode+unmatched. Output schema = input columns plus
    (pattern_id int, start int, end int, match string); unmatched turns keep
    exactly one row with those four columns null."""
    spec = bank.spec()
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [
            T.StructField("pattern_id", T.IntegerType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("match", T.StringType()),
        ]
    )
    in_cols = [f.name for f in in_schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cb = get_compiled_bank(spec)
        for pdf in batches:
            texts = pdf[text_col].tolist()
            spans = [cb.extract(t) if isinstance(t, str) else [] for t in texts]
            counts = np.fromiter((len(s) for s in spans), dtype=np.int64, count=len(spans))
            # one row per span; unmatched turns contribute one null-span row
            reps = np.where(counts == 0, 1, counts)
            idx = np.repeat(np.arange(len(spans)), reps)
            out = pdf.iloc[idx][in_cols].reset_index(drop=True)
            n_out = len(out)
            n_spans = int(counts.sum())
            # positions of matched rows in the interleaved output
            matched_pos = np.repeat(counts > 0, reps)
            null_mask = ~matched_pos

            def int_col(values: np.ndarray) -> pd.arrays.IntegerArray:
                buf = np.zeros(n_out, dtype=np.int32)
                buf[matched_pos] = values
                return pd.arrays.IntegerArray(buf, null_mask.copy())

            flat_iter = (v for row in spans for v in row)
            flat = np.empty((n_spans, 4), dtype=object)
            for j, tup in enumerate(flat_iter):
                flat[j] = tup
            out["pattern_id"] = int_col(flat[:, 0].astype(np.int32) if n_spans else np.empty(0, np.int32))
            out["start"] = int_col(flat[:, 1].astype(np.int32) if n_spans else np.empty(0, np.int32))
            out["end"] = int_col(flat[:, 2].astype(np.int32) if n_spans else np.empty(0, np.int32))
            match = np.full(n_out, None, dtype=object)
            if n_spans:
                match[matched_pos] = flat[:, 3]
            out["match"] = match
            yield out

    return df.mapInPandas(gen, schema=out_schema)
