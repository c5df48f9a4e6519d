"""O7/O8 — template substitution ("parse-transform") with enabled-filter.

Reference semantics (gui/log_generator.py:40-48): ``re.sub(pattern,
replacement, text)`` per enabled entry; replacement templates support
numbered and named group refs; an invalid pattern falls back to the input
(re.error caught). Disabled entries are skipped (:47,76-81).

Spark realization: one Arrow-batched pandas UDF applying the enabled chain
via ``Series.str.replace(compiled, repl, regex=True)`` — vectorized at batch
granularity, Python-``re`` dialect (templates like ``\\g<name>`` are Python
syntax; Spark's ``regexp_replace`` is the Java dialect, so it is used only
where a test proves per-pattern equivalence). Compile errors are handled
once per entry per worker (CompiledTransforms), never per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logparserhelper_spark.banks import TransformBank, get_compiled_transforms


def make_normalize_udf(bank: TransformBank):
    spec = bank.spec()

    @F.pandas_udf("string")
    def normalize(texts: pd.Series) -> pd.Series:
        ct = get_compiled_transforms(spec)
        out = texts
        for rx, repl in ct.steps:
            try:
                out = out.str.replace(rx, repl, regex=True)
            except Exception:
                # bad replacement template (e.g. ref to missing group):
                # reference behavior is fall back to the input — skip entry
                continue
        return out

    return normalize


def normalize_text(
    df: DataFrame,
    bank: TransformBank,
    text_col: str = "text",
    out_col: str = "norm_text",
) -> DataFrame:
    return df.withColumn(out_col, make_normalize_udf(bank)(F.col(text_col)))
