"""Custom stateful streaming operator: per-conversation running rollups via
``applyInPandasWithState``.

The batch pipeline's conv rollup is a stateless aggregation; on a stream the
same rollup must carry state across micro-batches (a conversation's turns
arrive over time). State per conv_id = (n_turns, n_spans, max_turn_idx);
each micro-batch folds its rows into the state and emits the updated rollup
row (update semantics — downstream sink MERGEs on conv_id).

At 10^12-turn scale state is partitioned by conv_id across executors and
checkpointed by the streaming engine; the fold is a per-group pandas
reduction over the batch's Arrow data (no per-row Python from the driver).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from logparserhelper_spark.banks import PatternBank, get_compiled_bank

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_spans", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_spans", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)


def stateful_conv_rollup(stream_df: DataFrame, bank: PatternBank) -> DataFrame:
    """streaming transcripts -> running per-conversation rollup rows.
    Input needs (conv_id, turn_idx, text)."""
    spec = bank.spec()

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cb = get_compiled_bank(spec)
        n_turns, n_spans, max_idx = (
            state.get if state.exists else (0, 0, -1)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            n_spans += int(
                sum(len(cb.extract(t)) if isinstance(t, str) else 0 for t in pdf["text"])
            )
            if len(pdf):
                max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        state.update((n_turns, n_spans, max_idx))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n_turns],
                "n_spans": [n_spans],
                "max_turn_idx": [max_idx],
            }
        )

    return (
        stream_df.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
