"""foreachBatch sink with exactly-once file output.

Structured Streaming's foreachBatch gives at-least-once delivery: after a
failure the same (batch_id, data) pair is replayed. Exactly-once file output
therefore needs idempotence keyed by batch_id — the same mechanism the batch
pipeline's bucket commit protocol uses (pipeline.py): write the batch into a
batch_id-keyed directory, then land an atomic marker; a replayed batch whose
marker exists is skipped. On Iceberg the equivalent is a MERGE/overwrite
whose snapshot property records the batch id; the directory+marker form is
the sandbox's parquet realization of the same contract.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame


def exactly_once_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Returns a ``foreachBatch`` function: each micro-batch lands under
    ``out_dir/batch_id=<id>/`` with a commit marker; replays are no-ops."""
    markers = os.path.join(out_dir, "_batches")

    def write(df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(markers, f"{batch_id}.json")
        if os.path.exists(marker):
            return  # replayed after a failure: this batch already committed
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        df.write.mode("overwrite").parquet(target)  # overwrite = safe re-run
        os.makedirs(markers, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            # no row count here: df.count() would re-execute the whole
            # micro-batch lineage a second time just for bookkeeping
            json.dump({"batch_id": batch_id}, f)
        os.rename(tmp, marker)  # atomic commit point

    return write


def committed_batches(out_dir: str) -> set[int]:
    markers = os.path.join(out_dir, "_batches")
    if not os.path.isdir(markers):
        return set()
    return {
        int(fn[: -len(".json")])
        for fn in os.listdir(markers)
        if fn.endswith(".json")
    }
