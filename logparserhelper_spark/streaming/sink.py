"""foreachBatch sink with exactly-once file output.

Structured Streaming's foreachBatch gives at-least-once delivery: after a
failure the same (batch_id, data) pair is replayed. Exactly-once file output
therefore needs idempotence keyed by batch_id — the same mechanism the batch
pipeline's bucket commit protocol uses (pipeline.py): write the batch into a
batch_id-keyed directory, then land an atomic marker; a replayed batch whose
marker exists is skipped. On Iceberg the equivalent is a MERGE/overwrite
whose snapshot property records the batch id; the directory+marker form is
the file-system realization of the same contract.

Marker IO goes through the Hadoop FileSystem API resolved from ``out_dir``'s
own scheme — the SAME filesystem the batch data lands on — so hdfs:// and
s3a:// sinks keep their replay guard (driver-local ``os.path`` markers would
silently degrade a remote sink to at-least-once). Note the usual object-store
caveat: rename is atomic on HDFS and local file systems; on S3A the final
marker PUT is what makes the commit visible, which is still safe here because
the marker is only ever written after the data directory is complete.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path_str: str):
    """(Hadoop FileSystem for the path's scheme, Hadoop Path)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _write_atomic(spark: SparkSession, path_str: str, payload: bytes) -> None:
    """Write-then-rename through the path's own FileSystem."""
    fs, path = _fs_and_path(spark, path_str)
    tmp = spark._jvm.org.apache.hadoop.fs.Path(path_str + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(payload))
    finally:
        out.close()
    fs.delete(path, False)  # replay safety: stale tmp promotion must win
    if not fs.rename(tmp, path):
        raise IOError(f"marker rename failed: {tmp} -> {path}")


def exactly_once_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Returns a ``foreachBatch`` function: each micro-batch lands under
    ``out_dir/batch_id=<id>/`` with a commit marker; replays are no-ops.
    Marker and data share ``out_dir``'s filesystem (any Hadoop scheme)."""
    markers = f"{out_dir.rstrip('/')}/_batches"

    def write(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        marker = f"{markers}/{batch_id}.json"
        fs, marker_path = _fs_and_path(spark, marker)
        if fs.exists(marker_path):
            return  # replayed after a failure: this batch already committed
        target = f"{out_dir.rstrip('/')}/batch_id={batch_id}"
        df.write.mode("overwrite").parquet(target)  # overwrite = safe re-run
        # no row count in the marker: df.count() would re-execute the whole
        # micro-batch lineage a second time just for bookkeeping
        _write_atomic(
            spark, marker, json.dumps({"batch_id": batch_id}).encode()
        )

    return write


def committed_batches(out_dir: str, spark: SparkSession | None = None) -> set[int]:
    """Batch ids with a landed commit marker. Pass ``spark`` to resolve
    remote schemes (hdfs://, s3a://); without it only local paths are
    readable and a scheme-qualified ``out_dir`` raises."""
    markers = f"{out_dir.rstrip('/')}/_batches"
    if spark is None:
        import os

        if "://" in out_dir:
            raise ValueError(
                f"committed_batches: {out_dir!r} has a URI scheme; pass the "
                "SparkSession so markers are listed via the Hadoop FileSystem"
            )
        if not os.path.isdir(markers):
            return set()
        names = os.listdir(markers)
    else:
        fs, path = _fs_and_path(spark, markers)
        if not fs.exists(path):
            return set()
        names = [st.getPath().getName() for st in fs.listStatus(path)]
    return {
        int(fn[: -len(".json")])
        for fn in names
        if fn.endswith(".json") and fn[: -len(".json")].isdigit()
    }
