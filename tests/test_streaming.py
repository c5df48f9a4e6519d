"""Streaming lift tests: the streaming parse->route path must produce the
same routed rows as the batch path on the same input, and windowed per-sink
counts must respect event-time windows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logparserhelper_spark.datagen import generate_transcripts
from logparserhelper_spark.defaults import default_pattern_bank
from logparserhelper_spark.operators.enrich import bank_dim
from logparserhelper_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from logparserhelper_spark.streaming.parse_stream import (
    stream_parse_route,
    stream_sink_counts,
)

BANK = default_pattern_bank()


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    d = generate_transcripts(str(tmp_path_factory.mktemp("sdata") / "tiny"), "tiny")
    # the file stream source requires a directory of files
    sd = os.path.join(d, "stream_src")
    os.makedirs(sd, exist_ok=True)
    os.link(os.path.join(d, "transcripts.parquet"), os.path.join(sd, "part-0.parquet"))
    return d


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_stream_matches_batch(spark, tiny_dir):
    bdim = bank_dim(spark, BANK)
    path = os.path.join(tiny_dir, "stream_src")
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(path)
    routed = stream_parse_route(stream, BANK, bdim)
    q = (
        routed.writeStream.outputMode("append")
        .format("memory")
        .queryName("routed_stream")
        .start()
    )
    _drain(q)
    got = {
        (r.conv_id, r.turn_idx, r.sink, r.pattern_id, r.start, r.end, r.match)
        for r in spark.sql("SELECT * FROM routed_stream").collect()
    }
    batch_src = spark.read.parquet(path)
    batch = stream_parse_route(batch_src, BANK, bdim)  # same fn works on batch DF
    exp = {
        (r.conv_id, r.turn_idx, r.sink, r.pattern_id, r.start, r.end, r.match)
        for r in batch.collect()
    }
    assert got == exp and len(got) > 0


def test_stream_windowed_counts(spark, tiny_dir):
    bdim = bank_dim(spark, BANK)
    path = os.path.join(tiny_dir, "stream_src")
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(path)
    counts = stream_sink_counts(stream_parse_route(stream, BANK, bdim))
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sink_counts")
        .start()
    )
    _drain(q)
    rows = spark.sql("SELECT * FROM sink_counts").collect()
    assert rows
    # windows are aligned and non-overlapping 10-minute intervals
    for r in rows:
        assert (r.window_end - r.window_start).total_seconds() == 600
    # total routed rows conserved across windows
    batch = stream_parse_route(spark.read.parquet(path), BANK, bdim)
    assert sum(r.n_rows for r in rows) == batch.count()
