"""logparserhelper_spark — a from-scratch, PySpark-native rebuild of the
query/data-processing semantics of ``MaksimBrezho/logparserhelper``.

The reference (read-only at /root/reference) is a single-threaded Tkinter
tool whose computational core is: an ordered regex pattern bank applied
independently pattern-by-pattern over a text document, producing class-tagged
character spans (core/regex_highlighter.py:5-25), plus an enabled-filtered
``re.sub`` template bank (gui/log_generator.py:40-48).

This package re-expresses those semantics as a distributed
parse -> enrich -> route -> aggregate pipeline over a ``transcripts`` table
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp), Spark-first:

- matching runs inside Arrow-batched pandas UDFs with Python ``re``
  (dialect fidelity vs the reference; never per-row Python from the driver),
- enrichment is broadcast-hash-joined dimensions,
- routing is a multicast fan-out (duplicate bank entries double-route, as in
  the reference where duplicate patterns each produce their own tag set),
- aggregates are stock partial+final hash aggregations,
- long-conversation skew is handled with conv_id+salt repartitioning,
- every stage is a pure function of (bank version, input) so sinks are
  idempotent overwrites and checkpoint-resume is sound
  (mirrors the reference's full-recompute idempotence,
  core/regex_highlighter.py:10).
"""

__version__ = "0.1.0"

from logparserhelper_spark.banks import (  # noqa: F401
    PatternBank,
    TransformBank,
    load_pattern_bank,
    load_transform_bank,
)
