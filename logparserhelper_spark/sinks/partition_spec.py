"""Hidden partitioning for the snapshot table: Iceberg partition
transforms (spec: https://iceberg.apache.org/spec/#partition-transforms)
re-expressed for the HadoopTables shim in ``hadoop_table.py``.

A partition spec is a list of fields, each deriving one partition value
from one source column: ``identity``, ``year``/``month``/``day``/``hour``
(time granularity), ``bucket[N]`` (hash mod N) and ``truncate[W]``
(string prefix / integer floor-to-multiple). The derived values are what
the writer lays out as hive directories; the SOURCE columns stay in the
data files and are all a reader ever sees — that is Iceberg's "hidden
partitioning": queries filter on raw columns (``ts >= X``) and the
planner projects those predicates onto the partition values to prune
files, without the query author knowing the layout
(iceberg spec "Scan Planning" / inclusive projection).

Two deliberate shim divergences, both documented here rather than
silent:

- time transforms store the formatted UTC-naive string (``yyyy-MM-dd``
  etc.) as the partition value instead of Iceberg's
  int-days/months-from-epoch. Fixed-width date strings compare
  lexicographically in value order, so inclusive projection is
  unchanged; the hive dirs stay human-readable.
- ``bucket`` hashes ``md5(cast(value as string))`` (top 15 hex digits
  mod N) instead of murmur3_x86_32, because the exact same function must
  be computable on the Spark side (``conv(substring(md5(..)))``
  built-ins, JVM-side, no UDF) and the Python side (``hashlib``, for
  projecting literals at plan time) — the sandbox has no murmur3 shared
  by both. The property that matters — a deterministic, uniform hash
  identical at write time and plan time — is preserved; tables written
  by this shim are not bucket-compatible with real Iceberg readers.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass
from datetime import date, datetime
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

# Spark writes a null partition value as this hive marker directory.
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

_TIME_FORMATS = {
    "year": "yyyy",
    "month": "yyyy-MM",
    "day": "yyyy-MM-dd",
    "hour": "yyyy-MM-dd-HH",
}
_TIME_PY_FORMATS = {
    "year": "%Y",
    "month": "%Y-%m",
    "day": "%Y-%m-%d",
    "hour": "%Y-%m-%d-%H",
}
_ALIASES = {
    "years": "year",
    "months": "month",
    "days": "day",
    "hours": "hour",
    "date": "day",
}

_SPEC_RE = re.compile(r"^\s*(\w+)\s*\(\s*(?:(\d+)\s*,\s*)?([\w.]+)\s*\)\s*$")


@dataclass(frozen=True)
class PartitionField:
    """One partition-spec field: ``name`` is the derived hive directory
    key, ``source`` the data column it is computed from."""

    name: str
    source: str
    transform: str  # identity|year|month|day|hour|bucket|truncate
    param: int | None = None

    # -- serialization ---------------------------------------------------
    def to_json(self) -> dict[str, Any]:
        d: dict[str, Any] = {
            "name": self.name,
            "source": self.source,
            "transform": self.transform,
        }
        if self.param is not None:
            d["param"] = self.param
        return d

    @staticmethod
    def from_json(d: dict[str, Any]) -> "PartitionField":
        return PartitionField(
            d["name"], d["source"], d["transform"], d.get("param")
        )

    # -- write side ------------------------------------------------------
    def spark_expr(self, df: DataFrame) -> Column:
        """The derived partition value as a JVM-side expression (no
        UDF): this is what the writer partitions by."""
        col = F.col(self.source)
        if self.transform == "identity":
            return col
        if self.transform in _TIME_FORMATS:
            return F.date_format(col, _TIME_FORMATS[self.transform])
        if self.transform == "bucket":
            # md5 hex is non-negative; 15 hex digits = 60 bits fits a long
            return F.when(
                col.isNull(), F.lit(None).cast("long")
            ).otherwise(
                F.conv(
                    F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
                ).cast("long")
                % F.lit(self.param)
            )
        if self.transform == "truncate":
            dt = df.schema[self.source].dataType.simpleString()
            if dt in ("string", "varchar", "char"):
                return F.substring(col, 1, self.param)
            # integral floor-to-multiple; pmod keeps the Iceberg
            # floor-toward-negative-infinity behavior for negatives
            return (col - F.pmod(col, F.lit(self.param))).cast(dt)
        raise ValueError(f"unknown partition transform {self.transform!r}")

    # -- plan side -------------------------------------------------------
    def py_value(self, value: Any) -> str | None:
        """Transform a plan-time LITERAL exactly as the Spark expression
        transforms a row value, returned in the hive-dir string form the
        manifest stores. None means the literal cannot be projected
        (e.g. unparseable) — callers must treat that as "cannot prune"."""
        if value is None:
            return None
        if self.transform == "identity":
            return str(value)
        if self.transform in _TIME_PY_FORMATS:
            ts = _as_datetime(value)
            if ts is None:
                return None
            return ts.strftime(_TIME_PY_FORMATS[self.transform])
        if self.transform == "bucket":
            s = _spark_string(value)
            if s is None:
                return None
            h = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
            return str(h % self.param)
        if self.transform == "truncate":
            if isinstance(value, str):
                return value[: self.param]
            if isinstance(value, int) and not isinstance(value, bool):
                return str(value - (value % self.param))
            return None
        raise ValueError(f"unknown partition transform {self.transform!r}")

    @property
    def monotonic(self) -> bool:
        """Order-preserving in the stored string form: time transforms
        (fixed-width formats) and truncate (prefix / floor) — the
        transforms range predicates project through. bucket is not."""
        return self.transform in _TIME_FORMATS or self.transform in (
            "identity",
            "truncate",
        )


def _as_datetime(value: Any) -> datetime | None:
    if isinstance(value, datetime):
        return value
    if isinstance(value, date):
        return datetime(value.year, value.month, value.day)
    if isinstance(value, str):
        try:
            return datetime.fromisoformat(value.replace("T", " "))
        except ValueError:
            return None
    return None


def _spark_string(value: Any) -> str | None:
    """``cast(value as string)`` as Spark renders it, for the bucket
    hash. Types whose Spark string form this shim has verified: str,
    int, float, date, datetime (space-separated, no trailing zeros
    beyond seconds when zero — we only support second precision)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, str):
        return value
    if isinstance(value, int):
        return str(value)
    if isinstance(value, datetime):
        if value.microsecond:
            return value.strftime("%Y-%m-%d %H:%M:%S.%f").rstrip("0")
        return value.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(value, date):
        return value.isoformat()
    if isinstance(value, float):
        return repr(value)
    return None


def parse_partition_spec(cols: list[str] | None) -> list[PartitionField]:
    """Parse user partition declarations — plain column names
    (identity) or transform calls ``days(ts)`` / ``bucket(8, key)`` /
    ``truncate(4, code)`` — into a spec. Derived names follow Iceberg's
    convention: ``<source>_<transform>`` (``ts_day``, ``key_bucket``)."""
    out: list[PartitionField] = []
    for c in cols or []:
        m = _SPEC_RE.match(c)
        if not m:
            out.append(PartitionField(c.strip(), c.strip(), "identity"))
            continue
        fn, param_s, source = m.group(1).lower(), m.group(2), m.group(3)
        fn = _ALIASES.get(fn, fn)
        if fn == "identity":
            out.append(PartitionField(source, source, "identity"))
            continue
        if fn in _TIME_FORMATS:
            if param_s is not None:
                raise ValueError(f"{fn}() takes no width parameter: {c!r}")
            out.append(PartitionField(f"{source}_{fn}", source, fn))
            continue
        if fn in ("bucket", "truncate"):
            if param_s is None:
                raise ValueError(f"{fn}() requires a width parameter: {c!r}")
            param = int(param_s)
            if param <= 0:
                raise ValueError(f"{fn}() width must be positive: {c!r}")
            suffix = "bucket" if fn == "bucket" else "trunc"
            out.append(
                PartitionField(f"{source}_{suffix}", source, fn, param)
            )
            continue
        raise ValueError(f"unknown partition transform in {c!r}")
    names = [f.name for f in out]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate derived partition names in {cols!r}")
    return out


def identity_spec(partition_cols: list[str]) -> list[PartitionField]:
    """The spec a legacy manifest (derived-name list only) implies."""
    return [PartitionField(c, c, "identity") for c in partition_cols]


def spec_to_json(spec: list[PartitionField]) -> list[dict[str, Any]]:
    return [f.to_json() for f in spec]


def spec_from_json(d: list[dict[str, Any]]) -> list[PartitionField]:
    return [PartitionField.from_json(e) for e in d]


def derive_partition_columns(
    df: DataFrame, spec: list[PartitionField]
) -> DataFrame:
    """Add the derived partition value columns a write partitions by.
    Identity fields are the source column itself — nothing added."""
    for f in spec:
        if f.transform != "identity":
            df = df.withColumn(f.name, f.spark_expr(df))
    return df


def _typed_cmp(pv: str, lit: Any, op: str) -> bool | None:
    """Compare a hive-dir string against a literal under the literal's
    type; None = incomparable (caller keeps the file — inclusive)."""
    if isinstance(lit, bool):
        want = "true" if lit else "false"
        return (pv == want) if op == "=" else None
    if isinstance(lit, int):
        try:
            v: Any = int(pv)
        except ValueError:
            return None
    elif isinstance(lit, float):
        try:
            v = float(pv)
        except ValueError:
            return None
    elif isinstance(lit, str):
        v = pv
    else:
        return None
    if op == "=":
        return v == lit
    if op == "<":
        return v < lit
    if op == "<=":
        return v <= lit
    if op == ">":
        return v > lit
    if op == ">=":
        return v >= lit
    return None


def _in_member_hits(f: PartitionField, pv: str, raw: Any) -> bool:
    """Could ``source = raw`` hold for a row in partition value ``pv``?
    The single-member equality projection used per-member by the ``in``
    disjunction — True on any ambiguity (unprojectable literal), exact
    equality otherwise, for every transform (equality projects through
    bucket too, unlike range predicates)."""
    t = f.py_value(raw)
    if t is None:
        return True  # literal not projectable — keep
    if f.transform == "identity":
        return _typed_cmp(pv, raw, "=") is not False
    if f.transform == "truncate" and isinstance(raw, int):
        try:
            return int(pv) == int(t)
        except ValueError:
            return True
    return pv == t


def partition_may_match(
    partition: dict[str, str],
    spec: list[PartitionField],
    pred: list[tuple],
) -> bool:
    """Iceberg's INCLUSIVE projection of a conjunctive row predicate
    onto a file's partition tuple: False only when some conjunct is
    provably false for every row the file can contain — never prunes a
    file that might match (the same contract as the footer-metrics
    skipper in hadoop_table._file_may_match, which this composes with).

    Rules per conjunct ``(col, op, value)`` where ``col`` is the SOURCE
    of a spec field with partition value ``pv``:

    - any transform, ``is_null``: row matches only if source is null,
      and every transform here maps null -> null -> HIVE_NULL dir; so
      prune when ``pv`` is a non-null dir value. ``is_not_null``: the
      reverse.
    - comparison ops against a HIVE_NULL dir: the file holds only
      null-source rows; no comparison can match -> prune.
    - identity: typed direct comparison.
    - monotonic transforms (time, truncate): ``=`` -> pv == T(value);
      ``<``/``<=`` -> pv <= T(value); ``>``/``>=`` -> pv >= T(value)
      (widened to be inclusive: the boundary partition may hold both
      matching and non-matching rows).
    - bucket: equality only -> pv == bucket(value); range predicates do
      not project through a hash.
    """
    by_source: dict[str, list[PartitionField]] = {}
    for f in spec:
        by_source.setdefault(f.source, []).append(f)
    for term in pred:
        col, op = term[0], term[1]
        lit = term[2] if len(term) > 2 else None
        for f in by_source.get(col, []):
            if f.name not in partition:
                continue  # file predates this spec field — keep
            pv = partition[f.name]
            is_null_dir = pv == HIVE_NULL
            if op == "is_null":
                if not is_null_dir:
                    return False
                continue
            if op == "is_not_null":
                if is_null_dir:
                    return False
                continue
            if is_null_dir:
                return False  # only null-source rows; no comparison matches
            if op == "in":
                # disjunction of equalities: prune only when EVERY member
                # provably misses this file's partition value (an
                # unprojectable member keeps the file)
                if any(
                    _in_member_hits(f, pv, raw) for raw in lit
                ):
                    continue
                return False  # incl. the empty IN list: never true
            t = f.py_value(lit)
            if t is None:
                continue  # literal not projectable — keep
            if f.transform == "identity":
                r = _typed_cmp(pv, lit, op)
                if r is False:
                    return False
                continue
            if f.transform == "bucket":
                if op == "=" and pv != t:
                    return False
                continue
            # monotonic string forms: fixed-width time formats and
            # truncate (int form compared as ints)
            if f.transform == "truncate" and isinstance(lit, int):
                try:
                    pv_c: Any = int(pv)
                    t_c: Any = int(t)
                except ValueError:
                    continue
            else:
                pv_c, t_c = pv, t
            if op == "=" and pv_c != t_c:
                return False
            if op in ("<", "<=") and not pv_c <= t_c:
                return False
            if op in (">", ">=") and not pv_c >= t_c:
                return False
    return True
