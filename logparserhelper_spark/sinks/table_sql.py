"""SQL frontend for snapshot-table DDL, DML, and maintenance.

Spark's own SQL parser only reaches catalog tables, and this sandbox has
no Iceberg catalog — so the statements an Iceberg user types every day
(``ALTER TABLE``, ``DELETE FROM``, ``CALL system.rewrite_data_files``)
need a path-addressed frontend to be usable against the snapshot-table
shim. :func:`table_sql` maps a practical subset of that surface onto the
:class:`~logparserhelper_spark.sinks.hadoop_table.HadoopTable` API — one
statement, one atomic commit, same semantics as calling the method:

    table_sql(spark, "ALTER TABLE '/data/t' RENAME COLUMN v TO value")
    table_sql(spark, "ALTER TABLE '/data/t' ADD COLUMN lang string DEFAULT 'en'")
    table_sql(spark, "ALTER TABLE '/data/t' ALTER COLUMN v TYPE bigint")
    table_sql(spark, "ALTER TABLE '/data/t' DROP COLUMN tmp")
    table_sql(spark, "ALTER TABLE '/data/t' SET TBLPROPERTIES ('history.keep-last'='3')")
    table_sql(spark, "ALTER TABLE '/data/t' UNSET TBLPROPERTIES ('owner')")
    table_sql(spark, "ALTER TABLE '/data/t' CREATE TAG audit_v3 AS OF VERSION 3")
    table_sql(spark, "ALTER TABLE '/data/t' CREATE BRANCH wap")
    table_sql(spark, "CALL fast_forward('/data/t', name => 'wap')")
    table_sql(spark, "ALTER TABLE '/data/t' DROP BRANCH wap")
    table_sql(spark, "DELETE FROM '/data/t' WHERE k = 3 AND v IS NOT NULL")
    table_sql(spark, "DELETE FROM '/data/t' WHERE k IN (3, 5, 8)")
    table_sql(spark, "UPDATE '/data/t' SET v = 'x', n = 0 WHERE k IN (1, 2)")
    table_sql(spark, '''
        MERGE INTO '/data/t' t USING updates_view s ON t.k = s.k
        WHEN MATCHED AND s.op = 'del' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v, n = t.n + 1
        WHEN NOT MATCHED THEN INSERT *
    ''')
    table_sql(spark, "CALL compact('/data/t')")
    table_sql(spark, "CALL expire_snapshots('/data/t', keep_last => 2)")
    table_sql(spark, "CALL maintain('/data/t')")
    table_sql(spark, "VACUUM '/data/t'")

The grammar is deliberately small and STRICT: anything outside it raises
``ValueError`` with the supported shapes, never a silent partial parse.
``DELETE``/``UPDATE`` predicates are the same conjunctive ``col op
literal`` / ``col IN (lit, ...)`` / ``col IS [NOT] NULL`` terms the
table's ``read``/``delete``/``update`` accept — exactly what manifests
can plan. ``UPDATE`` maps onto :meth:`HadoopTable.update` (copy-on-write
row rewrite, serializable). Queries (SELECT) are not routed here:
``spark.read.format("snapshot_table")`` already gives full Spark SQL
over table reads.

Reference parity note: the reference app (MaksimBrezho/logparserhelper)
persists state by whole-file JSON overwrite (utils/json_utils.py:21-27);
this module is part of the Spark-first table surface replacing it.
"""

from __future__ import annotations

import re
from typing import Any

from .hadoop_table import HadoopTable

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_LOC = r"'(?P<loc>[^']+)'"
# column types accepted by ALTER ADD/ALTER COLUMN — Spark DDL strings,
# possibly parameterized (decimal(10,2), array<float>)
_TYPE = r"(?P<type>[A-Za-z_][A-Za-z0-9_]*(?:\s*[<(][^)>]*[)>])?)"


def _literal(tok: str) -> Any:
    """Parse one SQL literal: 'string', integer, float, TRUE/FALSE, NULL."""
    t = tok.strip()
    if re.fullmatch(r"'(?:[^']|'')*'", t):
        return t[1:-1].replace("''", "'")
    low = t.lower()
    if low == "null":
        return None
    if low in ("true", "false"):
        return low == "true"
    if re.fullmatch(r"[+-]?\d+", t):
        return int(t)
    if re.fullmatch(r"[+-]?\d*\.\d+(?:[eE][+-]?\d+)?", t):
        return float(t)
    raise ValueError(f"unsupported literal {tok!r}")


def _parse_literal_list(text: str) -> list:
    """A comma-separated literal list (the body of ``IN (...)``) —
    quote-aware, so string literals may contain commas; STRICT (trailing
    commas, empty slots, and junk all raise)."""
    toks: list = []
    pat = re.compile(rf"\s*((?:{_QSTR})|[^,']+?)\s*(,|$)")
    pos, tail_comma = 0, False
    while pos < len(text):
        m = pat.match(text, pos)
        if not m or m.end() == pos:
            raise ValueError(f"bad literal list {text!r}")
        toks.append(_literal(m.group(1)))
        tail_comma = m.group(2) == ","
        pos = m.end()
    if not toks or tail_comma:
        raise ValueError(f"bad literal list {text!r}")
    return toks


def _parse_predicate(text: str) -> list[tuple]:
    """Conjunctive WHERE clause -> the shim's (col, op, value) terms."""
    terms: list[tuple] = []
    for part in re.split(r"(?i)\s+AND\s+", text.strip()):
        m = re.fullmatch(
            rf"({_IDENT})\s+IS\s+NOT\s+NULL", part.strip(), re.I
        )
        if m:
            terms.append((m.group(1), "is_not_null", None))
            continue
        m = re.fullmatch(rf"({_IDENT})\s+IS\s+NULL", part.strip(), re.I)
        if m:
            terms.append((m.group(1), "is_null", None))
            continue
        m = re.fullmatch(
            rf"({_IDENT})\s+IN\s*\((?P<vals>.*)\)", part.strip(), re.I
        )
        if m:
            terms.append(
                (m.group(1), "in", tuple(_parse_literal_list(m.group("vals"))))
            )
            continue
        m = re.fullmatch(
            rf"({_IDENT})\s*(==|<=|>=|=|<|>)\s*(\S.*)", part.strip()
        )
        if m:
            terms.append((m.group(1), m.group(2), _literal(m.group(3))))
            continue
        raise ValueError(
            f"unsupported predicate term {part.strip()!r}; terms are "
            "'col <op> literal' (= < <= > >=), 'col IN (lit, ...)', or "
            "'col IS [NOT] NULL', joined by AND"
        )
    return terms


def _split_where(text: str) -> tuple[str, str]:
    """Split ``<head> WHERE <pred>`` at the first WHERE keyword OUTSIDE
    string literals (a ``SET v = ' where '`` assignment must not split
    there)."""
    i, n = 0, len(text)
    while i < n:
        if text[i] == "'":
            m = re.match(_QSTR, text[i:])
            if not m:
                raise ValueError(f"unterminated string literal in {text!r}")
            i += m.end()
            continue
        m = re.match(r"(?i)\s+WHERE\s+", text[i:])
        if m:
            return text[:i], text[i + m.end():]
        i += 1
    raise ValueError("statement needs a WHERE clause")


def _parse_assignments(text: str) -> dict:
    """``SET col = literal [, col = literal ...]`` — quote-aware comma
    split; STRICT (duplicates, trailing commas, and junk all raise)."""
    out: dict = {}
    pat = re.compile(
        rf"\s*({_IDENT})\s*=\s*((?:{_QSTR})|[^,']+?)\s*(,|$)"
    )
    pos, tail_comma = 0, False
    while pos < len(text):
        m = pat.match(text, pos)
        if not m or m.end() == pos:
            raise ValueError(
                f"bad SET clause {text!r}; use col = literal, joined by commas"
            )
        col = m.group(1)
        if col in out:
            raise ValueError(f"duplicate SET column {col!r}")
        out[col] = _literal(m.group(2))
        tail_comma = m.group(3) == ","
        pos = m.end()
    if not out or tail_comma:
        raise ValueError(
            f"bad SET clause {text!r}; use col = literal, joined by commas"
        )
    return out


_QSTR = r"'(?:[^']|'')*'"
_PAIR = rf"{_QSTR}\s*=\s*{_QSTR}"


def _parse_prop_pairs(text: str) -> dict[str, str]:
    # STRICT: the whole list must be well-formed pairs — findall-style
    # extraction would silently skip garbage between them
    if not re.fullmatch(rf"\s*{_PAIR}\s*(?:,\s*{_PAIR}\s*)*", text):
        raise ValueError(
            "SET TBLPROPERTIES needs ('key'='value', ...) pairs"
        )
    pairs = re.findall(rf"({_QSTR})\s*=\s*({_QSTR})", text)
    return {
        k[1:-1].replace("''", "'"): v[1:-1].replace("''", "'")
        for k, v in pairs
    }


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0 and outside string literals —
    a SET/VALUES list whose expressions contain ``f(a, b)`` calls or
    quoted commas must not split inside them. STRICT: unbalanced parens
    and unterminated strings raise."""
    parts, buf, depth, i, n = [], [], 0, 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            m = re.match(_QSTR, text[i:])
            if not m:
                raise ValueError(f"unterminated string literal in {text!r}")
            buf.append(text[i:i + m.end()])
            i += m.end()
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced parentheses in {text!r}")
        if ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    if depth:
        raise ValueError(f"unbalanced parentheses in {text!r}")
    parts.append("".join(buf))
    return parts


def _find_keyword(text: str, word: str, start: int = 0) -> int:
    """Index of the first occurrence of keyword ``word`` at paren depth 0
    and outside string literals, or -1."""
    pat = re.compile(rf"(?i)\b{word}\b")
    i, depth, n = start, 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            m = re.match(_QSTR, text[i:])
            if not m:
                raise ValueError(f"unterminated string literal in {text!r}")
            i += m.end()
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        if depth == 0:
            m = pat.match(text, i)
            if m:
                return i
        i += 1
    return -1


def _parse_merge(spark, stmt: str):
    """``MERGE INTO '<loc>' [AS] t USING <view> [AS] s ON t.k = s.k [AND
    ...] WHEN ...`` — maps onto :meth:`HadoopTable.merge`. The source is
    a registered temp view (register the DataFrame first); conditions
    and SET/VALUES expressions are passed through to Spark SQL, so they
    may be any expression over the two aliases."""
    m = re.match(
        rf"(?is)MERGE\s+INTO\s+{_LOC}\s+(?:AS\s+)?(?P<ta>{_IDENT})\s+"
        rf"USING\s+(?P<view>{_IDENT}(?:\.{_IDENT})*)\s+"
        rf"(?:AS\s+)?(?P<sa>{_IDENT})\s+ON\s+",
        stmt,
    )
    if not m:
        raise ValueError(
            "MERGE shape: MERGE INTO '<loc>' [AS] t USING <view> [AS] s "
            "ON t.k = s.k [AND ...] WHEN ..."
        )
    ta, sa, view = m.group("ta"), m.group("sa"), m.group("view")
    loc = m.group("loc")
    rest = stmt[m.end():]
    w = _find_keyword(rest, "WHEN")
    if w < 0:
        raise ValueError("MERGE needs at least one WHEN clause")
    on_text, clause_text = rest[:w], rest[w:]
    on: list[str] = []
    for term in re.split(r"(?i)\s+AND\s+", on_text.strip()):
        tm = re.fullmatch(
            rf"({_IDENT})\s*\.\s*({_IDENT})\s*=\s*"
            rf"({_IDENT})\s*\.\s*({_IDENT})",
            term.strip(),
        )
        ok = tm and {tm.group(1), tm.group(3)} == {ta, sa} and (
            tm.group(2) == tm.group(4)
        )
        if not ok:
            raise ValueError(
                f"unsupported ON term {term.strip()!r}; MERGE keys are "
                f"equi-join terms {ta}.col = {sa}.col on the SAME column "
                "name, joined by AND"
            )
        on.append(tm.group(2))
    when: list[tuple] = []
    # split the clause tail into WHEN ... chunks at depth 0
    bounds = []
    pos = 0
    while True:
        nxt = _find_keyword(clause_text, "WHEN", pos)
        if nxt < 0:
            break
        bounds.append(nxt)
        pos = nxt + 4
    chunks = [
        clause_text[b:e].strip()
        for b, e in zip(bounds, bounds[1:] + [len(clause_text)])
    ]
    for chunk in chunks:
        cm = re.match(
            r"(?is)WHEN\s+(?P<neg>NOT\s+)?MATCHED\s*(?P<tail>.*)", chunk
        )
        if not cm:
            raise ValueError(f"bad WHEN clause {chunk!r}")
        not_matched = bool(cm.group("neg"))
        tail = cm.group("tail").strip()
        cond = None
        am = re.match(r"(?is)AND\s+(?P<rest>.+)", tail)
        if am:
            t = _find_keyword(am.group("rest"), "THEN")
            if t < 0:
                raise ValueError(f"WHEN clause missing THEN: {chunk!r}")
            cond = am.group("rest")[:t].strip()
            tail = am.group("rest")[t:].strip()
        if not re.match(r"(?i)THEN\b", tail):
            raise ValueError(f"WHEN clause missing THEN: {chunk!r}")
        action = tail[4:].strip()
        if not_matched:
            im = re.fullmatch(r"(?is)INSERT\s+\*", action)
            if im:
                when.append(("not_matched_insert", cond, "*"))
                continue
            im = re.fullmatch(
                r"(?is)INSERT\s*\((?P<cols>[^)]*)\)\s*"
                r"VALUES\s*\((?P<vals>.*)\)",
                action,
            )
            if not im:
                raise ValueError(
                    "NOT MATCHED action is INSERT * or "
                    f"INSERT (cols) VALUES (exprs), got {action!r}"
                )
            cols = [c.strip() for c in im.group("cols").split(",")]
            vals = [v.strip() for v in _split_top_level(im.group("vals"))]
            if len(cols) != len(vals) or not all(
                re.fullmatch(_IDENT, c) for c in cols
            ) or not all(vals):
                raise ValueError(
                    f"INSERT column/value lists do not line up in {action!r}"
                )
            if len(set(cols)) != len(cols):
                raise ValueError(f"duplicate INSERT column in {action!r}")
            when.append(("not_matched_insert", cond, dict(zip(cols, vals))))
            continue
        if re.fullmatch(r"(?i)DELETE", action):
            when.append(("matched_delete", cond, None))
            continue
        um = re.match(r"(?is)UPDATE\s+SET\s+(?P<sets>.+)", action)
        if not um:
            raise ValueError(
                "MATCHED action is UPDATE SET ... or DELETE, "
                f"got {action!r}"
            )
        sets = um.group("sets").strip()
        if sets == "*":
            when.append(("matched_update", cond, "*"))
            continue
        assigns: dict[str, str] = {}
        for part in _split_top_level(sets):
            pm = re.fullmatch(
                rf"(?s)\s*({_IDENT})\s*=\s*(\S.*?)\s*", part
            )
            if not pm:
                raise ValueError(
                    f"bad SET assignment {part.strip()!r}; use "
                    "col = <expr>, joined by commas"
                )
            col = pm.group(1)
            if col in assigns:
                raise ValueError(f"duplicate SET column {col!r}")
            assigns[col] = pm.group(2)
        if not assigns:
            raise ValueError("UPDATE SET needs at least one assignment")
        when.append(("matched_update", cond, assigns))
    t = HadoopTable(spark, loc)
    return t.merge(
        spark.table(view), on, when, target_alias=ta, source_alias=sa
    )


def table_sql(spark, statement: str) -> Any:
    """Execute one statement against a path-addressed snapshot table.
    Returns whatever the underlying API returns (a Snapshot for commits,
    a list for expiry/vacuum, a dict for maintain, None for a no-op
    delete)."""
    stmt = statement.strip().rstrip(";").strip()

    m = re.fullmatch(
        rf"(?i)ALTER\s+TABLE\s+{_LOC}\s+RENAME\s+COLUMN\s+"
        rf"(?P<old>{_IDENT})\s+TO\s+(?P<new>{_IDENT})",
        stmt,
    )
    if m:
        t = HadoopTable(spark, m.group("loc"))
        return t.rename_column(m.group("old"), m.group("new"))

    m = re.fullmatch(
        rf"(?i)ALTER\s+TABLE\s+{_LOC}\s+ADD\s+COLUMN\s+"
        rf"(?P<col>{_IDENT})\s+{_TYPE}"
        rf"(?:\s+DEFAULT\s+(?P<default>\S.*))?",
        stmt,
    )
    if m:
        t = HadoopTable(spark, m.group("loc"))
        default = (
            _literal(m.group("default"))
            if m.group("default") is not None
            else None
        )
        return t.add_column(m.group("col"), m.group("type"), default=default)

    m = re.fullmatch(
        rf"(?i)ALTER\s+TABLE\s+{_LOC}\s+DROP\s+COLUMN\s+(?P<col>{_IDENT})",
        stmt,
    )
    if m:
        return HadoopTable(spark, m.group("loc")).drop_column(m.group("col"))

    m = re.fullmatch(
        rf"(?i)ALTER\s+TABLE\s+{_LOC}\s+ALTER\s+COLUMN\s+"
        rf"(?P<col>{_IDENT})\s+TYPE\s+{_TYPE}",
        stmt,
    )
    if m:
        t = HadoopTable(spark, m.group("loc"))
        return t.widen_column(m.group("col"), m.group("type"))

    m = re.fullmatch(
        rf"(?i)ALTER\s+TABLE\s+{_LOC}\s+SET\s+TBLPROPERTIES\s*"
        rf"\((?P<pairs>.+)\)",
        stmt,
    )
    if m:
        t = HadoopTable(spark, m.group("loc"))
        return t.set_properties(_parse_prop_pairs(m.group("pairs")))

    m = re.fullmatch(
        rf"(?i)ALTER\s+TABLE\s+{_LOC}\s+UNSET\s+TBLPROPERTIES\s*"
        rf"\((?P<keys>.+)\)",
        stmt,
    )
    if m:
        if not re.fullmatch(
            rf"\s*{_QSTR}\s*(?:,\s*{_QSTR}\s*)*", m.group("keys")
        ):
            raise ValueError("UNSET TBLPROPERTIES needs ('key', ...) keys")
        keys = [
            k.replace("''", "'")
            for k in re.findall(r"'((?:[^']|'')*)'", m.group("keys"))
        ]
        return HadoopTable(spark, m.group("loc")).unset_properties(*keys)

    m = re.fullmatch(
        rf"(?i)ALTER\s+TABLE\s+{_LOC}\s+CREATE\s+"
        rf"(?P<kind>BRANCH|TAG)\s+(?P<name>{_IDENT})"
        rf"(?:\s+AS\s+OF\s+VERSION\s+(?P<v>\d+))?",
        stmt,
    )
    if m:
        t = HadoopTable(spark, m.group("loc"))
        if m.group("kind").upper() == "TAG":
            v = int(m.group("v")) if m.group("v") else None
            t.create_tag(m.group("name"), version=v)
            return None
        if m.group("v"):
            raise ValueError(
                "CREATE BRANCH forks the CURRENT snapshot (no AS OF "
                "VERSION); rollback first to branch from history"
            )
        t.create_branch(m.group("name"))
        return None

    m = re.fullmatch(
        rf"(?i)ALTER\s+TABLE\s+{_LOC}\s+DROP\s+"
        rf"(?P<kind>BRANCH|TAG)\s+(?P<name>{_IDENT})",
        stmt,
    )
    if m:
        t = HadoopTable(spark, m.group("loc"))
        if m.group("kind").upper() == "TAG":
            t.drop_tag(m.group("name"))
        else:
            t.drop_branch(m.group("name"))
        return None

    m = re.fullmatch(
        rf"(?i)DELETE\s+FROM\s+{_LOC}\s+WHERE\s+(?P<pred>.+)", stmt
    )
    if m:
        t = HadoopTable(spark, m.group("loc"))
        return t.delete(_parse_predicate(m.group("pred")))

    m = re.fullmatch(
        rf"(?i)UPDATE\s+{_LOC}\s+SET\s+(?P<rest>.+)", stmt, re.S
    )
    if m:
        sets, pred = _split_where(m.group("rest"))
        t = HadoopTable(spark, m.group("loc"))
        return t.update(_parse_predicate(pred), _parse_assignments(sets))

    if re.match(r"(?i)MERGE\s+INTO\b", stmt):
        return _parse_merge(spark, stmt)

    m = re.fullmatch(
        rf"(?i)CALL\s+(?:system\s*\.\s*)?(?P<proc>{_IDENT})\s*"
        rf"\(\s*{_LOC}\s*(?P<args>(?:,[^)]*)?)\)",
        stmt,
    )
    if m:
        t = HadoopTable(spark, m.group("loc"))
        kwargs: dict[str, Any] = {}
        for part in m.group("args").split(","):
            part = part.strip()
            if not part:
                continue
            am = re.fullmatch(rf"({_IDENT})\s*=>\s*(\S.*)", part)
            if not am:
                raise ValueError(
                    f"CALL arguments use name => value, got {part!r}"
                )
            kwargs[am.group(1)] = _literal(am.group(2))
        proc = m.group("proc").lower()
        procs = {
            # the Iceberg procedure names AND the shim's own
            "rewrite_data_files": t.compact,
            "rewrite_manifests": t.rewrite_manifests,
            "rewrite_position_delete_files": t.rewrite_delete_files,
            "rewrite_delete_files": t.rewrite_delete_files,
            "fast_forward": t.fast_forward,
            "add_files": t.add_files,
            "compact": t.compact,
            "expire_snapshots": t.expire_snapshots,
            "remove_orphan_files": t.cleanup_orphans,
            "maintain": t.maintain,
            "rollback_to_snapshot": None,  # special-cased below
        }
        if proc == "rollback_to_snapshot":
            if "version" not in kwargs:
                raise ValueError(
                    "rollback_to_snapshot needs version => <N>"
                )
            version = int(kwargs.pop("version"))
            if kwargs:
                raise ValueError(
                    f"rollback_to_snapshot got unknown arguments "
                    f"{sorted(kwargs)}"
                )
            return t.rollback(version)
        if proc not in procs:
            raise ValueError(
                f"unknown procedure {proc!r}; one of "
                f"{sorted(k for k in procs)}"
            )
        return procs[proc](**kwargs)

    m = re.fullmatch(rf"(?i)VACUUM\s+{_LOC}", stmt)
    if m:
        return HadoopTable(spark, m.group("loc")).cleanup_orphans()

    raise ValueError(
        "unsupported statement; supported: ALTER TABLE '<loc>' "
        "RENAME COLUMN a TO b | ADD COLUMN x <type> [DEFAULT lit] | "
        "DROP COLUMN x | ALTER COLUMN x TYPE <type> | SET/UNSET "
        "TBLPROPERTIES (...) | CREATE/DROP BRANCH b | CREATE TAG tg "
        "[AS OF VERSION n] | DROP TAG tg; DELETE FROM '<loc>' WHERE ...; "
        "UPDATE '<loc>' SET col = lit [, ...] WHERE ...; "
        "MERGE INTO '<loc>' t USING <view> s ON t.k = s.k WHEN ...; "
        "CALL <proc>('<loc>' [, name => value ...]); VACUUM '<loc>'"
    )
