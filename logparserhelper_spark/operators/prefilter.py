"""JVM-side parse prefilter: a Java-regex SUPERSET of the bank's patterns.

The fused parse/normalize stage pays one Arrow crossing + Python ``re``
work per turn even when the turn matches nothing — and on miss-heavy
corpora (4 of the 6 reference corpora are all-miss) that is most turns.
A JVM ``rlike`` column that is a provable SUPERSET of "some enabled
pattern or transform matches somewhere" lets the pipeline route
definitely-miss turns around the Python stage entirely (norm_text = text,
spans = []), keeping Python ``re`` — the reference dialect — authoritative
for every turn that might match.

Soundness contract: the translation must never produce false NEGATIVES
(a turn Python would match that the Java regex rejects); false POSITIVES
only cost a wasted Python visit. That direction is guaranteed by
construction: the pattern is rebuilt from Python's own ``re._parser`` AST
through a WHITELIST of nodes whose Java rendering is match-equivalent or
strictly broader, and ``java_superset_regex`` returns ``None`` (caller
disables the prefilter) the moment any pattern uses a construct outside
the whitelist — lookarounds, backrefs, conditionals, inline flags,
negated word/space classes (the negation of a superset is not a
superset), etc. Dialect margins are widened, not assumed equal:

- ``.`` gains ``(?s)`` (Python's no-DOTALL dot is narrower),
- ``\\w`` -> ``[\\w\\p{L}\\p{M}\\p{N}\\p{Pc}]`` (covers Python's unicode
  word definition — str.isalnum + underscore, which includes No/Nl
  numerics like SUPERSCRIPT TWO that Java's (?U)\\w excludes),
- ``\\s`` -> ``[\\s\\u001c-\\u001f\\u0085\\p{Z}]`` (Python \\s includes
  the FS..US separators and NEL which are not Unicode whitespace),
- ``\\d`` -> ``\\p{Nd}`` (exactly Python's unicode \\d),
- ``$`` -> ``\\z|(?=\\n\\z)`` handled via ``\\Z``-equivalent rendering.

Verified empirically by tests/test_prefilter.py: across every reference
corpus, the generated transcript corpora, and hypothesis-mutated text,
``compiled_bank.extract(t) or any transform fires`` implies the Java
superset matches (driven through a real Spark ``rlike``).
"""

from __future__ import annotations

import re as _re

try:  # CPython 3.11+: the parser module moved under re
    from re import _parser as sre_parse
except ImportError:  # pragma: no cover - older layout
    import sre_parse  # type: ignore


_JAVA_META = set("\\[](){}.*+?^$|")

# category -> (positive-position Java rendering). Only categories whose
# rendering is equal-or-broader than Python's are listed; anything else
# (NOT_WORD, NOT_SPACE, ...) falls outside the whitelist.
_CATEGORY_POS = {
    "category_digit": r"\p{Nd}",
    "category_not_digit": r"\P{Nd}",  # exact complement of an exact class
    "category_word": r"[\w\p{L}\p{M}\p{N}\p{Pc}]",
    "category_space": "[\\s\\u001c-\\u001f\\u0085\\p{Z}]",
}
# inside a character class the same categories render without brackets
_CATEGORY_IN = {
    "category_digit": r"\p{Nd}",
    "category_not_digit": r"\P{Nd}",
    "category_word": r"\w\p{L}\p{M}\p{N}\p{Pc}",
    "category_space": "\\s\\u001c-\\u001f\\u0085\\p{Z}",
}
# members that render EXACTLY (legal inside a negated class — a widened
# member there would NARROW the complement and break the superset)
_CATEGORY_EXACT = {"category_digit", "category_not_digit"}


class _Unsupported(Exception):
    pass


def _is_single_atom(body: str) -> bool:
    """True when ``body`` is one quantifiable Java regex atom: a single
    (possibly escaped) character, one character class, or one \\p/\\P
    property — so a quantifier binds to all of it without a group."""
    if len(body) == 1:
        return True
    if len(body) == 2 and body[0] == "\\":
        return True
    if body.startswith("\\u") and len(body) == 6:
        return True
    if (body.startswith("\\p{") or body.startswith("\\P{")) and body.endswith("}"):
        return "}" not in body[:-1]
    if body.startswith("[") and body.endswith("]"):
        # one class iff the closing bracket is the first unescaped one
        i = 1
        while i < len(body) - 1:
            if body[i] == "\\":
                i += 2
                continue
            if body[i] == "]":
                return False  # closes early -> body is more than one class
            i += 1
        return True
    return False


def _lit(ch: int, in_class: bool = False) -> str:
    c = chr(ch)
    if in_class:
        if c in "\\]^-[&":  # & for Java's class intersection operator
            return "\\" + c
    elif c in _JAVA_META:
        return "\\" + c
    if c in ("\n", "\r", "\t"):
        return {"\n": "\\n", "\r": "\\r", "\t": "\\t"}[c]
    if ord(c) < 0x20 or 0x7F <= ord(c) <= 0xA0:
        return "\\u%04x" % ord(c)
    return c


def _emit(nodes) -> str:
    out: list[str] = []
    for op, av in nodes:
        name = str(op).lower()
        if name == "literal":
            out.append(_lit(av))
        elif name == "not_literal":
            out.append("[^" + _lit(av, in_class=True) + "]")
        elif name == "any":
            out.append(".")  # (?s) is set globally -> superset of Python's .
        elif name == "in":
            out.append(_emit_class(av))
        elif name == "category":
            cat = str(av).lower()
            if cat not in _CATEGORY_POS:
                raise _Unsupported(cat)
            out.append(_CATEGORY_POS[cat])
        elif name in ("max_repeat", "min_repeat"):
            lo, hi, item = av
            body = _emit(item)
            if not _is_single_atom(body):
                # a bare multi-token body under a quantifier would rebind;
                # but wrapping SINGLE atoms (classes/escapes) costs real
                # time in Java — `(?:[\p{Nd}]){4}` defeats the engine's
                # class-repetition fast path that `[\p{Nd}]{4}` gets
                body = "(?:" + body + ")"
            if hi == sre_parse.MAXREPEAT:
                q = "*" if lo == 0 else ("+" if lo == 1 else "{%d,}" % lo)
            elif lo == hi:
                q = "{%d}" % lo
            elif (lo, hi) == (0, 1):
                q = "?"
            else:
                q = "{%d,%d}" % (lo, hi)
            if name == "min_repeat":
                q += "?"  # laziness never changes MATCHABILITY, only spans
            out.append(body + q)
        elif name == "subpattern":
            _group, add_flags, del_flags, items = av
            if add_flags or del_flags:
                raise _Unsupported("inline flags")
            out.append("(?:" + _emit(items) + ")")
        elif name == "branch":
            _unused, branches = av
            out.append("(?:" + "|".join(_emit(b) for b in branches) + ")")
        elif name == "at":
            a = str(av).lower()
            if a in ("at_beginning", "at_beginning_string"):
                out.append(r"\A")  # Python's ^ (no MULTILINE) / \A
            elif a == "at_end":
                out.append(r"\Z")  # Java \Z: end or before final terminator
                # (superset of Python $ = end or before trailing \n)
            elif a == "at_end_string":
                out.append(r"\z")  # Python \Z = absolute end = Java \z
            elif a == "at_boundary":
                # \b depends on the word-char set; Java's (?U) word set is
                # not provably a superset/subset of Python's, and either
                # direction can flip a boundary -> outside the whitelist
                raise _Unsupported("word boundary")
            else:
                raise _Unsupported(a)
        else:
            # GROUPREF, ASSERT (lookaround), ASSERT_NOT, ATOMIC_GROUP,
            # POSSESSIVE_*, FAILURE, ... -> not provably superset-safe
            raise _Unsupported(name)
    return "".join(out)


def _emit_class(members) -> str:
    # a NEGATED class complements its members: that is only superset-safe
    # when every member renders EXACTLY (literals, ranges, \d); a widened
    # member would NARROW the complement
    negate = bool(members) and str(members[0][0]).lower() == "negate"
    body: list[str] = []
    for op, av in members[1:] if negate else members:
        name = str(op).lower()
        if name == "literal":
            body.append(_lit(av, in_class=True))
        elif name == "range":
            lo, hi = av
            body.append(_lit(lo, in_class=True) + "-" + _lit(hi, in_class=True))
        elif name == "category":
            cat = str(av).lower()
            if negate and cat not in _CATEGORY_EXACT:
                raise _Unsupported(f"negated class with widened {cat}")
            if cat not in _CATEGORY_IN:
                raise _Unsupported(cat)
            body.append(_CATEGORY_IN[cat])
        else:
            raise _Unsupported(f"class member {name}")
    return "[" + ("^" if negate else "") + "".join(body) + "]"


def java_superset_pattern(py_pattern: str) -> str | None:
    """One Python pattern -> a Java pattern matching a SUPERSET of the
    same strings (find-anywhere semantics), or None if any construct is
    outside the provably-safe whitelist."""
    try:
        tree = sre_parse.parse(py_pattern)
    except _re.error:
        return None  # uncompilable patterns never match anything in Python
    # GLOBAL inline flags ((?i)/(?m)/(?s)) land on the parse state, not as
    # tree nodes — dropping them silently would under-match. ASCII (re.A)
    # only NARROWS Python's classes below our widened renderings, so it
    # stays superset-safe; VERBOSE is consumed by the parse itself.
    flags = getattr(tree, "state", tree).flags
    if flags & (_re.I | _re.M | _re.S):
        return None
    try:
        return _emit(tree)
    except _Unsupported:
        return None


def java_superset_regex(patterns) -> str | None:
    """Java regex matching a superset of "ANY of these Python patterns
    finds a match". None when any single pattern refuses translation —
    the caller must then disable the prefilter (correctness first)."""
    parts = []
    for p in patterns:
        jp = java_superset_pattern(p)
        if jp is None:
            return None
        if jp == "":
            # an empty rendering means the pattern matches the empty string
            # at EVERY position — Python fires it on every turn, so no
            # filter can reject anything: disable rather than silently
            # drop it from the alternation (which would under-match)
            return None
        parts.append(jp)
    if not parts:
        return None
    # (?s): dot covers \n (superset of Python's default dot);
    # (?U): \w/\s/\b word semantics go unicode like Python's str patterns
    return "(?s)(?U)(?:" + "|".join(parts) + ")"


def bank_prefilter_regex(bank, tbank=None) -> str | None:
    """Superset regex for a pattern bank (+ optional transform bank):
    matches every turn where any ENABLED pattern extracts a span or any
    enabled transform would rewrite. A turn rejected by this regex is
    provably untouched by the Python stage (norm_text == text, no spans)."""
    pats = [p for (_id, _name, p, _sink) in bank.spec()]
    if tbank is not None:
        pats += [p for (p, _repl) in tbank.spec()]
    return java_superset_regex(pats)
