"""JVM parse-prefilter (operators/prefilter.py): translation whitelist,
the no-false-negatives superset property driven through real Spark
``rlike``, and bit-equality of the prefiltered pipeline path."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from logparserhelper_spark.defaults import default_pattern_bank, default_transform_bank
from logparserhelper_spark.operators.prefilter import (
    bank_prefilter_regex,
    java_superset_pattern,
    java_superset_regex,
)

REFERENCE_LOGS = "/root/reference/data/sample_logs"


def test_unsupported_constructs_refuse_translation():
    """Anything not provably superset-safe must return None — the caller
    then runs without a prefilter rather than risk a false negative."""
    bad = [
        r"(?=foo)bar",        # lookahead
        r"(?<=a)b",           # lookbehind
        r"(?!x)y",            # negative lookahead
        r"(a)\1",             # backreference
        r"a\b",               # word boundary (word sets differ)
        r"(?i)abc",           # inline flags
        r"[^\w]",             # negated class with a widened member
        r"\S+",               # negation of a widened category
        r"x\Bq",              # non-boundary
    ]
    for p in bad:
        assert java_superset_pattern(p) is None, p
    # one bad pattern poisons the whole bank translation
    assert java_superset_regex([r"\d+", r"(?=x)"]) is None
    # uncompilable python patterns also refuse (they match nothing anyway)
    assert java_superset_pattern(r"(unclosed") is None
    # an empty-matchable pattern fires on EVERY turn in Python, so no
    # filter can reject anything: the bank translation must disable, not
    # silently drop it from the alternation
    assert java_superset_regex([r"\d+", r""]) is None
    assert java_superset_regex([r"\d+", r"a*"]) is not None  # a* is fine: renders non-empty


def test_supported_constructs_translate():
    ok = [
        r"\d{4}-\d{2}",
        r"[A-Za-z_]{3,}",
        r"foo|bar+|ba?z",
        r"a.c",
        r"^start",
        r"end$",
        r"\Aabs\Z",
        r"(?:grp)+",
        r"(?P<named>\d+)",
        r"x{2,5}?",
        r"[^;]*",
        r"\w+\s\w+",
        r"\D\d",
    ]
    for p in ok:
        assert java_superset_pattern(p) is not None, p


def _py_finds(pattern: str, texts: list[str]) -> list[bool]:
    import re

    rx = re.compile(pattern)
    return [rx.search(t) is not None for t in texts]


def _java_finds(spark, java_regex: str, texts: list[str]) -> list[bool]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r.i: r.m
        for r in df.select("i", F.col("t").rlike(java_regex).alias("m")).collect()
    }
    return [bool(got[i]) for i in range(len(texts))]


def test_superset_property_adversarial_and_random(spark):
    """For every translatable pattern: wherever Python ``re`` finds a
    match, the Java rendering must match (run through a REAL rlike).
    Texts: hand-picked dialect edges + seeded random strings over an
    alphabet rich in meta characters, digits (incl. unicode digits),
    whitespace variants, and newlines."""
    patterns = [
        r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}",
        r"\w{3}, \d{1,2}",
        r"[A-Z][a-z]{2}  \d{1,2}",
        r"a.c",
        r"^x\d+$",
        r"foo|ba[rz]|q{2,3}",
        r"[^;]+;",
        r"\s\w\s",
        r"x.*?y",
        r"\D\d\D",
    ]
    edge_texts = [
        "",
        "\n",
        "a\nc",               # Python . misses \n; (?s) Java dot covers it
        "x12\n",              # $ before trailing newline
        "x12",
        "aéc",           # unicode word char
        "١٢٣٤-١٢",  # ARABIC-INDIC digits: Python \d matches
        "tab\tsep",
        "nelsep",       # NEL: Python \s matches, not unicode Z
        "fssep",        # FILE SEPARATOR: Python \s matches
        "Mon, 3 Jan",
        "²½① 12",       # category-No numerics: Python \w matches them,
        "①①①, 45",     # Java (?U)\w does NOT — \p{N} in the rendering must
        "q" * 5,
        ";;;",
        "x" + "z" * 50 + "y",
    ]
    rng = random.Random(42)
    alphabet = "ab01 \t\n.;:-/[]()ée١ XZ"
    rand_texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(300)
    ]
    texts = edge_texts + rand_texts
    for p in patterns:
        jp = java_superset_regex([p])
        assert jp is not None, p
        py = _py_finds(p, texts)
        jv = _java_finds(spark, jp, texts)
        for t, a, b in zip(texts, py, jv):
            # superset: python-match implies java-match
            assert (not a) or b, (p, repr(t))


def test_bank_prefilter_covers_all_reference_corpora(spark):
    """Over every reference corpus line: whenever the compiled bank
    extracts any span OR any transform rewrites, the bank prefilter regex
    matches. Also sanity: the prefilter is selective on the all-miss
    corpora (it would be useless if it matched everything)."""
    from logparserhelper_spark.banks import get_compiled_bank, get_compiled_transforms

    if not os.path.isdir(REFERENCE_LOGS):
        pytest.skip("reference corpora not present")
    bank, tbank = default_pattern_bank(), default_transform_bank()
    pre = bank_prefilter_regex(bank, tbank)
    assert pre is not None
    cb = get_compiled_bank(bank.spec())
    ct = get_compiled_transforms(tbank.spec())
    lines: list[str] = []
    for fn in sorted(os.listdir(REFERENCE_LOGS)):
        with open(os.path.join(REFERENCE_LOGS, fn), encoding="utf-8", errors="replace") as f:
            lines.extend(f.read().splitlines())
    py_fires = []
    for t in lines:
        fired = bool(cb.extract(t))
        if not fired:
            for rx, repl in ct.steps:
                if rx is not None and rx.search(t):
                    fired = True
                    break
        py_fires.append(fired)
    jv = _java_finds(spark, pre, lines)
    false_neg = [
        lines[i] for i in range(len(lines)) if py_fires[i] and not jv[i]
    ]
    assert false_neg == [], false_neg[:5]
    # selectivity: substantially fewer rlike hits than lines overall
    assert sum(jv) < 0.8 * len(lines)


def test_pipeline_prefilter_output_bit_equal(spark, tmp_path):
    """The prefiltered parse stage must be BIT-EQUAL to the plain fused
    path on a corpus mixing hits, misses, and null texts — same turns,
    same norm_text, same spans, same routed rows."""
    from logparserhelper_spark.datagen import generate_transcripts
    from logparserhelper_spark.pipeline import PipelineConfig, run_pipeline

    tiny = generate_transcripts(str(tmp_path / "data"), "tiny")
    outs = {}
    for name, flag in (("plain", False), ("pre", True)):
        out = str(tmp_path / name)
        run_pipeline(
            spark,
            PipelineConfig(
                input_path=tiny,
                out_dir=out,
                transform_bank=default_transform_bank(),
                role_dim_path=os.path.join(tiny, "role_dim.parquet"),
                tool_dim_path=os.path.join(tiny, "tool_dim.parquet"),
                n_buckets=2,
                parse_prefilter=flag,
            ),
        )
        outs[name] = out

    def turn_set(out):
        df = spark.read.parquet(os.path.join(out, "turns"))
        return {
            (r.conv_id, r.turn_idx, r.text, r.norm_text, tuple(map(tuple, r.spans)))
            for r in df.select("conv_id", "turn_idx", "text", "norm_text", "spans").collect()
        }

    assert turn_set(outs["plain"]) == turn_set(outs["pre"])
    freq = {}
    for name, out in outs.items():
        freq[name] = {
            (r.sink, r.pattern_id, r.pattern_name, r.n_matches, r.n_turns)
            for r in spark.read.parquet(
                os.path.join(out, "aggregates", "sink_pattern_freq")
            ).collect()
        }
    assert freq["plain"] == freq["pre"]