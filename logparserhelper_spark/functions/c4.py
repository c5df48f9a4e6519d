"""C4 cleaning rules (Raffel et al., 2020 — the filters that built the
Colossal Clean Crawled Corpus).

Two layers, following the paper's split of line-level vs page-level
rules:

- line level: keep only lines that end in terminal punctuation
  (. ! ? "), have at least ``min_line_words`` words, AND do not mention
  "javascript" (the paper removes javascript-warning LINES, not pages);
  the surviving lines are rejoined as the cleaned text. Lines are
  whitespace-trimmed with a regex (not F.trim, which strips spaces
  only) so CRLF corpora don't smuggle '\\r' into the terminal-punct
  test — where Java's ``$`` and the oracle's RE2 ``$`` would disagree.
- page level, evaluated on the ORIGINAL text: drop documents that
  mention "lorem ipsum" or contain a curly bracket (either brace —
  code), and require at least ``min_sentences`` terminal-punctuation
  sentences among the kept lines.

Same zero-stage shape as the Gopher filter: one per-row projection of
higher-order array functions over a line split — no UDF, no shuffle, it
rides whatever scan feeds it at any corpus size. Each signal is its own
column so curation can re-threshold without recompute.

No reference-parity citation: the reference tool (see SURVEY §1) has no
quality filtering; this extends the SURVEY §2 text-analysis family
alongside functions/gopher.py (Gopher rules) and textstats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# terminal punctuation per the C4 paper: period, exclamation, question
# mark, closing quote
_TERMINAL = r'[.!?"]$'


def c4_rules(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Append C4 statistics + rule booleans + the cleaned text.

    Output columns: c4_text (terminal-punctuated lines of >=
    min_line_words words without a javascript mention, rejoined),
    kept_lines, total_lines, js_lines (lines dropped by the
    javascript rule), n_sentences (terminal-punctuation count within
    kept lines), r_no_lorem, r_no_brace, r_min_sentences, c4_pass.
    """
    c = F.col(text_col)
    lines = F.split(c, "\n")
    # regex trim, NOT F.trim (spaces only): a CRLF corpus would leave
    # '\r' on every line, where Java's $ matches before a final line
    # terminator but RE2/DuckDB's does not — engine-divergent keeps
    trimmed = F.transform(
        lines, lambda l: F.regexp_replace(l, r"^\s+|\s+$", "")
    )
    is_js = lambda l: F.lower(l).contains("javascript")  # noqa: E731
    kept = F.filter(
        trimmed,
        lambda l: l.rlike(_TERMINAL)
        & (
            F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
            >= min_line_words
        )
        & ~is_js(l),
    )
    c4_text = F.array_join(kept, "\n")
    n_sentences = F.aggregate(
        kept,
        F.lit(0),
        lambda acc, l: acc + F.regexp_count(l, F.lit(r'[.!?"]')),
    )
    low = F.lower(c)
    r_no_lorem = ~low.contains("lorem ipsum")
    r_no_brace = ~(c.contains("{") | c.contains("}"))
    r_min_sentences = n_sentences >= min_sentences
    c4_pass = r_no_lorem & r_no_brace & r_min_sentences
    return df.select(
        "*",
        c4_text.alias("c4_text"),
        F.size(kept).cast("int").alias("kept_lines"),
        F.size(lines).cast("int").alias("total_lines"),
        F.size(F.filter(trimmed, is_js)).cast("int").alias("js_lines"),
        n_sentences.cast("int").alias("n_sentences"),
        r_no_lorem.alias("r_no_lorem"),
        r_no_brace.alias("r_no_brace"),
        r_min_sentences.alias("r_min_sentences"),
        c4_pass.alias("c4_pass"),
    )
