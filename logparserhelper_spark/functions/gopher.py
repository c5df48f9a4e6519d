"""Gopher quality-rule document filter (Rae et al., 2021, Appendix A).

The published rule set used to clean MassiveWeb: documents pass when they
look like prose — enough words, word lengths in a natural band, not
symbol-soup, mostly alphabetic words, at least a couple of common English
stop words, and not bullet/ellipsis boilerplate. Each rule is exposed as
its own boolean plus the underlying statistic, so downstream curation can
re-threshold without recomputing.

Everything is JVM built-ins over one word-split (no UDF, no shuffle — a
pure per-row projection that pipelines into whatever scan feeds it, so at
100 TB it rides the scan and adds zero stages). Ratios divide exact
integer counts, then round to 4 decimals; the DuckDB oracle reproduces
them bit-for-bit.

No reference-parity citation: the reference tool (see SURVEY §1) has no
quality filtering; this extends the SURVEY §2 text-analysis family
alongside functions/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The stop-word presence list from Gopher Appendix A ("contains at least 2
# of the following English words").
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

_BULLETS = ("- ", "* ", "•")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
) -> DataFrame:
    """Append Gopher rule statistics + booleans + the composite verdict.

    Output columns: word_count, mean_word_len, symbol_ratio,
    alpha_word_frac, stop_hits, bullet_line_frac, ellipsis_line_frac,
    r_word_count, r_mean_word_len, r_symbol, r_alpha, r_stops, r_bullets,
    r_ellipsis, gopher_pass.
    """
    c = F.col(text_col)
    # filter empties instead of trimming: F.trim strips spaces only, so a
    # tab/newline-edged document would otherwise count phantom ''-tokens
    # (inflating word_count and deflating every per-word ratio near its
    # rule threshold); filtering handles blank docs for free (0 words)
    words = F.filter(F.split(F.lower(c), r"\s+"), lambda w: w != "")
    word_count = F.size(words).cast("int")
    total_word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.round(
        F.when(word_count > 0, total_word_chars / word_count).otherwise(0.0), 4
    )
    # hash-or-ellipsis occurrences per word (Gopher's "symbol-to-word ratio")
    symbols = F.regexp_count(c, F.lit(r"#|\.\.\."))
    symbol_ratio = F.round(
        F.when(word_count > 0, symbols / word_count).otherwise(0.0), 4
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    alpha_word_frac = F.round(
        F.when(word_count > 0, alpha_words / word_count).otherwise(0.0), 4
    )
    # distinct stop words present (array_intersect de-dups)
    stop_hits = F.size(
        F.array_intersect(words, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    ).cast("int")
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: (
                F.ltrim(l).startswith(_BULLETS[0])
                | F.ltrim(l).startswith(_BULLETS[1])
                | F.ltrim(l).startswith(_BULLETS[2])
            ),
        )
    )
    ellipsis = F.size(F.filter(lines, lambda l: F.rtrim(l).endswith("...")))
    bullet_line_frac = F.round(bullet / n_lines, 4)
    ellipsis_line_frac = F.round(ellipsis / n_lines, 4)

    r_word_count = (word_count >= min_words) & (word_count <= max_words)
    r_mean_word_len = (mean_word_len >= min_mean_word_len) & (
        mean_word_len <= max_mean_word_len
    )
    r_symbol = symbol_ratio <= max_symbol_ratio
    r_alpha = alpha_word_frac >= min_alpha_word_frac
    r_stops = stop_hits >= min_stop_hits
    r_bullets = bullet_line_frac <= max_bullet_line_frac
    r_ellipsis = ellipsis_line_frac <= max_ellipsis_line_frac
    gopher_pass = (
        r_word_count & r_mean_word_len & r_symbol & r_alpha & r_stops
        & r_bullets & r_ellipsis
    )
    return df.select(
        "*",
        word_count.alias("word_count"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_word_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        bullet_line_frac.alias("bullet_line_frac"),
        ellipsis_line_frac.alias("ellipsis_line_frac"),
        r_word_count.alias("r_word_count"),
        r_mean_word_len.alias("r_mean_word_len"),
        r_symbol.alias("r_symbol"),
        r_alpha.alias("r_alpha"),
        r_stops.alias("r_stops"),
        r_bullets.alias("r_bullets"),
        r_ellipsis.alias("r_ellipsis"),
        gopher_pass.alias("gopher_pass"),
    )
