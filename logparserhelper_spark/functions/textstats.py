"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

Everything except the fingerprint stays in built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd) — at 100 TB these run at scan speed with
no Python worker involved. The quality/token expressions are deliberately
defined so an ANSI-SQL oracle (DuckDB) computes identical values.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic tiny stopword lists (ASCII) used by both quality scoring and
# the n-gram-free language-ID heuristic. Keep sorted + frozen: the DuckDB
# oracle SQL embeds the same lists.
STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf")
STOPWORDS_FR = ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que")
PUNCT_CLASS = r"[.,!?;:]"


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text -> 0.
    Oracle-equivalent SQL: len(regexp_split_to_array(trim(text), '\\s+'))
    with a CASE for blank."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


# GPT2-style pretokenizer shape restricted to the Python-re ∩ RE2 dialect
# (no \p{L} in Python re): word runs, digit runs, punct runs, each with an
# optional leading space, plus whitespace runs.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_ish_token_count(col: Column) -> Column:
    """Token count under the BPE-ish pretokenizer regex — JVM-side via
    regexp_count (the pattern is dialect-safe; equivalence to Python re is
    pinned by the DuckDB oracle and tests)."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def _words(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def stopword_count(col: Column, stopwords: tuple[str, ...]) -> Column:
    words = _words(col)
    return F.size(F.filter(words, lambda w: w.isin(*stopwords)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score.

    score = 0.4*min(n_tokens/100, 1) + 0.4*stopword_ratio_capped
            + 0.2*(1 - punct_ratio), rounded to 4 decimals.
    All components are exact integer ratios -> double, so the DuckDB oracle
    reproduces values bit-for-bit.

    The counts are STAGED through an intermediate projection and the score
    is built from the aliased columns, not from copies of the expression
    trees: inlining n_tokens/n_stop/n_punct into the score formula (the
    previous shape) re-evaluated the full split/filter/regexp_replace per
    reference — ~9 regex passes over the text per row where 4 suffice.
    CollapseProject keeps the stages separate because the aliases are
    multiply-referenced and non-cheap, so each count is computed once per
    row (verified in the physical plan: one split per distinct source
    expression)."""
    c = F.col(text_col)
    staged = df.select(
        "*",
        F.length(c).alias("_qs_chars"),
        token_count(c).alias("_qs_tokens"),
        (F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))).alias(
            "_qs_punct"
        ),
        stopword_count(c, STOPWORDS_EN).alias("_qs_stop"),
    )
    n_chars = F.col("_qs_chars")
    n_tokens = F.col("_qs_tokens")
    n_punct = F.col("_qs_punct")
    n_stop = F.col("_qs_stop")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.4 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.2 * (1 - punct_ratio)
    )
    return staged.select(
        *df.columns,
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        n_punct.alias("q_punct"),
        n_stop.alias("q_stopwords"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID over {en, de, fr}, 'und' (undetermined) when
    no list scores >0. Pure built-ins (no UDF): three filtered-array sizes
    and an argmax. Ties break en > de > fr (fixed order).

    Staged like quality_score: the words array is split ONCE and the three
    hit counts are aliased before the argmax references them — the previous
    single-select shape re-evaluated split+filter per reference inside the
    CASE (~11 splits of the text per row; now 1 split + 3 filters)."""
    with_words = df.select("*", _words(F.col(text_col)).alias("_li_ws"))
    ws = F.col("_li_ws")
    staged = with_words.select(
        "*",
        F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS_EN))).alias("_li_en"),
        F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS_DE))).alias("_li_de"),
        F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS_FR))).alias("_li_fr"),
    )
    en, de, fr = F.col("_li_en"), F.col("_li_de"), F.col("_li_fr")
    lang = (
        F.when((en >= de) & (en >= fr) & (en > 0), "en")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("und")
    )
    return staged.select(*df.columns, en.alias("hits_en"), de.alias("hits_de"),
                         fr.alias("hits_fr"), lang.alias("lang_pred"))


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: fraction of word
    occurrences belonging to repeated words, and the share of the most
    frequent word bigram (bigrams counted with multiplicity, not distinct —
    repetition is the signal here, unlike shingling).

    Pure built-ins + two hash aggregations; no UDF. Output: (id_col, n_words,
    dup_words, dup_word_frac, top_bigram_n, n_bigrams, top_bigram_frac) —
    frac columns null when the denominator is empty. Empty/whitespace-only
    documents have no words and are excluded (split('') would otherwise
    count one phantom '' word, making an empty doc look like a 1-word doc)."""
    from logparserhelper_spark.functions.dedup import normalize_text_col

    base = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("_id"),
        F.split(normalize_text_col(F.col(text_col)), " ").alias("_ws"),
    )
    wc = (
        base.select("_id", F.explode("_ws").alias("word"))
        .groupBy("_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    word_stats = wc.groupBy("_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("dup_words"),
    )
    ws = F.col("_ws")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i.cast("int")), F.element_at(ws, (i + 1).cast("int"))
        ),
    )
    bc = (
        base.filter(F.size(ws) >= 2)
        .select("_id", F.explode(bigrams).alias("bg"))
        .groupBy("_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg_stats = bc.groupBy("_id").agg(
        F.max("c").cast("long").alias("top_bigram_n"),
        F.sum("c").cast("long").alias("n_bigrams"),
    )
    return (
        word_stats.join(bg_stats, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_words",
            "dup_words",
            F.round(F.col("dup_words") / F.col("n_words"), 6).alias("dup_word_frac"),
            "top_bigram_n",
            "n_bigrams",
            F.round(F.col("top_bigram_n") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
        )
    )


def char_bigram_logprob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """CCNet-style LM quality proxy: average log-probability of each
    document under a character-bigram model trained on the corpus itself
    (no external model needed; outlier/garbage text scores low). Two passes,
    both built-ins:

    1. model: corpus-wide bigram counts (one aggregation; prefix counts are
       DERIVED from the tiny bigram model, not a second corpus pass),
       joined back (Catalyst broadcasts them).
    2. score: per doc, mean over bigrams of log(count(bigram)/count(prefix)),
       computed over a (doc, bigram, count) pre-aggregate rather than raw
       occurrences — multiplying the quantized per-bigram micro-nat value
       by its integer count is exact, so the result is bit-identical while
       the join/shuffle volume shrinks to distinct-bigrams-per-doc.

    Determinism: a per-doc float sum would depend on summation order, so
    each occurrence's log-prob is converted to FIXED POINT first —
    round(log(c_bg/c_pre) * 1e6) micro-nats as a long — and summed as an
    integer, which is associative and order-free: no per-doc collect, no
    canonical sort, any partitioning gives the same bits. Range: |logprob|
    <= ln(corpus bigram total) ≈ 50 nats = 5e7 micro-nats per occurrence,
    so a single document needs > 1.8e11 bigrams (~180 GB of text in ONE
    row) before the int64 sum could overflow. The 1e-6-nat quantization is
    absorbed by the 4-decimal output rounding. Docs shorter than 2 chars
    produce no row."""
    base = df.select(
        F.col(id_col).alias("_id"), F.lower(F.col(text_col)).alias("_t")
    ).filter(F.length("_t") >= 2)
    n = F.length("_t")
    idx = F.sequence(F.lit(1), n - 1)
    bigrams = F.transform(
        idx, lambda i: F.col("_t").substr(i.cast("int"), F.lit(2))
    )
    bg = base.select("_id", F.explode(bigrams).alias("bg"))
    # Probe side pre-aggregated to (_id, bg, cnt): the map-side partial
    # aggregate collapses repeated bigrams per document, so the model join
    # and the final per-doc groupBy carry ~10x fewer rows on natural text
    # (distinct bigrams per doc << occurrences). Bit-identical to the
    # per-occurrence sum: every occurrence of a given bigram contributes
    # the SAME quantized micro-nat value, and quantized_value * count ==
    # sum over occurrences, exactly, in int64.
    doc_bg = bg.groupBy("_id", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    # Model side aggregates straight off its own explode pass (Catalyst
    # does not reuse the probe's (_id,bg) exchange across branches — the
    # join-key null filter differs, breaking canonical equality), and the
    # prefix totals come from a WINDOW over the tiny model table
    # (|alphabet|^2 rows) rather than a second model pass + second join:
    # one model subtree, one join, explode evaluated twice total (vs 3x
    # with the old model_bg/model_pre chain). The window sums longs —
    # associative, order-free, deterministic.
    model = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c_bg"))
        .withColumn(
            "c_pre",
            F.sum("c_bg").over(Window.partitionBy(F.substring("bg", 1, 1))),
        )
    )
    lp_micro = F.round(
        F.log(F.col("c_bg").cast("double") / F.col("c_pre")) * 1000000.0, 0
    ).cast("long")
    packed = doc_bg.join(model, "bg").withColumn("_lp_micro", lp_micro)
    n_bg = F.sum("cnt").cast("long")
    scored = packed.groupBy("_id").agg(
        n_bg.alias("n_bigrams"),
        F.round(
            F.sum(F.col("_lp_micro") * F.col("cnt")).cast("double")
            / 1000000.0
            / n_bg,
            4,
        ).alias("avg_logprob"),
    )
    return scored.select(F.col("_id").alias(id_col), "n_bigrams", "avg_logprob")


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 5, window: int = 4,
                id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03): rolling
    k-gram hashes, minimum per sliding window, distinct mins = fingerprint.
    Hash = first 8 bytes of md5 (portable, engine-independent). Arrow-batched
    pandas UDF — string slicing per k-gram has no built-in equivalent."""
    @F.pandas_udf("array<bigint>")
    def fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.tolist():
            if not isinstance(t, str) or len(t) < k:
                out.append([])
                continue
            hs = [
                int.from_bytes(
                    hashlib.md5(t[i : i + k].encode()).digest()[:8], "big", signed=True
                )
                for i in range(len(t) - k + 1)
            ]
            mins = {
                min(hs[i : i + window])
                for i in range(max(1, len(hs) - window + 1))
            }
            out.append(sorted(mins))
        return pd.Series(out, index=texts.index, dtype=object)

    return df.select(id_col, fp(F.col(text_col)).alias("fingerprint"))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF, with the score kept in EXACT
    integer space for engine-portable ranking: idf is quantized once per
    term to micro-nats (round(ln((N+1)/(df+1)) * 1e6) as long — the same
    fixed-point device as char_bigram_logprob) and multiplied by the
    integer term frequency, so the ordering key tf * idf_micro is a plain
    BIGINT and no float comparison can flip a rank between engines.

    Plan shape at scale: one (doc, word) aggregation, one word-keyed df
    aggregation (both map-side-combinable), a broadcast of the scalar N,
    a word-keyed join, and a per-doc WindowGroupLimit top-k — no global
    sort, no driver collection."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq")
    )
    n_docs = df.select(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    idf_micro = F.round(
        F.log((F.col("_n") + 1).cast("double") / (F.col("doc_freq") + 1)) * 1000000.0,
        0,
    ).cast("long")
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score_micro", F.col("tf") * idf_micro)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col, "term", "tf", "doc_freq", "score_micro",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
