"""URL canonicalization + URL-keyed dedup — the crawl-pipeline op that
collapses scheme/host case variants, default ports, dot-segments,
tracking parameters, and fragment noise before URL-level dedup (the first
dedup stage of CommonCrawl-style corpora, ahead of content dedup).

Everything is JVM-side Catalyst expressions (regexp parse + higher-order
``aggregate``/``filter``/``array_sort``) — no Python in the hot path, so
the op rides whole-stage codegen over 100 TB and the only shuffle in
:func:`url_dedup` is the canonical-key window.

Normalization implemented (RFC 3986 §6.2.2 syntax-based subset +
crawl-dedup conventions):

- scheme and host lowercased; a leading ``www.`` stripped;
- fragment dropped;
- default port dropped (http:80 / https:443), other ports kept;
- path dot-segments removed (``.`` and ``x/..``; ``..`` clamps at root),
  empty segments collapsed, trailing slash stripped, empty path → ``/``;
- query parameters: empties and ``utm_*`` tracking params dropped, the
  rest sorted codepoint-wise; an emptied query loses its ``?``.

Boundary (documented, not silent): percent-encoding normalization
(``%7e`` → ``~`` decode / hex-case fold) is out of scope — inputs whose
variants differ only in percent-encoding stay distinct. Strings without
``scheme://`` and bracketed-IPv6 authorities canonicalize to NULL rather
than a guess; :func:`url_dedup` keeps each NULL row as its own singleton
group.

The reference project (MaksimBrezho/logparserhelper) has no URL surface;
this is LLM-training-pipeline surface (SURVEY.md §2 dedup family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "url_dedup"]


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute URL as a pure Catalyst expression
    tree; NULL when the value has no ``scheme://`` or a bracketed-IPv6
    authority (out of scope — better NULL than a mangled dedup key)."""
    # strip the fragment FIRST: a '?' inside a fragment is fragment text,
    # not a query ('http://h/p#a?b=1' must canonicalize like '…/p')
    pre = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(pre, r"^([^:/?#]+)://", 1))
    # userinfo is dropped from the canonical form (dedup keys should not
    # vary by credentials; the fixture corpus carries none)
    auth = F.regexp_replace(
        F.regexp_extract(pre, r"^[^:/?#]+://([^/?#]*)", 1), r"^[^@]*@", ""
    )
    path = F.regexp_extract(pre, r"^[^:/?#]+://[^/?#]*([^?]*)", 1)
    query = F.regexp_extract(pre, r"\?(.*)", 1)

    host = F.regexp_replace(
        F.lower(F.regexp_extract(auth, r"^([^:]*)", 1)), r"^www\.", ""
    )
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    drop_port = (
        (port == F.lit(""))
        | ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
    )

    # dot-segment removal as a string fold: '' (empty/trailing segment)
    # and '.' are no-ops, '..' pops the last '/…' (clamping at root),
    # anything else appends. The '' accumulator seed makes the leading
    # absolute-path segment a no-op too.
    folded = F.aggregate(
        F.split(path, "/"),
        F.lit(""),
        lambda acc, x: F.when((x == F.lit("")) | (x == F.lit(".")), acc)
        .when(x == F.lit(".."), F.regexp_replace(acc, r"/[^/]*$", ""))
        .otherwise(F.concat(acc, F.lit("/"), x)),
    )
    canon_path = F.when(folded == F.lit(""), F.lit("/")).otherwise(folded)

    qparts = F.filter(
        F.split(query, "&"),
        lambda x: (x != F.lit("")) & ~x.startswith("utm_"),
    )
    canon_q = F.array_join(F.array_sort(qparts), "&")

    built = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(drop_port, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        canon_path,
        F.when(canon_q == F.lit(""), F.lit("")).otherwise(
            F.concat(F.lit("?"), canon_q)
        ),
    )
    return F.when(
        (scheme == F.lit("")) | auth.contains("["), F.lit(None).cast("string")
    ).otherwise(built)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Adds ``canonical_url``, the canonical-group size ``n_variants``,
    and ``is_rep`` (true for the group's min-id representative — the row
    a dedup pass keeps). One shuffle on the canonical key.

    Rows whose URL canonicalizes to NULL (non-URLs, bracketed IPv6) are
    each their own singleton group (``is_rep`` true, ``n_variants`` 1):
    a dedup pass must never collapse distinct unparseable documents, and
    keying them by their own id also keeps the one would-be giant NULL
    partition out of the window exchange (skew)."""
    canon = canonicalize_url(F.col(url_col))
    wkey = F.coalesce(
        canon, F.concat(F.lit("\x00unparsed\x00"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(wkey)
    return (
        df.withColumn("canonical_url", canon)
        .withColumn("n_variants", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("is_rep", F.col(id_col) == F.min(id_col).over(w))
    )
