"""URL feature extraction — the crawl-curation companion to
``text.strip_html``: web-corpus pipelines filter and cap by domain
(C4's per-domain rule, blocklists, TLD heuristics) before any content
work, so the URL column needs cheap structured features.

All features are codegen'd ``regexp_extract``/array expressions with
RE2-compatible patterns, so the DuckDB oracle can run the identical
rules (Spark's ``parse_url`` — java.net.URI underneath — is avoided on
purpose: its normalization quirks have no cross-engine twin).

``domain`` is the last-two-labels approximation of the registrable
domain; a public-suffix-list lookup (the exact answer for co.uk-style
suffixes) is a broadcast-join slot-in over the same ``host`` column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME = r"^([a-z][a-z0-9+.-]*):"
_HOST = r"^[a-z][a-z0-9+.-]*://([^/?#@]*@)?([^/?#:]*)"
_PORT = r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+)"
_PATH = r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY = r"\?([^#]*)"

#: Tracking query parameters stripped by canonicalization (the usual
#: crawl-dedup list: Google/Facebook click ids, utm_* campaign tags,
#: bare ref). RE2-compatible — the DuckDB twin runs the same pattern.
TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)="


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append (scheme, host, domain, path_depth, n_params, is_https)
    to each row. Unparseable/relative URLs yield empty strings and
    zero counts — filter rows, don't fail them (crawl data)."""
    u = F.col(url_col)
    scheme = F.regexp_extract(u, _SCHEME, 1)
    host = F.regexp_extract(u, _HOST, 2)
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    path = F.regexp_extract(u, _PATH, 1)
    path_depth = F.size(F.filter(F.split(path, "/"),
                                 lambda x: x != ""))
    query = F.regexp_extract(u, _QUERY, 1)
    n_params = F.when(query == "", F.lit(0)) \
                .otherwise(F.size(F.split(query, "&")))
    return (df.withColumn("scheme", scheme)
              .withColumn("host", host)
              .withColumn("domain", domain)
              .withColumn("path_depth", path_depth.cast("int"))
              .withColumn("n_params", n_params.cast("int"))
              .withColumn("is_https", scheme == "https"))


def canonical_url(url_col: str | Column) -> Column:
    """Canonical form of a URL for crawl-level dedup — the
    normalization every large-scale crawl runs before URL-keyed exact
    dedup, because the same page arrives as dozens of syntactic
    variants. Rules (each one a deterministic, RE2-parity expression):

      * scheme and host lowercased; ``www.`` prefix and trailing-dot
        host stripped; userinfo dropped;
      * default ports dropped (``:80`` for http, ``:443`` for https);
        non-default ports kept;
      * path: ``//`` runs collapsed, trailing ``/`` stripped (the root
        path canonicalizes to the empty string — bare host);
      * query: tracking params removed
        (:data:`TRACKING_PARAM_PATTERN`), remaining params SORTED
        (param order is presentation, not identity), empty query
        dropped;
      * fragment always dropped (client-side only).

    Unparseable URLs (no scheme://host) canonicalize to the empty
    string — callers group them away rather than fail (crawl data).
    """
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.regexp_extract(u, _SCHEME, 1))
    host = F.lower(F.regexp_extract(u, _HOST, 2))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r"\.$", "")
    port = F.regexp_extract(u, _PORT, 1)
    port_part = (
        F.when(port == "", F.lit(""))
         .when((scheme == F.lit("http")) & (port == "80"), F.lit(""))
         .when((scheme == F.lit("https")) & (port == "443"), F.lit(""))
         .otherwise(F.concat(F.lit(":"), port)))
    path = F.regexp_extract(u, _PATH, 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(u, _QUERY, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_PATTERN))
    qsorted = F.array_join(F.array_sort(params), "&")
    q_part = F.when(qsorted == "", F.lit("")) \
              .otherwise(F.concat(F.lit("?"), qsorted))
    return (F.when((scheme == "") | (host == ""), F.lit(""))
             .otherwise(F.concat(scheme, F.lit("://"), host, port_part,
                                 path, q_part)))


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """(canonical_url, id, n_copies): exact dedup keyed on
    :func:`canonical_url` — one linear hash-groupBy (min-id
    representative), the URL-level first pass of a crawl pipeline
    (dedup by page identity BEFORE fetching/processing content; at
    100 TB the URL table is orders of magnitude lighter than the
    payloads it gates)."""
    return (df.select(F.col(id_col), canonical_url(url_col)
                      .alias("canonical_url"))
              .groupBy("canonical_url")
              .agg(F.min(id_col).alias(id_col),
                   F.count("*").alias("n_copies")))
