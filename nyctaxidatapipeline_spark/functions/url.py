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
_PATH = r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY = r"\?([^#]*)"


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
