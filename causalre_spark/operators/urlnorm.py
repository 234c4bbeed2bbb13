"""URL canonicalization + canonical-URL dedup.

The input table is Common-Crawl-style pages keyed by url (input_hint:
url, warc_ts, html, ...); real crawls carry the same page under many
url spellings (scheme/host case, default ports, tracking params, param
order, fragments, trailing slashes). Canonicalizing BEFORE content
dedup collapses the bulk of exact dupes with pure string algebra — no
shuffle beyond the final group — so it belongs in front of the
MinHash/SimHash family (operators/dedup.py) in any 100 TB ingest.

Everything is built-in expression algebra (regexp + higher-order array
ops, whole-stage codegen'd, zero Python). Canonical form:
  - scheme + host lowercased; default ports (:80 http, :443 https)
    stripped
  - fragment dropped
  - tracking params dropped (utm_* / fbclid / gclid), remaining query
    params sorted bytewise
  - trailing slashes stripped from the path

The rule set is deliberately closed-form so the DuckDB oracle can
replicate it operator-for-operator (list_filter/list_sort there,
filter/array_sort here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url(url: Column) -> Column:
    """Canonical spelling of `url` (see module docstring for the rule
    set). Pure expression — usable in any select/groupBy."""
    nofrag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(nofrag, r"^[^:/?#]+://([^/?#]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(nofrag, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    query = F.regexp_extract(nofrag, r"\?([^#]*)", 1)
    # param hygiene: split -> filter -> sort -> join (HOF array algebra;
    # runs once per row pre-shuffle — cheap side of the groupBy)
    split_q = F.split(query, "&")
    keep = F.filter(
        split_q,
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("fbclid=")
        & ~p.startswith("gclid="),
    )
    qsorted = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qsorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted)),
    )


def dedup_by_canonical_url(pages: DataFrame,
                           url_col: str = "url") -> DataFrame:
    """(canon_url, n_urls, n_distinct_raw, min_url): one row per
    canonical URL with its duplicate fanout — the grouping key a
    canonical-first ingest dedups on."""
    return (
        pages.select(F.col(url_col).alias("raw"),
                     canonical_url(F.col(url_col)).alias("canon_url"))
        .groupBy("canon_url")
        .agg(F.count("*").alias("n_urls"),
             F.countDistinct("raw").alias("n_distinct_raw"),
             F.min("raw").alias("min_url"))
    )
