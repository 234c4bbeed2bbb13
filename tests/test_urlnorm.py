"""URL canonicalization (operators/urlnorm.py): rule-set unit cases and
Spark-vs-DuckDB parity of the url_canon_dedup query."""

import duckdb
from pyspark.sql import functions as F

from causalre_spark.operators.urlnorm import (canonical_url,
                                              dedup_by_canonical_url)

CASES = [
    # host case + nothing else
    ("https://www.EXAMPLE.com/a", "https://www.example.com/a"),
    # default port stripped per scheme
    ("https://x.com:443/a", "https://x.com/a"),
    ("http://x.com:80/a", "http://x.com/a"),
    ("http://x.com:8080/a", "http://x.com:8080/a"),  # non-default kept
    # fragment dropped, trailing slash stripped
    ("https://x.com/a/#frag", "https://x.com/a"),
    ("https://x.com/", "https://x.com"),
    # tracking params dropped, remainder sorted
    ("https://x.com/a?utm_source=s&b=2&a=1&fbclid=z", "https://x.com/a?a=1&b=2"),
    ("https://x.com/a?b=2&a=1", "https://x.com/a?a=1&b=2"),
    # all params tracking -> no query at all
    ("https://x.com/a?utm_medium=m", "https://x.com/a"),
    # scheme case
    ("HTTPS://x.com/a", "https://x.com/a"),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r.c for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_variant_collapse(spark):
    variants = [
        "https://www.Site7.Example.COM/page/9",
        "https://www.site7.example.com:443/page/9/?utm_source=feed",
        "https://www.site7.example.com/page/9#sec",
    ]
    out = dedup_by_canonical_url(
        spark.createDataFrame([(u,) for u in variants], "url string")
    ).collect()
    assert len(out) == 1
    assert out[0].n_urls == 3 and out[0].n_distinct_raw == 3
    assert out[0].canon_url == "https://www.site7.example.com/page/9"


SF = "/root/testdata/sf0.001"


def test_url_canon_dedup_oracle_parity(spark):
    from causalre_spark.plans.entry_queries import ORACLES, QUERIES

    got = sorted(tuple(r) for r in
                 QUERIES["url_canon_dedup"](spark, SF).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'")
    exp = sorted(tuple(r) for r in
                 con.sql(ORACLES["url_canon_dedup"]).fetchall())
    assert got == exp
