"""approx_count_distinct sanity — SURVEY §2.4 notes the reference has
no approx-distinct operator but Spark provides it free; at 10^12 docs
the exact countDistinct of a high-cardinality key (url, canonical_id)
is a full shuffle of every distinct value, while HLL++ is a fixed-size
sketch mergeable map-side. No DuckDB oracle (sketch internals differ
across engines by design) — the gate is relative error vs the exact
count at the configured rsd, which HLL++ guarantees probabilistically
and this fixed seed makes deterministic in practice.
"""

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark):
    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 30_000).alias("k"),          # 30k distinct
        F.concat(F.lit("u"), (F.col("id") % 7_000)).alias("s"))  # 7k distinct
    exact_k = df.select(F.countDistinct("k")).collect()[0][0]
    exact_s = df.select(F.countDistinct("s")).collect()[0][0]
    approx = df.select(
        F.approx_count_distinct("k", rsd=0.02).alias("ak"),
        F.approx_count_distinct("s", rsd=0.02).alias("as_"),
    ).collect()[0]
    assert exact_k == 30_000 and exact_s == 7_000
    assert abs(approx["ak"] - exact_k) / exact_k < 0.05
    assert abs(approx["as_"] - exact_s) / exact_s < 0.05


def test_approx_distinct_merges_across_partitions(spark):
    # the sketch must be partition-order independent: same data, two
    # different partitionings, identical estimate (HLL merge is
    # commutative — the property that makes it map-side combinable)
    df = spark.range(100_000).select((F.col("id") % 9_999).alias("k"))
    a = df.repartition(4).select(F.approx_count_distinct("k")).collect()[0][0]
    b = df.repartition(17).select(F.approx_count_distinct("k")).collect()[0][0]
    assert a == b
