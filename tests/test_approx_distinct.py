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


def test_count_min_sketch_heavy_hitters(spark):
    """Count-min sketch (the third mergeable sketch next to HLL++ and
    approx_percentile), via the SQL count_min_sketch aggregate (the
    python stat API does not expose it): frequency estimates never
    undercount, stay within eps*N of truth, and two sketches built on
    disjoint halves merge to the same estimates as one pass — the
    map-side-combinable property that finds heavy hitters (hot domains,
    template strings) in one scan at 10^12 rows without a groupBy
    shuffle of every key."""
    n = 100_000
    df = spark.range(n).selectExpr(
        "cast(floor(sqrt(id)) as string) as k")  # key j has ~2j+1 rows
    exact = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    agg = "count_min_sketch(k, 0.001d, 0.99d, 42) as s"

    def sketch(frame):
        raw = bytes(frame.selectExpr(agg).collect()[0]["s"])
        return spark._jvm.org.apache.spark.util.sketch.CountMinSketch \
            .readFrom(raw)

    cms = sketch(df)
    for k in ("300", "310", "18"):  # heavy-ish and light keys
        est = cms.estimateCount(k)
        assert est >= exact[k]                       # never undercounts
        assert est - exact[k] <= 0.001 * n * 2       # within the bound
    # mergeability: disjoint halves -> merged sketch == one-pass counts
    merged = sketch(df.filter("id % 2 = 0"))
    merged.mergeInPlace(sketch(df.filter("id % 2 = 1")))
    one = sketch(df)
    for k in ("300", "12", "0"):
        assert merged.estimateCount(k) == one.estimateCount(k)
