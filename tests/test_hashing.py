"""Portable hash layer: Python == Spark SQL == DuckDB, bit for bit."""

import duckdb
import pytest
from pyspark.sql import functions as F

from causalre_spark.functions.hashing import md5_long, md5_long_sql, minhash_sql, minhash_long

SAMPLES = ["", "a", "hello world", "heavy rain", "ünïcode ☂", "x" * 500]


def test_md5_long_python_vs_duckdb():
    for s in SAMPLES:
        lit = "'" + s.replace("'", "''") + "'"
        got = duckdb.sql(f"select {md5_long_sql(lit)} as h").fetchone()[0]
        assert got == md5_long(s), s


def test_md5_long_python_vs_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    rows = df.select("s", F.expr(md5_long_sql("s")).alias("h")).collect()
    for r in rows:
        assert r["h"] == md5_long(r["s"]), r["s"]


def test_minhash_family_portable(spark):
    for seed in (0, 3, 7):
        sql = minhash_sql("'rain'", seed)
        d = duckdb.sql(f"select {sql} as h").fetchone()[0]
        sp = spark.range(1).select(F.expr(sql).alias("h")).collect()[0]["h"]
        assert d == sp == minhash_long("rain", seed)


def test_fits_double_precision():
    # 48-bit values survive a float64 round-trip (driver value-hash safety)
    v = md5_long("anything")
    assert float(v) == v and v < 2**53
