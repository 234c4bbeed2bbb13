"""Streaming ingest: same results as batch, incremental on new files."""

import shutil

from causalre_spark.oracle.pipeline import doc_spans
from causalre_spark.extract import tokenize
from causalre_spark.config import DEFAULT_CONFIG
from causalre_spark.sources.corpus import gen_page, synth_pages_df
from causalre_spark.streaming.ingest import run_ingest_once

SRC = "/tmp/causalre_stream_src"
OUT = "/tmp/causalre_stream_out"


def test_streaming_matches_batch_and_is_incremental(spark):
    shutil.rmtree(SRC, ignore_errors=True)
    shutil.rmtree(OUT, ignore_errors=True)
    synth_pages_df(spark, 20, partitions=2).write.mode("overwrite").parquet(SRC)
    sinks = run_ingest_once(spark, SRC, OUT)
    spans1 = spark.read.parquet(sinks["spans"])
    n1 = spans1.count()
    assert n1 > 0

    # spot-check one doc against the oracle
    pg = next(gen_page(i) for i in range(20) if gen_page(i)["lang"] == "en")
    want = {(s["start"], s["end"]) for s in doc_spans(tokenize(pg["text"]), DEFAULT_CONFIG)}
    got = {(r.start, r.end) for r in spans1.filter(spans1.url == pg["url"]).collect()}
    assert got == want

    # second batch of files -> only the new docs are appended
    (synth_pages_df(spark, 30, partitions=2)
     .filter("url rlike '/doc/2[0-9]$'")  # exactly docs 20..29
     .write.mode("append").parquet(SRC))
    run_ingest_once(spark, SRC, OUT)
    spans2 = spark.read.parquet(sinks["spans"])
    assert spans2.count() > n1
    # no duplicates for the original urls (checkpoint skipped old files)
    dup = (spans2.groupBy("url", "start", "end").count().filter("count > 1").count())
    assert dup == 0
