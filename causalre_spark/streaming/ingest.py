"""Structured Streaming ingest: pages stream -> spans/relations sink.

The reference is pure batch (SURVEY §2.10); this is the web-scale
freshness path the north_rule's production shape implies: new WARC/page
partitions land continuously, per-document extraction is stateless, so
it streams through the SAME fused Arrow UDF as the batch pipeline —
zero logic duplication. Cross-document stages (entity linking, triple
canonicalization) are deliberately left to the periodic batch job
(foreachBatch or a scheduled run over the streamed spans/rels tables):
connected components is iterative-global and has no sane incremental
formulation at this granularity.

Sandbox: file-source streaming with Trigger.AvailableNow; production:
the same code against a Kafka/cloud-files source and Iceberg sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig
from causalre_spark.model.udfs import DOC_EXTRACT_SCHEMA, make_doc_extract_udf
from causalre_spark.sources.corpus import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(pages: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Streaming flavor of the batch docs stage — same UDF, same schema,
    plus the processing timestamp for downstream watermarking."""
    eng = pages.filter(F.col("lang") == "en")
    docs = eng.select("url", "html", F.col("text").alias("expected_text")) \
        .mapInPandas(make_doc_extract_udf(cfg), schema=DOC_EXTRACT_SCHEMA)
    return docs.withColumn("ingest_ts", F.current_timestamp())


def spans_stream(docs: DataFrame) -> DataFrame:
    return docs.select("url", "ingest_ts", F.explode("spans").alias("sp")).select(
        "url", "ingest_ts", "sp.start", "sp.end", "sp.tag_score",
        "sp.filter_score", "sp.text")


def rels_stream(docs: DataFrame) -> DataFrame:
    return docs.select("url", "ingest_ts", F.explode("rels").alias("r")).select(
        "url", "ingest_ts", "r.h_start", "r.h_end", "r.t_start", "r.t_end",
        "r.rel_score", "r.h_text", "r.t_text")


def run_ingest_once(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> dict:
    """Drain everything currently in pages_path (Trigger.AvailableNow)
    into append-mode spans/relations parquet sinks with checkpoints;
    returns the sink paths. Re-running after new files land processes
    only the new files (streaming checkpoint = the resume mechanism)."""
    docs = extract_stream(read_pages_stream(spark, pages_path), cfg)
    queries = []
    for name, df in (("spans", spans_stream(docs)), ("relations", rels_stream(docs))):
        q = (
            df.writeStream.format("parquet")
            .option("path", f"{out_dir}/{name}")
            .option("checkpointLocation", f"{out_dir}/_checkpoints/{name}")
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        queries.append(q)
    for q in queries:
        q.awaitTermination()
    return {"spans": f"{out_dir}/spans", "relations": f"{out_dir}/relations"}
