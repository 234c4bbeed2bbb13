"""End-to-end pages -> triples pipeline.

Stage order mirrors the reference's inference forward pass
(model.py:728-1134): extract/tokenize -> tagger+span filter (fused UDF)
-> windowed top-k -> NMS -> pair scoring (grouped UDF) -> top-k rels ->
threshold -> hanging-rel prune -> [north_rule additions] entity linking
-> canonical triples -> partitioned write.

Scale design notes (local[32] here; 1000-executor reasoning):
  - pages are repartitioned by md5(url) before the UDF stages: hot
    domains (Zipf skew) land evenly because the unit of work is the
    document, not the domain; AQE skew-join handles residual join skew.
  - docs (url, tokens) is persisted once and reused by three consumers
    (span scoring, pair scoring, text materialization) — one extraction
    pass, like the reference's shared encoder (model.py:39-44).
  - every shuffle key is the document key; the top-k window, the NMS
    group, and the pair-scoring group share partitioning, so Spark
    reuses the exchange instead of re-shuffling.
  - checkpointed stage boundaries (parquet/_SUCCESS) make the run
    resumable: a rerun skips completed stages (north_rule resume).
  - per-stage, per-partition lineage rows (stage, partition, rows) are
    collected into a metrics table for audit (north_rule lineage).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig
from causalre_spark.functions.hashing import md5_long_sql
from causalre_spark.functions.text import NORMALIZE_SQL
from causalre_spark.model.udfs import (
    DOCS_SCHEMA,
    PAIRS_SCHEMA,
    SPANS_SCHEMA,
    make_score_pairs_udf,
    make_score_spans_udf,
)
from causalre_spark.operators import linking, relations, spans


class StageIO:
    """Checkpoint/resume + lineage for stage boundaries.

    With a workdir, each stage materializes to parquet; completed stages
    (parquet _SUCCESS present) are skipped on rerun. Without one, stages
    flow through as lazy DataFrames (tests / small corpora).
    """

    def __init__(self, spark: SparkSession, workdir: str | None, resume: bool = True):
        self.spark = spark
        self.workdir = workdir
        self.resume = resume
        self.metrics: list[dict] = []

    def _path(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def done(self, name: str) -> bool:
        return (
            self.workdir is not None
            and self.resume
            and os.path.exists(os.path.join(self._path(name), "_SUCCESS"))
        )

    def checkpoint(self, name: str, df_fn) -> DataFrame:
        """Run df_fn() unless `name` is already materialized; return the
        stage DataFrame (reading back from parquet when materialized)."""
        if self.workdir is None:
            return df_fn()
        path = self._path(name)
        if not self.done(name):
            df_fn().write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        self._lineage(name, out)
        return out

    def _lineage(self, name: str, df: DataFrame) -> None:
        rows = (
            df.groupBy(F.spark_partition_id().alias("partition"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        for r in rows:
            self.metrics.append(
                {"stage": name, "partition": int(r["partition"]), "rows": int(r["rows"])}
            )

    def write_metrics(self) -> None:
        if self.workdir is None or not self.metrics:
            return
        pdf_schema = "stage string, partition int, rows long"
        (
            self.spark.createDataFrame(
                [(m["stage"], m["partition"], m["rows"]) for m in self.metrics],
                schema=pdf_schema,
            )
            .write.mode("overwrite")
            .parquet(self._path("_metrics"))
        )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    workdir: str | None = None,
    resume: bool = True,
    verify_extraction: bool = True,
) -> dict[str, DataFrame]:
    """Full pipeline; returns {'docs','spans','relations','entities','triples'}."""
    io = StageIO(spark, workdir, resume)

    def _docs() -> DataFrame:
        eng = pages.filter(F.col("lang") == "en")
        eng = eng.repartition(F.expr(f"pmod({md5_long_sql('url')}, {cfg.shuffle_partitions})"))
        docs = eng.select("url", "html", F.col("text").alias("expected_text")).mapInPandas(
            _extract_verify_udf, schema=DOCS_SCHEMA + ", text_ok boolean"
        )
        return docs

    docs = io.checkpoint("docs", _docs)
    if verify_extraction:
        bad = docs.filter(~F.col("text_ok")).count()
        if bad:
            raise AssertionError(f"extraction not byte-identical for {bad} pages")
    docs = docs.drop("text_ok").persist()

    def _span_cands() -> DataFrame:
        return docs.select("url", "tokens").mapInPandas(
            make_score_spans_udf(cfg), schema=SPANS_SCHEMA
        )

    span_cands = io.checkpoint("span_candidates", _span_cands)

    def _kept() -> DataFrame:
        return spans.nms_spans(spans.topk_spans(span_cands, cfg), cfg)

    kept = io.checkpoint("spans", _kept).persist()

    def _pairs() -> DataFrame:
        with_toks = kept.select("url", "start", "end").join(
            docs.select("url", "tokens"), "url"
        )
        return with_toks.groupBy("url").applyInPandas(
            make_score_pairs_udf(cfg), schema=PAIRS_SCHEMA
        )

    pairs = io.checkpoint("pair_scores", _pairs)

    def _rels() -> DataFrame:
        r = relations.threshold_rels(relations.topk_rels(pairs, cfg), cfg)
        r = relations.prune_hanging_rels(r, kept)
        return relations.attach_pair_text(r, docs)

    rels = io.checkpoint("relations", _rels).persist()

    def _entities() -> DataFrame:
        mentions = spans.span_text(kept, docs).select("text")
        return linking.link_mentions(mentions, cfg)

    entities = io.checkpoint("entities", _entities)

    def _triples() -> DataFrame:
        e = entities
        with_h = rels.withColumn("h_form", F.expr(NORMALIZE_SQL.format(x="h_text")))
        with_h = with_h.withColumn("t_form", F.expr(NORMALIZE_SQL.format(x="t_text")))
        joined = (
            with_h.join(
                e.select(F.col("form").alias("h_form"),
                         F.col("canonical_id").alias("cause_id"),
                         F.col("canonical_form").alias("cause")),
                "h_form",
            )
            .join(
                e.select(F.col("form").alias("t_form"),
                         F.col("canonical_id").alias("effect_id"),
                         F.col("canonical_form").alias("effect")),
                "t_form",
            )
            .filter(F.col("cause_id") != F.col("effect_id"))
        )
        # A8 at corpus scale: canonical triple dedup + evidence agg
        return (
            joined.groupBy("cause_id", "cause", "effect_id", "effect")
            .agg(
                F.count(F.lit(1)).alias("n_evidence"),
                F.max("rel_score").alias("max_score"),
            )
            .select(
                "cause_id", "cause", F.lit("CAUSES").alias("predicate"),
                "effect_id", "effect", "n_evidence", "max_score",
            )
        )

    triples = io.checkpoint("triples", _triples)
    io.write_metrics()
    return {
        "docs": docs,
        "spans": kept,
        "relations": rels,
        "entities": entities,
        "triples": triples,
    }


def _extract_verify_udf(batches):
    """pages(url, html, expected_text) -> docs + text_ok flag.

    Extraction runs on html only; expected_text is used solely for the
    byte-identical invariant flag (input_hint)."""
    import pandas as pd

    from causalre_spark.extract import extract_text, tokenize

    for pdf in batches:
        texts = [extract_text(bytes(h)) for h in pdf["html"]]
        toks = [tokenize(t) for t in texts]
        yield pd.DataFrame(
            {
                "url": pdf["url"].values,
                "text": texts,
                "tokens": toks,
                "n_tokens": [len(t) for t in toks],
                "text_ok": [a == b for a, b in zip(texts, pdf["expected_text"])],
            }
        )
