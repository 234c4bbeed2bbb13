"""Relation-level relational operators (SURVEY §2.3 J1/J5, §2.5 T2/T5).

Pair *scoring* happens in the grouped UDF (model/udfs.py score_pairs —
one encode per doc, k² bounded); everything after is DataFrame algebra.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig


def gen_pairs(spans: DataFrame) -> DataFrame:
    """J1: per-document self-join of surviving spans, head != tail
    (reference torch.cartesian_prod + eye mask, rel_processor.py:178-201).

    Equi-join on the doc key -> hash join; fan-out ≤ k² per doc. Used by
    relational consumers (e.g. the __spark_entry__ J1 query); the main
    pipeline fuses pair gen into the scoring UDF to avoid shipping token
    arrays per pair.
    """
    h = spans.select(
        "url",
        F.col("start").alias("h_start"),
        F.col("end").alias("h_end"),
    )
    t = spans.select(
        "url",
        F.col("start").alias("t_start"),
        F.col("end").alias("t_end"),
    )
    return h.join(t, "url").filter(
        (F.col("h_start") != F.col("t_start")) | (F.col("h_end") != F.col("t_end"))
    )


def topk_rels(pairs: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """T2: windowed top-k relations per doc (model.py:316-331,
    max_top_k_rels config.yaml:136). Total deterministic order."""
    w = Window.partitionBy("url").orderBy(
        F.col("rel_score").desc(),
        F.col("h_start").asc(), F.col("h_end").asc(),
        F.col("t_start").asc(), F.col("t_end").asc(),
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cfg.max_top_k_rels)
        .drop("rn")
    )


def threshold_rels(pairs: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Decode: keep pairs whose causal logit clears sigmoid >= rel_thd
    (predictor.py:138-155 multilabel decode)."""
    thd = 0.0 if cfg.rel_thd == 0.5 else math.log(cfg.rel_thd / (1 - cfg.rel_thd))
    return pairs.filter(F.col("rel_score") >= F.lit(thd))


def prune_hanging_rels(rels: DataFrame, kept_spans: DataFrame) -> DataFrame:
    """T5: drop relations whose head or tail span was suppressed
    (model.py:602-633) — two left-semi joins on natural keys."""
    ks = kept_spans.select("url", "start", "end")
    rels = rels.join(
        ks.withColumnRenamed("start", "h_start").withColumnRenamed("end", "h_end"),
        ["url", "h_start", "h_end"],
        "left_semi",
    )
    return rels.join(
        ks.withColumnRenamed("start", "t_start").withColumnRenamed("end", "t_end"),
        ["url", "t_start", "t_end"],
        "left_semi",
    )


def attach_pair_text(rels: DataFrame, docs: DataFrame) -> DataFrame:
    """F1 applied to both endpoints of each relation."""
    joined = rels.join(docs.select("url", "tokens"), "url")
    return (
        joined.withColumn(
            "h_text",
            F.concat_ws(" ", F.slice(F.col("tokens"), F.col("h_start") + 1,
                                     F.col("h_end") - F.col("h_start"))),
        )
        .withColumn(
            "t_text",
            F.concat_ws(" ", F.slice(F.col("tokens"), F.col("t_start") + 1,
                                     F.col("t_end") - F.col("t_start"))),
        )
        .drop("tokens")
    )
