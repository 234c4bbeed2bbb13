"""Evaluation operators (SURVEY §2.4 A1/A2, §2.3 J6, §2.6 U1).

strict_prf      exact-tuple TP/FP/FN via join + anti-joins
                (metrics.py:96-132; flatten evaluator.py:138-148)
loose_match     width-proportional tolerance matching, greedy
                first-match-wins 1-to-1 (metrics.py:18-92; knobs
                config.yaml:81-84: tol=0.15, width_limit=8)
evaluate_triples end-to-end triple P/R/F1 — the north_rule P/R >= 0.95
                gate computes through this

The loose matcher is order-dependent (first-match-wins), so like NMS it
runs per-document via applyInPandas with a fixed deterministic order;
the band-join candidate generation stays relational so only the tiny
per-doc candidate set crosses into Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig


def strict_prf(gold: DataFrame, pred: DataFrame, keys: list[str]) -> DataFrame:
    """Single-row (tp, fp, fn, precision, recall, f1) over exact keys."""
    g = gold.select(*keys).distinct()
    p = pred.select(*keys).distinct()
    spark = gold.sparkSession
    tp = g.join(p, keys).count()
    fp = p.join(g, keys, "left_anti").count()
    fn = g.join(p, keys, "left_anti").count()
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return spark.createDataFrame(
        [(tp, fp, fn, round(prec, 6), round(rec, 6), round(f1, 6))],
        "tp long, fp long, fn long, precision double, recall double, f1 double",
    )


def loose_match_spans(
    gold: DataFrame, pred: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """A2: per-doc loose TP count with the reference's greedy semantics.

    gold/pred: (url, start, end). A gold span of width >= loose_width_limit
    matches the FIRST unused pred whose endpoints are both within
    round(tol * width); narrower spans require exact match. Candidates
    come from a relational band join; the greedy 1-1 assignment runs per
    doc over the (tiny) candidate list, ordered deterministically
    (gold by (start, end), preds by (|dstart|+|dend|, start, end)).
    """
    tol = cfg.loose_tol
    wlim = cfg.loose_width_limit
    g = gold.select("url", F.col("start").alias("gs"), F.col("end").alias("ge"))
    p = pred.select("url", F.col("start").alias("ps"), F.col("end").alias("pe"))
    # tolerance is UNROUNDED (reference metrics.py compares d <= tol*width
    # directly); rounding would admit e.g. delta 2 at width 10, tol 0.15
    width = F.col("ge") - F.col("gs")
    tol_w = F.when(width >= wlim, width * tol).otherwise(F.lit(0))
    cands = (
        g.join(p, "url")
        .withColumn("tol_w", tol_w)
        .filter((F.abs(F.col("gs") - F.col("ps")) <= F.col("tol_w"))
                & (F.abs(F.col("ge") - F.col("pe")) <= F.col("tol_w")))
        .select("url", "gs", "ge", "ps", "pe")
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"url": [], "loose_tp": []})
        url = pdf["url"].iloc[0]
        pdf = pdf.assign(
            d=(pdf["gs"] - pdf["ps"]).abs() + (pdf["ge"] - pdf["pe"]).abs())
        pdf = pdf.sort_values(["gs", "ge", "d", "ps", "pe"], kind="mergesort")
        used: set[tuple[int, int]] = set()
        matched: set[tuple[int, int]] = set()
        for r in pdf.itertuples(index=False):
            gkey, pkey = (r.gs, r.ge), (r.ps, r.pe)
            if gkey in matched or pkey in used:
                continue
            matched.add(gkey)
            used.add(pkey)
        return pd.DataFrame({"url": [url], "loose_tp": [len(matched)]})

    return cands.groupBy("url").applyInPandas(
        _greedy, schema="url string, loose_tp long")


def evaluate_triples(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Triple-level P/R/F1 on canonical (cause_id, effect_id) keys —
    the north_rule acceptance metric."""
    return strict_prf(gold, pred, ["cause_id", "effect_id"])


def running_mean(values: list[float]) -> list[float]:
    """A5: running mean of step losses (train.py:229) — driver-side
    scalars in the reference; here a pure helper the metrics table can
    aggregate with `avg` over a window at any scale."""
    out, total = [], 0.0
    for i, v in enumerate(values, 1):
        total += v
        out.append(total / i)
    return out


def ema(values: list[float], alpha: float) -> list[float]:
    """A5: exponential moving average of the model-save score
    (train.py:252-266): ema_t = alpha*x_t + (1-alpha)*ema_{t-1},
    seeded with the first raw value."""
    out: list[float] = []
    for v in values:
        out.append(v if not out else alpha * v + (1 - alpha) * out[-1])
    return out


def balanced_save_score(span_prf: tuple[float, float, float],
                        rel_prf: tuple[float, float, float],
                        balance_reduction_factor: float = 2.0) -> float:
    """The reference's balance-weighted model-save score
    (train.py:334-361): per task, f1 * (min(p,r)/max(p,r))**k, averaged
    over the span and rel tasks."""
    def score(p, r, f1):
        balance = min(p, r) / max(p, r) if max(p, r) > 0 else 0.0
        return f1 * balance ** balance_reduction_factor

    return (score(*span_prf) + score(*rel_prf)) / 2.0
