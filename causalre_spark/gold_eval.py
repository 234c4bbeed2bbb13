"""Gold-data evaluation: run the frozen reference-profile pipeline over
the reference's OWN annotated datasets and score span/rel P/R/F1 vs gold
(VERDICT r02 next-round #2; reference eval loop: `CRE Model/modules/
evaluator.py:138-148` flatten + `modules/metrics.py` calc_metrics).

The reference's trained checkpoints are unportable (dissertation-era HF
weights), so the repo's 'reference' profile carries frozen md5-derived
weights with documented rule-derived decision surfaces
(model/reference_math.py:31-41). This module quantifies what that
stand-in actually scores on the reference's gold test splits — turning
the "published-F1 claims don't transfer" footnote into a measured table
(BENCH/GOLD_EVAL.md) next to the dissertation numbers in BASELINE.md.

Everything downstream of the per-doc model call is DataFrame algebra:
gold explode, strict A1 join-aggregate (operators.metrics.strict_prf),
greedy A2 loose matching (operators.metrics.loose_match_spans/_rels).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig
from causalre_spark.operators import metrics as M
from causalre_spark.sources.corpus_json import filter_valid_spans, load_corpus_json

# the reference's own annotated corpora (read-only; format documented at
# data_preparation.py:242-288). Both use the event/causal schema.
REFERENCE_DATASETS = {
    "custom": "/root/reference/CRE Model/data/Custom Dataset/"
              "mixed_final_for_model_80-10-10_rs129.json",
    "conll04": "/root/reference/CRE Model/data/Conll04/"
               "conll04_nathan_for_model_rs129.json",
}

PRED_SCHEMA = (
    "doc_id long, "
    "spans array<struct<start:int, end:int, type:string, score:float>>, "
    "rels array<struct<h_start:int, h_end:int, t_start:int, t_end:int, "
    "type:string, score:float>>"
)


def make_predict_udf(cfg: PipelineConfig):
    """(doc_id, tokens) batches -> per-doc predicted spans/rels arrays.

    One Arrow crossing per batch; the model call is the same
    batch.doc_extract the production page pipeline uses (profile
    dispatch inside), so gold-eval measures the exact deployed path."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from causalre_spark.model import batch as B

        for pdf in batches:
            out = {"doc_id": [], "spans": [], "rels": []}
            for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
                toks = [str(t) for t in toks]
                r = B.doc_extract(toks, cfg)
                spans = [
                    (int(s), int(e), str(ty), float(fs))
                    for s, e, ty, fs in zip(r["starts"], r["ends"],
                                            r["span_types"], r["filter_scores"])
                ]
                rels = [
                    (int(r["starts"][h]), int(r["ends"][h]),
                     int(r["starts"][t]), int(r["ends"][t]),
                     str(ty), float(sc))
                    for h, t, sc, ty in zip(r["rel_h"], r["rel_t"],
                                            r["rel_scores"], r["rel_types"])
                ]
                out["doc_id"].append(int(doc_id))
                out["spans"].append(spans)
                out["rels"].append(rels)
            yield pd.DataFrame(out)

    return udf


def load_gold_split(spark: SparkSession, dataset: str, split: str = "test",
                    cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """One reference dataset split, valid-span filtered (P1+P2) — the
    same preprocessing the reference trains/evals against."""
    _, splits = load_corpus_json(spark, REFERENCE_DATASETS[dataset])
    return filter_valid_spans(splits[split], cfg.max_seq_len, cfg.max_span_width)


# val doc_ids are offset into their own id space when train and val are
# unioned for a final-model fit: the reference reuses 0-based ids per
# split, and the fit operators group token sequences by doc — colliding
# ids would splice two documents into one chain.
VAL_DOC_OFFSET = 1_000_000


def load_gold_fit_split(spark: SparkSession, dataset: str,
                        cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """train ∪ val — the FINAL-model fit split for the fitted
    extractors (operators/fitted.py). Protocol: hyperparameters are
    selected on val with train-only fits, then the shipped model is
    refit on train ∪ val (standard select-then-refit); the test split
    never enters any fit or selection."""
    tr = load_gold_split(spark, dataset, "train", cfg)
    va = load_gold_split(spark, dataset, "val", cfg)
    return tr.unionByName(
        va.withColumn("doc_id", F.col("doc_id") + F.lit(VAL_DOC_OFFSET)))


def gold_span_table(split_df: DataFrame) -> DataFrame:
    """(url, start, end, type) — exploded gold spans; doc_id stringified
    to the operators' url key."""
    return (
        split_df.select(F.col("doc_id").cast("string").alias("url"),
                        F.explode("spans").alias("sp"))
        .select("url", F.col("sp.start").alias("start"),
                F.col("sp.end").alias("end"), F.col("sp.type").alias("type"))
    )


def gold_rel_table(split_df: DataFrame) -> DataFrame:
    """(url, h_start, h_end, t_start, t_end, rel_type) — relation
    endpoint indexes resolved to span coordinates (0-based array
    subscripts; relations already remapped onto the kept spans by
    filter_valid_spans)."""
    return (
        split_df.select(F.col("doc_id").cast("string").alias("url"),
                        F.explode("relations").alias("r"), "spans")
        .select(
            "url",
            F.expr("spans[r.head].start").alias("h_start"),
            F.expr("spans[r.head].end").alias("h_end"),
            F.expr("spans[r.tail].start").alias("t_start"),
            F.expr("spans[r.tail].end").alias("t_end"),
            F.col("r.type").alias("rel_type"),
        )
    )


def predict_split(split_df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Per-doc predictions (doc_id, spans, rels) via the deployed model."""
    return split_df.select("doc_id", "tokens").mapInPandas(
        make_predict_udf(cfg), schema=PRED_SCHEMA)


def pred_span_table(preds: DataFrame) -> DataFrame:
    return (
        preds.select(F.col("doc_id").cast("string").alias("url"),
                     F.explode("spans").alias("sp"))
        .select("url", F.col("sp.start").alias("start"),
                F.col("sp.end").alias("end"), F.col("sp.type").alias("type"))
    )


def pred_rel_table(preds: DataFrame) -> DataFrame:
    return (
        preds.select(F.col("doc_id").cast("string").alias("url"),
                     F.explode("rels").alias("r"))
        .select("url", F.col("r.h_start").alias("h_start"),
                F.col("r.h_end").alias("h_end"),
                F.col("r.t_start").alias("t_start"),
                F.col("r.t_end").alias("t_end"),
                F.col("r.type").alias("rel_type"))
    )


def evaluate(spark: SparkSession, dataset: str, split: str = "test",
             cfg: PipelineConfig | None = None) -> dict[str, DataFrame]:
    """Full gold eval: {'gold_spans','gold_rels','pred_spans','pred_rels',
    'metrics'} — metrics has one row per (task, matching) with
    tp/fp/fn/P/R/F1; loose rows use the reference's greedy semantics."""
    if cfg is None:
        cfg = PipelineConfig(model_profile="reference")
    split_df = load_gold_split(spark, dataset, split, cfg)
    gold_s, gold_r = gold_span_table(split_df), gold_rel_table(split_df)
    preds = predict_split(split_df, cfg).persist()
    pred_s, pred_r = pred_span_table(preds).persist(), pred_rel_table(preds)

    span_strict = M.strict_prf(gold_s, pred_s, ["url", "start", "end", "type"])
    rel_strict = M.strict_prf(
        gold_r, pred_r,
        ["url", "h_start", "h_end", "t_start", "t_end", "rel_type"])

    # A2 loose: greedy matched count -> P/R/F1 from (tp, n_gold, n_pred)
    def _loose_row(task: str, tp: int, n_gold: int, n_pred: int):
        prec = tp / max(n_pred, 1)
        rec = tp / max(n_gold, 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-12)
        return (task, "loose", tp, n_pred - tp, n_gold - tp,
                round(prec, 6), round(rec, 6), round(f1, 6))

    loose_sp_tp = (M.loose_match_spans(gold_s, pred_s, cfg)
                   .agg(F.sum("loose_tp")).collect()[0][0] or 0)
    loose_rl_tp = (M.loose_match_rels(gold_r, pred_r, cfg)
                   .agg(F.sum("loose_tp")).collect()[0][0] or 0)
    counts = {
        "gold_spans": gold_s.count(), "pred_spans": pred_s.count(),
        "gold_rels": gold_r.count(), "pred_rels": pred_r.count(),
    }
    rows = []
    for task, strict in (("span", span_strict), ("rel", rel_strict)):
        r = strict.collect()[0]
        rows.append((task, "strict", r.tp, r.fp, r.fn,
                     r.precision, r.recall, r.f1))
    rows.append(_loose_row("span", int(loose_sp_tp),
                           counts["gold_spans"], counts["pred_spans"]))
    rows.append(_loose_row("rel", int(loose_rl_tp),
                           counts["gold_rels"], counts["pred_rels"]))
    metrics = spark.createDataFrame(
        rows, "task string, matching string, tp long, fp long, fn long, "
              "precision double, recall double, f1 double")
    # preds/pred_s stay persisted: the returned tables all derive from
    # them and the model UDF must not re-run per consumer. The caller
    # releases via the returned handle when done.
    return {"split": split_df, "gold_spans": gold_s, "gold_rels": gold_r,
            "pred_spans": pred_s, "pred_rels": pred_r, "metrics": metrics,
            "counts": counts, "preds": preds}


def per_doc_counts(spark: SparkSession, dataset: str, split: str = "test",
                   cfg: PipelineConfig | None = None) -> DataFrame:
    """Per-document gold/pred/strict-TP counts — the oracle-checkable
    face of the gold eval: 88-101 rows whose value hash pins down (a)
    the JSON loader, (b) the deterministic frozen model, and (c) the
    relational strict matching, against fixtures frozen by
    tools/freeze_gold_eval.py (which DuckDB re-evaluates independently).

    Output: (doc_id, n_gold_spans, n_pred_spans, span_tp,
             n_gold_rels, n_pred_rels, rel_tp)."""
    if cfg is None:
        cfg = PipelineConfig(model_profile="reference")
    split_df = load_gold_split(spark, dataset, split, cfg)
    gold_s, gold_r = gold_span_table(split_df), gold_rel_table(split_df)
    preds = predict_split(split_df, cfg).persist()
    pred_s, pred_r = pred_span_table(preds), pred_rel_table(preds)
    span_keys = ["url", "start", "end", "type"]
    rel_keys = ["url", "h_start", "h_end", "t_start", "t_end", "rel_type"]

    def _cnt(df, name):
        return df.groupBy("url").agg(F.count(F.lit(1)).alias(name))

    span_tp = _cnt(gold_s.select(*span_keys).distinct()
                   .join(pred_s.select(*span_keys).distinct(), span_keys),
                   "span_tp")
    rel_tp = _cnt(gold_r.select(*rel_keys).distinct()
                  .join(pred_r.select(*rel_keys).distinct(), rel_keys),
                  "rel_tp")
    docs = split_df.select(F.col("doc_id").cast("string").alias("url"))
    out = docs
    for part, name in ((gold_s, "n_gold_spans"), (pred_s, "n_pred_spans"),
                       (span_tp, None), (gold_r, "n_gold_rels"),
                       (pred_r, "n_pred_rels"), (rel_tp, None)):
        agg = part if name is None else _cnt(part, name)
        out = out.join(agg, "url", "left")
    return out.select(
        F.col("url").cast("long").alias("doc_id"),
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
          for c in ("n_gold_spans", "n_pred_spans", "span_tp",
                    "n_gold_rels", "n_pred_rels", "rel_tp")])
