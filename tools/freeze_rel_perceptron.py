"""Freeze the relation perceptron's weights for the ptron_full_eval_*
DuckDB oracles, and append the all-perceptron section to
BENCH/GOLD_EVAL.md.

Writes fixtures/perceptron/{ds}_rel_weights.parquet
(kind, val, w_neg, w_fwd, w_bwd). Only the iterative FIT is frozen —
inference (pair gen, features, weight sums, argmax) is pure DataFrame
algebra that the oracle recomputes end-to-end in SQL, so this fixture
is a model dimension, not a result pin.

Selection protocol (never test): rel classifier chosen over the NB on
the VAL splits by rel F1 over PREDICTED val spans from a train-only
span fit (rel-ptron 0.361 vs NB 0.334 conll04; 0.222 vs 0.180 custom);
epochs = perceptron.REL_EPOCHS from the same sweep; final weights refit
on train ∪ val. The REL_EXTRAS kinds (val-selected greedy-forward,
tools/sweep_rel_feats.py) are CONFIRMED by the CV half of the dual
gate (tools/cv_rel_extras.py, 5-fold over train∪val, deployment-
matched chain INCLUDING the adopted suf4+wl+psh2 conll04 span
config): conll04 base 0.4431 -> shipped 0.4627, custom 0.1759 ->
0.1782 — both arms improve, adoption stands (the confirmation also
held under the two earlier span configs: 0.4301 -> 0.4480 and
0.4314 -> 0.4514).

Run AFTER tools/freeze_perceptron.py (needs the frozen span fixtures):
python tools/freeze_rel_perceptron.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX = os.path.join(REPO, "fixtures", "perceptron")

HEADER = [
    "",
    "## All-perceptron extractor (perceptron spans + perceptron",
    "relations) — the best fitted decision surfaces in this repo",
    "",
    "operators/perceptron.py fit_rel_ipm/predict_rels_ptron — a",
    "multiclass (none/fwd/bwd) averaged perceptron over the NB pair",
    "feature kinds (between-text unigrams/bigrams, gap bucket,",
    "pair-adjacent and span-edge tokens/shapes/widths) plus a bias",
    "feature and the dataset's val-selected extra kinds",
    "(perceptron.REL_EXTRAS: conll04 tbow/hltl/hbow/tf, custom",
    "hfsh+tfsh/hf/fl — greedy-forward over tools/sweep_rel_feats.py's",
    "candidate set re-swept under the adopted suf4+wl+psh2 span",
    "config, dual-gated val+CV by tools/rel_dual_check.py (conll04",
    "val 0.4180 -> 0.4198 / CV 0.4627 -> 0.4674 @40; custom val",
    "0.2345 -> 0.2429 / CV 0.1759 -> 0.1781, epochs 30 -> 40) and",
    "confirmed by the production-exact tools/val_rel_ab.py A/B",
    "(prior -> selected: conll04 0.4000 -> 0.4141, custom 0.2378 ->",
    "0.2411)), fitted with the same exact",
    "scaled-integer IPM as the span tagger. Selection on VAL by rel",
    "F1 over PREDICTED val spans from a train-only span fit — the",
    "deployment-matched criterion — picks the perceptron over the NB",
    "on BOTH datasets; epochs from the same sweep",
    "(perceptron.REL_EPOCHS); refit on train ∪ val.",
    "Inference is pure BIGINT DataFrame algebra, so the",
    "ptron_full_eval_* oracles recompute pair gen + features + weight",
    "sums + argmax + eval END-TO-END in SQL from the frozen weights;",
    "fit exactness is gated by the scalar twin in",
    "tests/test_perceptron.py. Strict rows below are the oracle-gated",
    "queries; loose rows reuse the A2 operators.",
    "",
    "| dataset | task | matching | tp | fp | fn | P | R | F1 |",
    "|---|---|---|---|---|---|---|---|---|",
]


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from causalre_spark import gold_eval as G
    from causalre_spark.operators import fitted as FT
    from causalre_spark.operators import gazetteer as GZ
    from causalre_spark.operators import metrics as M
    from causalre_spark.operators import perceptron as PT
    from causalre_spark.session import get_spark

    spark = get_spark(app="freeze_rel_perceptron", cores=8)
    lines = list(HEADER)
    for ds in G.REFERENCE_DATASETS:
        train = G.load_gold_fit_split(spark, ds)  # train ∪ val
        test = G.load_gold_split(spark, ds, "test")
        W = PT.fit_rel_ipm(train, epochs=PT.REL_EPOCHS[ds],
                           extras=PT.REL_EXTRAS[ds])
        rows = PT.rel_weights_to_rows(W)
        wt = pa.table({
            "kind": [r[0] for r in rows],
            "val": [r[1] for r in rows],
            "w_neg": pa.array([r[2] for r in rows], type=pa.int64()),
            "w_fwd": pa.array([r[3] for r in rows], type=pa.int64()),
            "w_bwd": pa.array([r[4] for r in rows], type=pa.int64()),
        })
        wout = os.path.join(FIX, f"{ds}_rel_weights.parquet")
        pq.write_table(wt, wout)
        print(f"froze {wout}: {len(rows)} weights")

        from causalre_spark.plans.entry_queries import QUERIES
        strict = {r.task: r for r in
                  QUERIES[f"ptron_full_eval_{ds}"](spark, "").collect()}
        for task in ("span", "rel"):
            r = strict[task]
            lines.append(f"| {ds} | {task} | strict | {r.tp} | {r.fp} "
                         f"| {r.fn} | {r.precision} | {r.recall} "
                         f"| {r.f1} |")
        # loose rows via the shared A2 operators over the same artifacts
        sw, swt = PT.load_frozen_weights(
            os.path.join(FIX, f"{ds}_weights.parquet"))
        spans = PT.decode_spans(test, sw, swt,
                                gaz=PT.frozen_gaz_for(ds, FIX),
                                extras=PT.SPAN_EXTRAS[ds])
        pred_u = spark.createDataFrame(spans.collect(), schema=spans.schema)
        pred_s = pred_u.crossJoin(
            F.broadcast(FT.majority_span_type(train))).persist()
        rel_w = spark.read.parquet(wout)
        pred_r = PT.predict_rels_ptron(pred_u, test, rel_w,
                                       GZ.majority_rel_type(train),
                                       extras=PT.REL_EXTRAS[ds])
        gold_s, gold_r = G.gold_span_table(test), G.gold_rel_table(test)
        for task, gold, pred, op in (
                ("span", gold_s, pred_s, M.loose_match_spans),
                ("rel", gold_r, pred_r, M.loose_match_rels)):
            tp = int(op(gold, pred).agg(F.sum("loose_tp"))
                     .collect()[0][0] or 0)
            n_gold, n_pred = gold.count(), pred.count()
            prec, rec = tp / max(n_pred, 1), tp / max(n_gold, 1)
            f1 = 2 * prec * rec / max(prec + rec, 1e-12)
            lines.append(f"| {ds} | {task} | loose | {tp} "
                         f"| {n_pred - tp} | {n_gold - tp} "
                         f"| {round(prec, 4)} | {round(rec, 4)} "
                         f"| {round(f1, 4)} |")
        pred_s.unpersist()
    md = os.path.join(REPO, "BENCH", "GOLD_EVAL.md")
    text = open(md).read()
    marker = "\n## All-perceptron extractor"
    if marker in text:
        text = text.split(marker)[0]
    with open(md, "w") as f:
        f.write(text.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print("updated BENCH/GOLD_EVAL.md")


if __name__ == "__main__":
    main()
