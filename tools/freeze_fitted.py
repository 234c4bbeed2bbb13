"""Freeze the fitted-HMM span predictions for the fitted_* DuckDB
oracles.

Writes fixtures/fitted/{ds}_pred_spans.parquet (url, start, end) — the
Viterbi-decoded spans of the test split under the train∪val-fitted
HMM (operators/fitted.py; selection on val, refit on train ∪ val). The HMM *fit* and the NB relation stage are
pure relational algebra, so their oracles recompute them END-TO-END in
DuckDB from the frozen raw splits (fixtures/gazetteer); the Viterbi
decode is the one per-doc DP step SQL cannot express, so its output is
frozen here and (a) read back by the fitted_spans_* oracles as a
determinism pin, (b) consumed by the fitted_eval_* oracles as the
span input to the fully-recomputed NB + eval chain. The independent
correctness gate for the decode itself is tests/test_fitted.py's
scalar-Python twin (exact span-set equality).

Run: python tools/freeze_fitted.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX = os.path.join(REPO, "fixtures", "fitted")


def main() -> None:
    from pyspark.sql import functions as F

    from causalre_spark import gold_eval as G
    from causalre_spark.operators import fitted as FT
    from causalre_spark.operators import gazetteer as GZ
    from causalre_spark.operators import metrics as M
    from causalre_spark.session import get_spark

    spark = get_spark(app="freeze_fitted", cores=8)
    os.makedirs(FIX, exist_ok=True)
    lines = [
        "",
        "## Fitted HMM + NB extractor (the next rung: sequence model +",
        "pair classifier, still 100% fit-by-aggregation on the gold",
        "train ∪ val splits)",
        "",
        "operators/fitted.py — span tagger = first-order BIES+O HMM",
        "(fit = one groupBy per count table; decode = per-doc Viterbi",
        "in an Arrow mapInPandas UDF, zero shuffle, with tempered NB",
        "prev/next-token context terms in the emissions); relations =",
        "3-class (none/fwd/bwd) Naive Bayes over between-text",
        "unigrams+bigrams, gap bucket, pair-adjacent tokens and each",
        "span's last token / shape / width, decided with a margin",
        "(MARGIN=1500 grid units) and frequency floor (MIN_DF=3).",
        "Protocol: ALL hyperparameters (CTX_LAMBDA, HMM_M, features,",
        "MIN_DF, MARGIN) are selected on the VAL splits — never test —",
        "and the shipped model is refit on train ∪ val (standard",
        "select-then-refit). Integer-grid log",
        "weights keep fit AND inference exact BIGINT DataFrame algebra",
        "(DuckDB oracle recomputes them end-to-end). Strict rows are the",
        "oracle-gated fitted_eval_* queries; loose rows reuse the A2",
        "operators. This lifts rel F1 off 0.0 on BOTH gold test splits",
        "(VERDICT r03 next-round #1).",
        "",
        "| dataset | task | matching | tp | fp | fn | P | R | F1 |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for ds in G.REFERENCE_DATASETS:
        train = G.load_gold_fit_split(spark, ds)  # train ∪ val
        test = G.load_gold_split(spark, ds, "test")
        model = FT.collect_hmm_model(FT.fit_hmm(train))
        spans = FT.decode_spans(test, model)
        out = os.path.join(FIX, f"{ds}_pred_spans.parquet")
        # single deterministic file (tiny: a few hundred rows)
        pdf = spans.toPandas().sort_values(
            ["url", "start", "end"]).reset_index(drop=True)
        import pyarrow as pa
        import pyarrow.parquet as pq
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), out)
        print(f"froze {out}: {len(pdf)} spans")

        # measured scores -> BENCH/GOLD_EVAL.md addendum (strict via the
        # oracle-gated query, loose via the shared A2 operators)
        from causalre_spark.plans.entry_queries import QUERIES
        strict = {r.task: r
                  for r in QUERIES[f"fitted_eval_{ds}"](spark, "").collect()}
        for task in ("span", "rel"):
            r = strict[task]
            lines.append(f"| {ds} | {task} | strict | {r.tp} | {r.fp} "
                         f"| {r.fn} | {r.precision} | {r.recall} "
                         f"| {r.f1} |")
        pred_s = (spans.crossJoin(
            F.broadcast(FT.majority_span_type(train))).persist())
        weights, priors = FT.fit_rel_nb(train)
        pred_r = FT.predict_rels_nb(spans, test, weights, priors,
                                    GZ.majority_rel_type(train))
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
    marker = "\n## Fitted HMM + NB extractor"
    if marker in text:
        text = text.split(marker)[0]
    with open(md, "w") as f:
        f.write(text.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print("updated BENCH/GOLD_EVAL.md")


if __name__ == "__main__":
    main()
