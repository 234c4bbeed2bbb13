"""5-fold CV confirmation for the SHIPPED relation-perceptron extras
(perceptron.REL_EXTRAS) — the missing CV half of the dual adoption
gate. The extras were selected on the val split only
(tools/sweep_rel_feats.py greedy-forward + val_rel_ab production A/B);
protocol requires val AND CV agreement, so this tool re-scores base vs
shipped extras with 5-fold CV over train ∪ val, deployment-matched:

  per fold (doc_id % 5): fit the span perceptron on the fit part
      (conll04 stacks cross-fit gazetteer flags exactly like
      perceptron.fit_ipm(gaz_folds=5); held-out decode uses the
      fit-part full lexicon), decode spans for the held part; fit the
      rel IPM-perceptron twin on the fit part's gold-span candidate
      pairs; score strict oriented rel F1 on the held part over the
      PREDICTED held spans (freeze_rel_perceptron.py's criterion).

Predicted held spans are computed once per fold and shared by every
rel arm, so the span cost does not multiply. Micro-aggregated across
folds. The test split is never read.

Run:  python tools/cv_rel_extras.py [conll04|custom]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from tools.exp_gaz_stack import build_lex, gaz_flags, index_lex  # noqa: E402
from tools.sweep_ptron_feats import (  # noqa: E402
    load_split, make_feats, _shape, viterbi, tags_to_spans,
    spans_to_tags, P)
from tools.sweep_rel_feats import (  # noqa: E402
    SPAN_EXTRAS, SPAN_EPOCHS, SPAN_GAZ, load_split_rels,
    labeled_train_pairs, fit_rel_ipm_twin, predict_ptron)

K = 5
REL_CHECKPOINTS = (8, 12, 20, 30, 40)
# shipped deployment arms (must track perceptron.REL_EXTRAS)
REL_EXTRAS = {"conll04": ("tbow", "hltl", "hbow", "fl"),
              "custom": ("hfsh", "fl")}


def fit_decode_spans(ds, fit_docs, held_docs):
    """Span-perceptron fit on ``fit_docs`` -> {doc_id: spans} for
    ``held_docs`` — predicted_val_spans generalized to arbitrary
    fit/held doc lists (same IPM twin, same gaz stacking)."""
    feats = make_feats(SPAN_EXTRAS[ds])
    epochs = SPAN_EPOCHS[ds]
    use_gaz = SPAN_GAZ.get(ds, False)
    fold_idx = {k: index_lex(build_lex(
        [d for d in fit_docs if d[0] % K != k])) for k in range(K)} \
        if use_gaz else None
    full_idx = index_lex(build_lex(fit_docs)) if use_gaz else None

    def fs_for(toks, idx):
        shapes = [_shape(w) for w in toks]
        fs_doc = [feats(toks, shapes, i) for i in range(len(toks))]
        if idx is not None:
            for i, fl in enumerate(gaz_flags(toks, idx)):
                fs_doc[i] += [("gz", t) for t in sorted(fl)]
        return fs_doc

    shards = defaultdict(list)
    for doc_id, toks, spans in sorted(fit_docs):
        fs_doc = fs_for(toks, fold_idx[doc_id % K] if use_gaz else None)
        shards[doc_id % P].append((fs_doc,
                                   spans_to_tags(len(toks), spans)))
    W, Wt = {}, {}
    avgW, avgWt = defaultdict(int), defaultdict(int)
    for _ in range(epochs):
        dW, dWt = defaultdict(int), defaultdict(int)
        for sh in range(P):
            lw, lwt = dict(W), dict(Wt)
            for fs_doc, gold in shards.get(sh, []):
                pred = viterbi(fs_doc, lw, lwt)
                if pred == gold:
                    continue
                for i, fs in enumerate(fs_doc):
                    if pred[i] == gold[i]:
                        continue
                    for f in fs:
                        for s, d in ((gold[i], P), (pred[i], -P)):
                            dW[(f, s)] += d
                            lw[(f, s)] = lw.get((f, s), 0) + d
                for i in range(1, len(gold)):
                    gt, pt = (gold[i - 1], gold[i]), \
                             (pred[i - 1], pred[i])
                    if gt != pt:
                        for k, d in ((gt, P), (pt, -P)):
                            dWt[k] += d
                            lwt[k] = lwt.get(k, 0) + d
        for k, v in dW.items():
            m = v // P
            if m:
                W[k] = W.get(k, 0) + m
        for k, v in dWt.items():
            m = v // P
            if m:
                Wt[k] = Wt.get(k, 0) + m
        for k, v in W.items():
            avgW[k] += v
        for k, v in Wt.items():
            avgWt[k] += v
    return {doc_id: tags_to_spans(viterbi(fs_for(toks, full_idx),
                                          avgW, avgWt))
            for doc_id, toks, _ in held_docs}


# load_split/load_split_rels restart doc_ids at 0 per split, and this
# tool keys pred_spans by doc_id across train ∪ val — offset the val
# ids to disambiguate. 1e6 is divisible by K=5 and P=8, so fold and
# IPM-shard assignment match the un-offset ids cv_gaz_check used.
VAL_OFFSET = 1_000_000


def main():
    datasets = sys.argv[1:] or ["conll04", "custom"]
    for ds in datasets:
        span_docs = load_split(ds, "train") + [
            (i + VAL_OFFSET, t, s) for i, t, s in load_split(ds, "val")]
        rel_docs = load_split_rels(ds, "train") + [
            (i + VAL_OFFSET, t, s, r)
            for i, t, s, r in load_split_rels(ds, "val")]
        arms = {"base": frozenset(),
                "shipped": frozenset(REL_EXTRAS[ds])}
        # micro tallies per arm per epoch: [tp, npred, ngold]
        agg = {a: {e: [0, 0, 0] for e in REL_CHECKPOINTS}
               for a in arms}
        for fold in range(K):
            t0 = time.time()
            fit_s = [d for d in span_docs if d[0] % K != fold]
            held_s = [d for d in span_docs if d[0] % K == fold]
            pred_spans = fit_decode_spans(ds, fit_s, held_s)
            fit_r = [d for d in rel_docs if d[0] % K != fold]
            held_r = [d for d in rel_docs if d[0] % K == fold]
            train_pairs = labeled_train_pairs(fit_r)
            for arm, extra in arms.items():
                snaps = fit_rel_ipm_twin(train_pairs, extra,
                                         REL_CHECKPOINTS)
                for e, W in snaps.items():
                    for doc_id, toks, _, rels in held_r:
                        gold = set(rels)
                        pred = set(predict_ptron(
                            toks, pred_spans.get(doc_id, []), W,
                            extra))
                        agg[arm][e][0] += len(pred & gold)
                        agg[arm][e][1] += len(pred)
                        agg[arm][e][2] += len(gold)
            print(f"[{ds}] fold {fold + 1}/{K} done "
                  f"({time.time() - t0:.0f}s)", flush=True)

        def f1s(tallies):
            out = {}
            for e, (tp, npred, ngold) in tallies.items():
                p = tp / max(npred, 1)
                r = tp / max(ngold, 1)
                out[e] = round(2 * p * r / max(p + r, 1e-12), 4)
            return out

        res = {a: f1s(agg[a]) for a in arms}
        for a in arms:
            print(f"[{ds}] cv {a:8s} {res[a]}  "
                  f"best={max(res[a].values()):.4f}", flush=True)
        bb, sb = max(res["base"].values()), max(res["shipped"].values())
        verdict = "CONFIRMED" if sb > bb else "NOT CONFIRMED"
        print(f"[{ds}] shipped extras {sorted(REL_EXTRAS[ds])}: "
              f"cv base {bb:.4f} -> shipped {sb:.4f}  {verdict}",
              flush=True)


if __name__ == "__main__":
    main()
