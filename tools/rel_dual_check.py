"""Dual val+CV gate for a PROPOSED REL_EXTRAS change vs the shipped
set — both halves deployment-matched (rel perceptron only, predicted
spans from the shipped span config).

The round-4 re-run of tools/sweep_rel_feats.py under the adopted
suf4+wl+psh2 conll04 span config proposed different greedy winners
than the shipped sets; this tool scores shipped vs proposed on
  val phase: fit TRAIN -> strict rel F1 on VAL over predicted val
      spans (train-only span fit),
  CV phase: 5-fold micro rel F1 over train ∪ val (cv_rel_extras
      machinery — span fit + rel fit per fold, doc_id % 5).
Adopt only if BOTH improve. The test split is never read.

Run:  python tools/rel_dual_check.py [conll04|custom]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from tools.cv_rel_extras import (  # noqa: E402
    K, REL_CHECKPOINTS, VAL_OFFSET, fit_decode_spans)
from tools.sweep_rel_feats import (  # noqa: E402
    load_split_rels, labeled_train_pairs, fit_rel_ipm_twin,
    predict_ptron, rel_prf, predicted_val_spans)
from tools.sweep_ptron_feats import load_split  # noqa: E402

# shipped (perceptron.REL_EXTRAS) vs the new-span-config sweep winners
ARMS = {
    "conll04": {"shipped": frozenset({"tbow", "hltl", "hbow", "fl"}),
                "cand": frozenset({"hltl", "tf", "hbow", "tbow"})},
    "custom": {"shipped": frozenset({"hfsh", "fl"}),
               "cand": frozenset({"hfsh", "hf", "fl"})},
}


def main():
    datasets = sys.argv[1:] or ["conll04", "custom"]
    for ds in datasets:
        arms = ARMS[ds]
        # ---- val phase (shared predicted spans) ----
        t0 = time.time()
        pv = predicted_val_spans(ds)
        train_pairs = labeled_train_pairs(load_split_rels(ds, "train"))
        val_docs = load_split_rels(ds, "val")
        val_best = {}
        for arm, extra in arms.items():
            snaps = fit_rel_ipm_twin(train_pairs, extra,
                                     REL_CHECKPOINTS)
            scores = {e: rel_prf(val_docs, pv,
                                 lambda t, s, W=W, x=extra:
                                 predict_ptron(t, s, W, x))[2]
                      for e, W in snaps.items()}
            val_best[arm] = max(scores.values())
            print(f"[{ds}] val {arm:8s} {scores}  "
                  f"best={val_best[arm]:.4f}", flush=True)
        print(f"[{ds}] val phase {time.time() - t0:.0f}s", flush=True)

        # ---- CV phase ----
        span_docs = load_split(ds, "train") + [
            (i + VAL_OFFSET, t, s) for i, t, s in load_split(ds, "val")]
        rel_docs = load_split_rels(ds, "train") + [
            (i + VAL_OFFSET, t, s, r)
            for i, t, s, r in load_split_rels(ds, "val")]
        agg = {a: {e: [0, 0, 0] for e in REL_CHECKPOINTS}
               for a in arms}
        for fold in range(K):
            t0 = time.time()
            fit_s = [d for d in span_docs if d[0] % K != fold]
            held_s = [d for d in span_docs if d[0] % K == fold]
            pred_spans = fit_decode_spans(ds, fit_s, held_s)
            fit_r = [d for d in rel_docs if d[0] % K != fold]
            held_r = [d for d in rel_docs if d[0] % K == fold]
            tp_fold = labeled_train_pairs(fit_r)
            for arm, extra in arms.items():
                snaps = fit_rel_ipm_twin(tp_fold, extra,
                                         REL_CHECKPOINTS)
                for e, W in snaps.items():
                    for doc_id, toks, _, rels in held_r:
                        gold = set(rels)
                        pred = set(predict_ptron(
                            toks, pred_spans.get(doc_id, []), W, extra))
                        agg[arm][e][0] += len(pred & gold)
                        agg[arm][e][1] += len(pred)
                        agg[arm][e][2] += len(gold)
            print(f"[{ds}] fold {fold + 1}/{K} done "
                  f"({time.time() - t0:.0f}s)", flush=True)
        cv_best = {}
        for arm in arms:
            f1s = {}
            for e, (tp, npred, ngold) in agg[arm].items():
                p = tp / max(npred, 1)
                r = tp / max(ngold, 1)
                f1s[e] = round(2 * p * r / max(p + r, 1e-12), 4)
            cv_best[arm] = max(f1s.values())
            print(f"[{ds}] cv  {arm:8s} {f1s}  "
                  f"best={cv_best[arm]:.4f}", flush=True)
        ok = (val_best["cand"] > val_best["shipped"]
              and cv_best["cand"] > cv_best["shipped"])
        print(f"[{ds}] cand {sorted(arms['cand'])}: "
              f"val {val_best['shipped']:.4f}->{val_best['cand']:.4f} "
              f"cv {cv_best['shipped']:.4f}->{cv_best['cand']:.4f}  "
              f"{'ADOPT' if ok else 'reject'}", flush=True)


if __name__ == "__main__":
    main()
