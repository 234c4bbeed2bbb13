"""5-fold CV confirmation gate for the stacked-gazetteer span feature
(the second half of the repo's dual val+CV adoption check — the same
discipline as the perceptron-vs-HMM model choice in
tools/freeze_perceptron.py). Folds = doc_id % 5 over train ∪ val; each
fold is held out once, the fit runs on the other four (with the gaz
config's own INNER cross-fit folds over the fit subset), and held-out
docs are decoded with the fit subset's full lexicon. The test split is
never read.

Run:  python tools/cv_gaz_check.py [conll04|custom]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from tools.exp_gaz_stack import (  # noqa: E402
    build_lex, featurize, fit_eval_items, index_lex)
from tools.sweep_ptron_feats import load_split, make_feats  # noqa: E402

CHECKPOINTS = (35, 50, 70)
K = 5


def main():
    datasets = sys.argv[1:] or ["conll04"]
    base_feats = make_feats(frozenset())
    for ds in datasets:
        docs = load_split(ds, "train") + load_split(ds, "val")
        for use_gaz in (False, True):
            t0 = time.time()
            agg = {e: [0, 0, 0] for e in CHECKPOINTS}  # tp, npred, ngold
            for fold in range(K):
                fit = [d for d in docs if d[0] % K != fold]
                held = [d for d in docs if d[0] % K == fold]
                if use_gaz:
                    inner = {k: index_lex(build_lex(
                        [d for d in fit if d[0] % K != k]))
                        for k in range(K)}
                    full = index_lex(build_lex(fit))
                    tr = featurize(fit, base_feats,
                                   lambda d: inner[d % K], True, False)
                    va = featurize(held, base_feats,
                                   lambda d: full, True, False)
                else:
                    tr = featurize(fit, base_feats, None, False, False)
                    va = featurize(held, base_feats, None, False, False)
                # fit_eval_items reports P/R/F1 per checkpoint; we need
                # raw counts to micro-average across folds, so recompute
                # from its P/R output: tp = P*npred = R*ngold. Simpler:
                # use its F1 on each fold and also accumulate micro via
                # the returned (P, R) and fold sizes.
                r = fit_eval_items(tr, va, CHECKPOINTS)
                ngold = sum(len(g) for _, _, _, g in va)
                for e, (p, rec, f1) in r.items():
                    tp = rec * ngold
                    npred = tp / p if p > 0 else 0
                    agg[e][0] += tp
                    agg[e][1] += npred
                    agg[e][2] += ngold
            lab = "gaz" if use_gaz else "base"
            for e in CHECKPOINTS:
                tp, npred, ngold = agg[e]
                p = tp / max(npred, 1e-9)
                rec = tp / max(ngold, 1e-9)
                f1 = 2 * p * rec / max(p + rec, 1e-12)
                print(f"[{ds}] {lab:4s} @ {e:3d}: micro-F1 "
                      f"{f1:.4f} (P {p:.4f} R {rec:.4f})", flush=True)
            print(f"[{ds}] {lab} done in {time.time()-t0:.0f}s",
                  flush=True)


if __name__ == "__main__":
    main()
