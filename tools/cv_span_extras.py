"""Dual val+CV adoption gate for span-perceptron feature EXTRAS on top
of the shipped deployment config (baseline 10 kinds + per-dataset gaz
stacking, operators/perceptron.py SPAN_GAZ).

The round-4 val-only sweep (tools/sweep_ptron_feats.py) selected
custom +pre3 and conll04 +suf4+wl — but WITHOUT gaz in the conll04 arm
(it predates gaz adoption) and without the CV half of the dual gate.
This tool re-runs both halves deployment-matched:

  val phase: fit TRAIN, score VAL (gaz arms use 5-fold cross-fit
      train-side lexicons + full-train lexicon val-side, exactly
      tools/exp_gaz_stack.py), for baseline-config vs each candidate
      extras set, epochs {35, 50, 70}.
  CV phase: 5-fold micro-F1 over train ∪ val (folds = doc_id % 5,
      gaz arms rebuild inner cross-fit lexicons per fold, exactly
      tools/cv_gaz_check.py) for the same arms.

Adopt an extras set only if BOTH its best-val F1 and best-CV F1 beat
the baseline config's. The test split is never read.

Run:  python tools/cv_span_extras.py [conll04|custom]
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
# deployment config (must track operators/perceptron.py SPAN_GAZ)
SPAN_GAZ = {"conll04": True, "custom": False}
# BASE = the shipped extras config (perceptron.SPAN_EXTRAS); every
# candidate arm is judged against it on BOTH signals. Round-4
# history: round 1 (base=()) — conll04 suf4+wl ADOPTED (val 0.8105
# -> 0.8146, CV 0.8158 -> 0.8236; suf4 / wl alone fail val), custom
# pre3 (CV 0.3717 -> 0.3673) and pre3+psh2 (val 0.4299 -> 0.4289)
# rejected. Round 2 (base=suf4+wl) — conll04 +psh2 ADOPTED (val
# 0.8146 -> 0.8185, CV 0.8236 -> 0.8244); +pre3/+lw/+shtri and all
# six custom singletons (lw/shtri/wnw/skip/nsh2/pshw) rejected.
BASE = {"conll04": frozenset({"suf4", "wl", "psh2"}),
        "custom": frozenset()}
# next greedy round's candidate arms (edit per round; kinds must
# exist in sweep_ptron_feats.make_feats)
ARMS = {
    "conll04": [BASE["conll04"] | {x}
                for x in ("pre3", "lw", "shtri")],
    "custom": [frozenset({x}) for x in ("pw2", "nw2", "suf4", "wl")],
}


def _val_arm(ds: str, extras: frozenset, train, val,
             fold_idx, full_idx) -> dict:
    feats = make_feats(extras)
    gaz = SPAN_GAZ[ds]
    if gaz:
        tr = featurize(train, feats, lambda d: fold_idx[d % K], True,
                       False)
        va = featurize(val, feats, lambda d: full_idx, True, False)
    else:
        tr = featurize(train, feats, None, False, False)
        va = featurize(val, feats, None, False, False)
    return fit_eval_items(tr, va, CHECKPOINTS)


def _cv_arm(ds: str, extras: frozenset, docs) -> dict:
    feats = make_feats(extras)
    gaz = SPAN_GAZ[ds]
    agg = {e: [0.0, 0.0, 0] for e in CHECKPOINTS}  # tp, npred, ngold
    for fold in range(K):
        fit = [d for d in docs if d[0] % K != fold]
        held = [d for d in docs if d[0] % K == fold]
        if gaz:
            inner = {k: index_lex(build_lex(
                [d for d in fit if d[0] % K != k])) for k in range(K)}
            full = index_lex(build_lex(fit))
            tr = featurize(fit, feats, lambda d: inner[d % K], True,
                           False)
            va = featurize(held, feats, lambda d: full, True, False)
        else:
            tr = featurize(fit, feats, None, False, False)
            va = featurize(held, feats, None, False, False)
        r = fit_eval_items(tr, va, CHECKPOINTS)
        ngold = sum(len(g) for _, _, _, g in va)
        for e, (p, rec, _f1) in r.items():
            tp = rec * ngold
            agg[e][0] += tp
            agg[e][1] += tp / p if p > 0 else 0
            agg[e][2] += ngold
    out = {}
    for e in CHECKPOINTS:
        tp, npred, ngold = agg[e]
        p = tp / max(npred, 1e-9)
        rec = tp / max(ngold, 1e-9)
        out[e] = round(2 * p * rec / max(p + rec, 1e-12), 4)
    return out


def main():
    datasets = sys.argv[1:] or ["conll04", "custom"]
    for ds in datasets:
        train = load_split(ds, "train")
        val = load_split(ds, "val")
        docs = train + val
        full_idx = index_lex(build_lex(train))
        fold_idx = {k: index_lex(build_lex(
            [d for d in train if d[0] % K != k])) for k in range(K)}

        best = {}
        for extras in [BASE[ds]] + ARMS[ds]:
            lab = "base" if extras == BASE[ds] else \
                "+".join(sorted(extras)) or "base"
            t0 = time.time()
            rv = _val_arm(ds, extras, train, val, fold_idx, full_idx)
            vbest = max(f1 for _, _, f1 in rv.values())
            print(f"[{ds}] val {lab:12s} {rv}  best={vbest:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            t0 = time.time()
            rc = _cv_arm(ds, extras, docs)
            cbest = max(rc.values())
            print(f"[{ds}] cv  {lab:12s} {rc}  best={cbest:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            best[lab] = (vbest, cbest)
        bv, bc = best["base"]
        for lab, (v, c) in best.items():
            if lab == "base":
                continue
            verdict = "ADOPT" if (v > bv and c > bc) else "reject"
            print(f"[{ds}] {lab}: val {bv:.4f}->{v:.4f} "
                  f"cv {bc:.4f}->{c:.4f}  {verdict}", flush=True)


if __name__ == "__main__":
    main()
