"""Dual val+CV adoption gate for TOKEN-CONDITIONED TRANSITION kinds
(perceptron.TR_KINDS: trw/trpw/trsh/trpsh) on top of the shipped span
config — the round-5 candidate family VERDICT r04 recorded as the one
untried lever (all emission-extra rounds are converged).

Semantics are deployment-exact twins of operators/perceptron.py: the
transition score p->s at position i adds Wt[((kind, val_i), p, s)] for
each conditioned kind, and the update fires iff the gold and predicted
transitions differ (the sequence-level perceptron update). Fit is the
same exact scaled-integer IPM (8 doc_id%8 shards, step=8, //8 mixing,
running average) as tools/exp_gaz_stack.fit_eval_items.

Protocol (the cv_span_extras.py dual gate):
  val phase: fit TRAIN, score strict span F1 on VAL (conll04 arms use
      5-fold cross-fit gazetteer lexicons train-side + full-train
      lexicon val-side, matching SPAN_GAZ deployment).
  CV phase: 5-fold micro-F1 over train ∪ val (folds = doc_id % 5,
      inner cross-fit lexicons rebuilt per fold).
Adopt only if BOTH best-val and best-CV beat the shipped config.
The test split is never read.

Run:  python tools/cv_span_trans.py [conll04|custom] [arm ...]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from tools.exp_gaz_stack import build_lex, gaz_flags, index_lex  # noqa: E402
from tools.sweep_ptron_feats import (  # noqa: E402
    LEGAL, P, START_OK, END_OK, STATES, _SI, _shape, load_split,
    make_feats, spans_to_tags, tags_to_spans)

CHECKPOINTS = (35, 50, 70)
K = 5
TR_KINDS = ("trw", "trpw", "trsh", "trpsh")
# deployment config (tracks operators/perceptron.py)
from causalre_spark.operators import perceptron as _PT  # noqa: E402

SPAN_GAZ = dict(_PT.SPAN_GAZ)
BASE = {ds: frozenset(v) for ds, v in _PT.SPAN_EXTRAS.items()}


def make_trfeats(extras: frozenset):
    """Conditioned-transition feature fn (toks, shapes, i) for i>=1 —
    twin of perceptron._tr_feats."""
    def trf(toks, shapes, i):
        fs = []
        if "trsh" in extras:
            fs.append(("trsh", shapes[i]))
        if "trpsh" in extras:
            fs.append(("trpsh", shapes[i - 1]))
        if "trw" in extras:
            fs.append(("trw", toks[i]))
        if "trpw" in extras:
            fs.append(("trpw", toks[i - 1]))
        return fs
    return trf


def featurize_tr(docs, base_feats, trfeats, byfirst_for_doc, with_gaz):
    """[(doc_id, fs_doc, trf_doc, gold_tags, gold_span_set)]."""
    out = []
    for doc_id, toks, spans in docs:
        shapes = [_shape(w) for w in toks]
        fs_doc = [base_feats(toks, shapes, i) for i in range(len(toks))]
        trf_doc = [None] + [trfeats(toks, shapes, i)
                            for i in range(1, len(toks))]
        if with_gaz:
            flags = gaz_flags(toks, byfirst_for_doc(doc_id))
            for i, fl in enumerate(flags):
                for t in sorted(fl):
                    fs_doc[i].append(("gz", t))
        out.append((doc_id, fs_doc, trf_doc,
                    spans_to_tags(len(toks), spans), set(spans)))
    return out


def viterbi_tr(fs_doc, trf_doc, W, Wt):
    n = len(fs_doc)
    emis = [[sum(W.get((f, s), 0) for f in fs) for s in STATES]
            for fs in fs_doc]
    NEG = float("-inf")
    dp = [[NEG] * 5 for _ in range(n)]
    bp = [[0] * 5 for _ in range(n)]
    for s in START_OK:
        dp[0][_SI[s]] = emis[0][_SI[s]]
    for i in range(1, n):
        tf = trf_doc[i]
        for s in STATES:
            si = _SI[s]
            best, barg = NEG, -1
            for p in STATES:
                if (p, s) not in LEGAL:
                    continue
                v = dp[i - 1][_SI[p]]
                if v == NEG:
                    continue
                v = v + Wt.get((p, s), 0)
                for f in tf:
                    v += Wt.get((f, p, s), 0)
                if v > best:
                    best, barg = v, _SI[p]
            if barg >= 0:
                dp[i][si] = best + emis[i][si]
                bp[i][si] = barg
    ends = [_SI[s] for s in END_OK if dp[n - 1][_SI[s]] > NEG]
    if not ends:
        return ["O"] * n
    last = max(ends, key=lambda si: (dp[n - 1][si], -si))
    seq = [last]
    for i in range(n - 1, 0, -1):
        seq.append(bp[i][seq[-1]])
    seq.reverse()
    return [STATES[si] for si in seq]


def fit_eval_tr(train_items, val_items, checkpoints):
    shards = defaultdict(list)
    for doc_id, fs_doc, trf_doc, gold, _ in sorted(train_items):
        shards[doc_id % P].append((fs_doc, trf_doc, gold))
    n_gold = sum(len(g) for _, _, _, _, g in val_items)

    W, Wt = {}, {}
    avgW, avgWt = defaultdict(int), defaultdict(int)
    results = {}
    for epoch in range(1, max(checkpoints) + 1):
        dW, dWt = defaultdict(int), defaultdict(int)
        for sh in range(P):
            lw, lwt = dict(W), dict(Wt)
            for fs_doc, trf_doc, gold in shards.get(sh, []):
                pred = viterbi_tr(fs_doc, trf_doc, lw, lwt)
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
                    gt, pt = (gold[i - 1], gold[i]), (pred[i - 1], pred[i])
                    if gt != pt:
                        ups = [(gt, P), (pt, -P)]
                        for f in trf_doc[i]:
                            ups.append(((f,) + gt, P))
                            ups.append(((f,) + pt, -P))
                        for k, d in ups:
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
        if epoch in checkpoints:
            tp = fp = 0
            for _, fs_doc, trf_doc, _, gold_set in val_items:
                pred = set(tags_to_spans(
                    viterbi_tr(fs_doc, trf_doc, avgW, avgWt)))
                tp += len(pred & gold_set)
                fp += len(pred - gold_set)
            prec = tp / max(tp + fp, 1)
            rec = tp / max(n_gold, 1)
            f1 = 2 * prec * rec / max(prec + rec, 1e-12)
            results[epoch] = (round(prec, 4), round(rec, 4), round(f1, 4))
    return results


def _val_arm(ds, extras, train, val, fold_idx, full_idx):
    feats = make_feats(extras)
    trfeats = make_trfeats(extras)
    gaz = SPAN_GAZ[ds]
    if gaz:
        tr = featurize_tr(train, feats, trfeats,
                          lambda d: fold_idx[d % K], True)
        va = featurize_tr(val, feats, trfeats, lambda d: full_idx, True)
    else:
        tr = featurize_tr(train, feats, trfeats, None, False)
        va = featurize_tr(val, feats, trfeats, None, False)
    return fit_eval_tr(tr, va, CHECKPOINTS)


def _cv_arm(ds, extras, docs):
    feats = make_feats(extras)
    trfeats = make_trfeats(extras)
    gaz = SPAN_GAZ[ds]
    agg = {e: [0.0, 0.0, 0] for e in CHECKPOINTS}
    for fold in range(K):
        fit = [d for d in docs if d[0] % K != fold]
        held = [d for d in docs if d[0] % K == fold]
        if gaz:
            inner = {k: index_lex(build_lex(
                [d for d in fit if d[0] % K != k])) for k in range(K)}
            full = index_lex(build_lex(fit))
            tr = featurize_tr(fit, feats, trfeats,
                              lambda d: inner[d % K], True)
            va = featurize_tr(held, feats, trfeats, lambda d: full, True)
        else:
            tr = featurize_tr(fit, feats, trfeats, None, False)
            va = featurize_tr(held, feats, trfeats, None, False)
        r = fit_eval_tr(tr, va, CHECKPOINTS)
        ngold = sum(len(g) for _, _, _, _, g in va)
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
    argv = sys.argv[1:]
    datasets = [a for a in argv if a in ("conll04", "custom")] or \
        ["conll04", "custom"]
    only = [a for a in argv if a in TR_KINDS]
    kinds = only or list(TR_KINDS)
    for ds in datasets:
        train = load_split(ds, "train")
        val = load_split(ds, "val")
        docs = train + val
        full_idx = index_lex(build_lex(train))
        fold_idx = {k: index_lex(build_lex(
            [d for d in train if d[0] % K != k])) for k in range(K)}

        best = {}
        arms = [BASE[ds]] + [BASE[ds] | {k} for k in kinds]
        for extras in arms:
            lab = "base" if extras == BASE[ds] else \
                "+".join(sorted(extras - BASE[ds]))
            t0 = time.time()
            rv = _val_arm(ds, extras, train, val, fold_idx, full_idx)
            vbest = max(f1 for _, _, f1 in rv.values())
            print(f"[{ds}] val {lab:8s} {rv}  best={vbest:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            t0 = time.time()
            rc = _cv_arm(ds, extras, docs)
            cbest = max(rc.values())
            print(f"[{ds}] cv  {lab:8s} {rc}  best={cbest:.4f} "
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
