"""Val-split experiment: does stacking CROSS-FIT gazetteer membership
flags into the span perceptron's feature set lift val span F1?

Protocol guard (same as tools/sweep_ptron_feats.py): fits on TRAIN
only, evaluates strict span F1 on VAL only; the test split is never
read. Train-side gazetteer features are 5-fold CROSS-FIT (doc_id % 5:
a fold's docs are tagged with the lexicon built from the OTHER folds)
so the feature is honest — a full-train lexicon would mark every gold
train span and the perceptron would just copy it. Val-side features
use the full-train lexicon, which is exactly what deployment sees.

Run:  python tools/exp_gaz_stack.py [conll04|custom]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from tools.sweep_ptron_feats import (  # noqa: E402
    P, STATES, _shape, load_split, make_feats, spans_to_tags,
    tags_to_spans, viterbi)

CHECKPOINTS = (15, 25, 35, 50, 70)


def build_lex(docs) -> set:
    lex = set()
    for _, toks, spans in docs:
        for s, e in spans:
            lex.add(tuple(toks[s:e]))
    return lex


def gaz_flags(toks, byfirst):
    """Per-token set of positional membership flags (B/I/E/S) from all
    exact lexicon phrase occurrences."""
    n = len(toks)
    flags = [set() for _ in range(n)]
    for i, w in enumerate(toks):
        for ph in byfirst.get(w, ()):
            L = len(ph)
            if i + L <= n and tuple(toks[i:i + L]) == ph:
                if L == 1:
                    flags[i].add("S")
                else:
                    flags[i].add("B")
                    flags[i + L - 1].add("E")
                    for j in range(i + 1, i + L - 1):
                        flags[j].add("I")
    return flags


def index_lex(lex):
    byfirst = {}
    for ph in lex:
        byfirst.setdefault(ph[0], []).append(ph)
    return byfirst


def featurize(docs, base_feats, byfirst_for_doc, with_gaz, with_none):
    """[(fs_doc, gold_tags)] with optional gaz flags appended."""
    out = []
    for doc_id, toks, spans in docs:
        shapes = [_shape(w) for w in toks]
        fs_doc = [base_feats(toks, shapes, i) for i in range(len(toks))]
        if with_gaz:
            flags = gaz_flags(toks, byfirst_for_doc(doc_id))
            for i, fl in enumerate(flags):
                for t in sorted(fl):
                    fs_doc[i].append(("gz", t))
                if with_none and not fl:
                    fs_doc[i].append(("gz", "none"))
        out.append((doc_id, fs_doc, spans_to_tags(len(toks), spans),
                    set(spans)))
    return out


def fit_eval_items(train_items, val_items, checkpoints):
    shards = defaultdict(list)
    for doc_id, fs_doc, gold, _ in sorted(train_items):
        shards[doc_id % P].append((fs_doc, gold))
    n_gold = sum(len(g) for _, _, _, g in val_items)

    W, Wt = {}, {}
    avgW, avgWt = defaultdict(int), defaultdict(int)
    results = {}
    for epoch in range(1, max(checkpoints) + 1):
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
                    gt, pt = (gold[i - 1], gold[i]), (pred[i - 1], pred[i])
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
        if epoch in checkpoints:
            tp = fp = 0
            for _, fs_doc, _, gold_set in val_items:
                pred = set(tags_to_spans(viterbi(fs_doc, avgW, avgWt)))
                tp += len(pred & gold_set)
                fp += len(pred - gold_set)
            prec = tp / max(tp + fp, 1)
            rec = tp / max(n_gold, 1)
            f1 = 2 * prec * rec / max(prec + rec, 1e-12)
            results[epoch] = (round(prec, 4), round(rec, 4), round(f1, 4))
    return results


def main():
    datasets = sys.argv[1:] or ["conll04", "custom"]
    base_feats = make_feats(frozenset())
    for ds in datasets:
        train = load_split(ds, "train")
        val = load_split(ds, "val")
        full_lex_idx = index_lex(build_lex(train))
        fold_idx = {}
        for k in range(5):
            fold_idx[k] = index_lex(build_lex(
                [d for d in train if d[0] % 5 != k]))

        t0 = time.time()
        base_tr = featurize(train, base_feats, None, False, False)
        base_va = featurize(val, base_feats, None, False, False)
        r = fit_eval_items(base_tr, base_va, CHECKPOINTS)
        print(f"[{ds}] baseline        {r}  ({time.time()-t0:.0f}s)",
              flush=True)

        for with_none in (False, True):
            tr = featurize(train, base_feats,
                           lambda d: fold_idx[d % 5], True, with_none)
            va = featurize(val, base_feats,
                           lambda d: full_lex_idx, True, with_none)
            r = fit_eval_items(tr, va, CHECKPOINTS)
            tag = "gaz+none" if with_none else "gaz     "
            print(f"[{ds}] {tag}        {r}", flush=True)


if __name__ == "__main__":
    main()
