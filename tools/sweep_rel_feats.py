"""Val-split feature sweep for the relation classifiers (NB and
multiclass perceptron, operators/fitted.py + operators/perceptron.py) —
pure Python, no Spark.

Protocol guard: span tagger and rel classifiers fit on TRAIN only; the
selection metric is strict rel F1 on the VAL split over PREDICTED val
spans (the deployment-matched criterion of freeze_rel_perceptron.py);
the test split is never read. Twin semantics are exact: integer-grid NB
weights (W_SCALE=1000, GRID_OFFSET=pi/10, MIN_DF, MARGIN) and the
scaled-integer IPM perceptron (8 shards, //8 mixing, running average).

Run:  python tools/sweep_rel_feats.py
"""

from __future__ import annotations

import math
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from tools.sweep_ptron_feats import (  # noqa: E402
    DATASETS, load_split, make_feats, fit_eval, _shape, viterbi,
    tags_to_spans, spans_to_tags, P)

MAX_GAP = 30
W_SCALE = 1000
GRID_OFFSET = 0.3141592653589793
MIN_DF = 3
MARGIN = 1500

# shipped span-feature extras / epochs / gaz flags, imported FROM the
# deployment module so a span-config change can never silently de-match
# the rel selection surface (ADVICE r4: these were duplicated literals);
# used to produce the predicted val spans the rel selection scores over.
from causalre_spark.operators import perceptron as _PT  # noqa: E402

SPAN_EXTRAS: dict = {ds: frozenset(v) for ds, v in _PT.SPAN_EXTRAS.items()}
SPAN_EPOCHS = dict(_PT.EPOCHS)
SPAN_GAZ = dict(_PT.SPAN_GAZ)


def _gap_bucket(gap: int) -> str:
    if gap < 6:
        return str(gap)
    if gap <= 10:
        return "10"
    if gap <= 20:
        return "20"
    return "30"


def pair_feats(toks, h_start, h_end, t_start, t_end, extra,
               spans_sorted=None):
    """Distinct feature set of one ordered pair — twin of
    fitted.pair_features plus toggled extras."""
    n = len(toks)
    hl, tl = toks[h_end - 1], toks[t_end - 1]
    fs = {("gap", _gap_bucket(t_start - h_end)),
          ("first", toks[h_end] if t_start > h_end else "<adj>"),
          ("last", toks[t_start - 1] if t_start > h_end else "<adj>"),
          ("pre", toks[h_start - 1] if h_start > 0 else "<bos>"),
          ("post", toks[t_end] if t_end < n else "<eos>"),
          ("hl", hl), ("tl", tl),
          ("hlsh", _shape(hl)), ("tlsh", _shape(tl)),
          ("hw", str(min(h_end - h_start, 8))),
          ("tw", str(min(t_end - t_start, 8)))}
    for i in range(h_end, t_start):
        fs.add(("btw", toks[i]))
    for i in range(h_end, t_start - 1):
        fs.add(("btw2", toks[i] + " " + toks[i + 1]))
    if "hf" in extra:
        fs.add(("hf", toks[h_start]))
    if "tf" in extra:
        fs.add(("tf", toks[t_start]))
    if "hfsh" in extra:
        fs.add(("hfsh", _shape(toks[h_start])))
        fs.add(("tfsh", _shape(toks[t_start])))
    if "hbow" in extra:
        for i in range(h_start, h_end):
            fs.add(("hbow", toks[i]))
    if "tbow" in extra:
        for i in range(t_start, t_end):
            fs.add(("tbow", toks[i]))
    if "btwl" in extra:
        for i in range(h_end, t_start):
            fs.add(("btwl", toks[i].lower()))
    if "hltl" in extra:
        fs.add(("hltl", hl + "|" + tl))
    if "fl" in extra:
        a = toks[h_end] if t_start > h_end else "<adj>"
        b = toks[t_start - 1] if t_start > h_end else "<adj>"
        fs.add(("fl", a + "|" + b))
    if "nbet" in extra and spans_sorted is not None:
        c = sum(1 for s, e in spans_sorted
                if s >= h_end and e <= t_start)
        fs.add(("nbet", str(min(c, 4))))
    return fs


def candidate_pairs(spans):
    """Text-ordered disjoint pairs with gap <= MAX_GAP from a span
    list [(s, e)]."""
    out = []
    for hs, he in spans:
        for ts, te in spans:
            if he <= ts and ts - he <= MAX_GAP:
                out.append((hs, he, ts, te))
    return out


def labeled_train_pairs(docs):
    """[(doc_id, toks, spans, [(pair, y)])]: gold-span candidate pairs
    labeled neg(0)/fwd(1)/bwd(2); double-direction pairs resolve to
    min y (fwd)."""
    out = []
    for doc_id, toks, spans, rels in docs:
        orient = {}
        for a_st, a_en, b_st, b_en in rels:
            if a_st <= b_st:
                k, y = (a_st, a_en, b_st, b_en), 1
            else:
                k, y = (b_st, b_en, a_st, a_en), 2
            orient[k] = min(orient.get(k, 9), y)
        pairs = [(p, orient.get(p, 0)) for p in candidate_pairs(
            sorted(set(spans)))]
        out.append((doc_id, toks, sorted(set(spans)), pairs))
    return out


def load_split_rels(ds: str, split: str):
    """[(doc_id, toks, spans, rels)] where rels are oriented span
    tuples (cause first)."""
    import json
    with open(DATASETS[ds], encoding="utf-8-sig") as f:
        blob = json.load(f)
    out = []
    for i, obs in enumerate(blob["data"][split]):
        toks = [str(t) for t in obs.get("tokens", [])]
        lim = min(len(toks), 200)
        kept = [(sp["start"], sp["end"]) for sp in obs.get("spans", [])
                if sp["end"] - sp["start"] <= 80 and sp["end"] <= lim]
        keptset = set()
        kept_idx = {}
        for j, sp in enumerate(obs.get("spans", [])):
            t = (sp["start"], sp["end"])
            if t in set(kept):
                kept_idx[j] = t
                keptset.add(t)
        rels = []
        for r in obs.get("relations", []):
            if r["head"] in kept_idx and r["tail"] in kept_idx:
                h, t = kept_idx[r["head"]], kept_idx[r["tail"]]
                rels.append((h[0], h[1], t[0], t[1]))
        out.append((i, toks, kept, rels))
    return out


def fit_nb(train_pairs, extra):
    """-> (weights dict {(kind,val): (w_neg,w_fwd,w_bwd)}, priors)."""
    counts = defaultdict(lambda: [0, 0, 0])
    cls = [0, 0, 0]
    for _, toks, spans, pairs in train_pairs:
        for (hs, he, ts, te), y in pairs:
            cls[y] += 1
            for f in pair_feats(toks, hs, he, ts, te, extra, spans):
                counts[f][y] += 1

    def w(n, c):
        return math.floor(W_SCALE * math.log((n + 1.0) / (c + 2.0))
                          + GRID_OFFSET)

    weights = {f: tuple(w(ns[y], cls[y]) for y in range(3))
               for f, ns in counts.items() if sum(ns) >= MIN_DF}
    tot = sum(cls)
    priors = tuple(math.floor(W_SCALE * math.log((c + 1.0) / (tot + 3.0))
                              + GRID_OFFSET) for c in cls)
    return weights, priors


def predict_nb(toks, spans, weights, priors, extra, margin=MARGIN):
    """Oriented predicted rels for one doc's predicted spans."""
    out = []
    ss = sorted(set(spans))
    for hs, he, ts, te in candidate_pairs(ss):
        t = list(priors)
        for f in pair_feats(toks, hs, he, ts, te, extra, ss):
            wv = weights.get(f)
            if wv:
                for y in range(3):
                    t[y] += wv[y]
        if t[1] > t[0] + margin and t[1] >= t[2]:
            out.append((hs, he, ts, te))
        elif t[2] > t[0] + margin and t[2] > t[1]:
            out.append((ts, te, hs, he))
    return out


def fit_rel_ipm_twin(train_pairs, extra, checkpoints):
    """IPM multiclass perceptron with averaged-weight snapshots ->
    {epoch: W}. Items shard by doc_id % P; in-shard order =
    (doc_id, pair key)."""
    shards = defaultdict(list)
    for doc_id, toks, spans, pairs in train_pairs:
        items = [(pair_feats(toks, hs, he, ts, te, extra, spans) |
                  {("bias", "")}, y)
                 for (hs, he, ts, te), y in
                 sorted(pairs, key=lambda r: r[0])]
        shards[doc_id % P].append((doc_id, items))
    for sh in shards:
        shards[sh].sort()
    W: dict = {}
    avgW = defaultdict(int)
    snaps = {}
    for epoch in range(1, max(checkpoints) + 1):
        dW = defaultdict(int)
        for sh in range(P):
            lw = dict(W)
            for _, items in shards.get(sh, []):
                for fs, y in items:
                    scores = [sum(lw.get((f, c), 0) for f in fs)
                              for c in range(3)]
                    pred = max(range(3), key=lambda c: (scores[c], -c))
                    if pred != y:
                        for f in fs:
                            dW[(f, y)] += P
                            dW[(f, pred)] -= P
                            lw[(f, y)] = lw.get((f, y), 0) + P
                            lw[(f, pred)] = lw.get((f, pred), 0) - P
        for k, v in dW.items():
            m = v // P
            if m:
                W[k] = W.get(k, 0) + m
        for k, v in W.items():
            avgW[k] += v
        if epoch in checkpoints:
            snaps[epoch] = dict(avgW)
    return snaps


def predict_ptron(toks, spans, W, extra):
    out = []
    ss = sorted(set(spans))
    for hs, he, ts, te in candidate_pairs(ss):
        fs = pair_feats(toks, hs, he, ts, te, extra, ss) | {("bias", "")}
        s = [sum(W.get((f, c), 0) for f in fs) for c in range(3)]
        if s[1] > s[0] and s[1] >= s[2]:
            out.append((hs, he, ts, te))
        elif s[2] > s[0] and s[2] > s[1]:
            out.append((ts, te, hs, he))
    return out


def rel_prf(val_docs, pred_spans_by_doc, predict_fn):
    tp = fp = n_gold = 0
    for doc_id, toks, spans, rels in val_docs:
        gold = set(rels)
        n_gold += len(gold)
        pred = predict_fn(toks, pred_spans_by_doc.get(doc_id, []))
        for r in set(pred):
            if r in gold:
                tp += 1
            else:
                fp += 1
    prec = tp / max(tp + fp, 1)
    rec = tp / max(n_gold, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return round(prec, 4), round(rec, 4), round(f1, 4)


def predicted_val_spans(ds):
    """Train-only span-perceptron fit -> predicted spans per val doc.
    SPAN_GAZ datasets stack cross-fit gazetteer flags exactly like
    perceptron.fit_ipm(gaz_folds=5) / decode_spans(gaz=full-lexicon)
    (tools/exp_gaz_stack.py semantics)."""
    from tools.exp_gaz_stack import build_lex, gaz_flags, index_lex

    train = load_split(ds, "train")
    val = load_split(ds, "val")
    feats = make_feats(SPAN_EXTRAS[ds])
    epochs = SPAN_EPOCHS[ds]
    use_gaz = SPAN_GAZ.get(ds, False)
    fold_idx = {k: index_lex(build_lex(
        [d for d in train if d[0] % 5 != k])) for k in range(5)} \
        if use_gaz else None
    full_idx = index_lex(build_lex(train)) if use_gaz else None

    def fs_for(doc_id, toks, idx):
        shapes = [_shape(w) for w in toks]
        fs_doc = [feats(toks, shapes, i) for i in range(len(toks))]
        if idx is not None:
            for i, fl in enumerate(gaz_flags(toks, idx)):
                fs_doc[i] += [("gz", t) for t in sorted(fl)]
        return fs_doc

    shards = defaultdict(list)
    for doc_id, toks, spans in sorted(train):
        fs_doc = fs_for(doc_id, toks,
                        fold_idx[doc_id % 5] if use_gaz else None)
        shards[doc_id % P].append((fs_doc, spans_to_tags(len(toks),
                                                         spans)))
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
    out = {}
    for doc_id, toks, _ in val:
        fs_doc = fs_for(doc_id, toks, full_idx)
        out[doc_id] = tags_to_spans(viterbi(fs_doc, avgW, avgWt))
    return out


def main():
    candidates = ["hf", "tf", "hfsh", "hbow", "tbow", "btwl", "hltl",
                  "fl", "nbet"]
    rel_epochs = (8, 12, 20, 30, 40)
    for ds in DATASETS:
        t0 = time.time()
        train_docs = load_split_rels(ds, "train")
        val_docs = load_split_rels(ds, "val")
        train_pairs = labeled_train_pairs(train_docs)
        pv = predicted_val_spans(ds)
        print(f"[{ds}] predicted val spans ready "
              f"({time.time() - t0:.0f}s)", flush=True)

        def eval_cfg(extra):
            extra = frozenset(extra)
            w, pr = fit_nb(train_pairs, extra)
            nb = rel_prf(val_docs, pv,
                         lambda toks, sp: predict_nb(toks, sp, w, pr,
                                                     extra))
            snaps = fit_rel_ipm_twin(train_pairs, extra, rel_epochs)
            best_pt, best_e = (0, 0, -1), 0
            for e, W in snaps.items():
                r = rel_prf(val_docs, pv,
                            lambda toks, sp: predict_ptron(toks, sp, W,
                                                           extra))
                if r[2] > best_pt[2]:
                    best_pt, best_e = r, e
            return nb, best_pt, best_e

        nb0, pt0, e0 = eval_cfg([])
        print(f"[{ds}] baseline NB={nb0} PT={pt0}@{e0}", flush=True)
        cur = max(nb0[2], pt0[2])
        gains = []
        for c in candidates:
            nb, pt, e = eval_cfg([c])
            bf = max(nb[2], pt[2])
            gains.append((bf, c))
            print(f"[{ds}] +{c:5s} NB={nb} PT={pt}@{e}", flush=True)
        gains.sort(reverse=True)
        chosen = []
        for bf, c in gains:
            nb, pt, e = eval_cfg(chosen + [c])
            bf2 = max(nb[2], pt[2])
            if bf2 > cur + 1e-9:
                chosen.append(c)
                cur = bf2
                print(f"[{ds}] GREEDY keep {c}: NB={nb} PT={pt}@{e}",
                      flush=True)
            else:
                print(f"[{ds}] greedy drop {c}: {bf2}", flush=True)
        print(f"[{ds}] SELECTED extras={chosen} val_rel_f1={cur}",
              flush=True)


if __name__ == "__main__":
    main()
