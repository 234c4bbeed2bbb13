"""Dual val+CV adoption gate for DISTRIBUTIONAL WORD-CLUSTER emission
features on the span perceptron — the semi-supervised family (Koo et
al. 2008 / Turian et al. 2010 word-cluster features, public papers)
never probed by the emission/transition sweeps: cluster the FIT
SPLIT's tokens by left/right context signatures (unsupervised — no
labels read), then stack ("wcl"/"pwcl"/"nwcl", cluster-id) features on
the shipped config.

Honesty guard: clusters are built from the text of the FIT portion
only — train text in the val phase, the 4/5 fit folds' text in each CV
fold — so the held-out split's tokens never shape the feature map
(stricter than the transductive variant in the literature, matching
the repo's cross-fit gazetteer discipline). The test split is never
read.

Clustering (deterministic): vocab = fit-split tokens with count >= 2;
signature = L1-normalized counts of the 25 most frequent fit words (+
OTHER + boundary) as left and right neighbor; Lloyd k-means, k = 32,
8 iterations, init = the k most frequent vocab words' signatures,
argmin ties -> smallest cluster id. Out-of-vocab tokens at decode get
the "oov" cluster value.

Protocol (the cv_span_extras.py dual gate, deployment-matched):
  val phase: fit TRAIN, strict span F1 on VAL at checkpoints 35/50/70
      (conll04 arms keep the shipped cross-fit gazetteer stacking).
  CV phase: 5-fold micro-F1 over train ∪ val (folds = doc_id % 5).
Adopt only if the SAME deployable checkpoint beats the shipped config
on BOTH signals (the precedent set when trw was rejected).

Run:  python tools/cv_span_wcl.py [conll04|custom] [wcl|wcl3 ...]
"""

from __future__ import annotations

import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")

from tools.exp_gaz_stack import (  # noqa: E402
    build_lex, fit_eval_items, gaz_flags, index_lex)
from tools.sweep_ptron_feats import (  # noqa: E402
    _shape, load_split, make_feats, spans_to_tags)

from causalre_spark.operators import perceptron as _PT  # noqa: E402

CHECKPOINTS = (35, 50, 70)
K = 5
KINDS = {"wcl": ("wcl",), "wcl3": ("wcl", "pwcl", "nwcl")}
N_CLUSTERS = 32
N_ANCHOR = 25
KM_ITERS = 8
MIN_COUNT = 2

SPAN_GAZ = dict(_PT.SPAN_GAZ)
BASE = {ds: frozenset(v) for ds, v in _PT.SPAN_EXTRAS.items()}


def build_clusters(docs, k: int = N_CLUSTERS) -> dict:
    """{token: cluster_id} from the docs' raw text only (no labels)."""
    import numpy as np

    cnt = Counter()
    for _, toks, _ in docs:
        cnt.update(toks)
    by_freq = sorted(cnt, key=lambda w: (-cnt[w], w))
    anchors = {w: i for i, w in enumerate(by_freq[:N_ANCHOR])}
    vocab = sorted(w for w, c in cnt.items() if c >= MIN_COUNT)
    if len(vocab) <= k:
        return {w: i for i, w in enumerate(vocab)}
    vi = {w: i for i, w in enumerate(vocab)}
    half = N_ANCHOR + 2  # anchors + OTHER + boundary
    OTH, BND = N_ANCHOR, N_ANCHOR + 1
    sig = np.zeros((len(vocab), 2 * half))
    for _, toks, _ in docs:
        n = len(toks)
        for i, w in enumerate(toks):
            r = vi.get(w)
            if r is None:
                continue
            li = BND if i == 0 else anchors.get(toks[i - 1], OTH)
            ri = BND if i == n - 1 else anchors.get(toks[i + 1], OTH)
            sig[r, li] += 1
            sig[r, half + ri] += 1
    for sl in (slice(0, half), slice(half, 2 * half)):
        part = sig[:, sl]
        part /= np.maximum(part.sum(axis=1, keepdims=True), 1e-9)
    init_words = [w for w in by_freq if w in vi][:k]
    C = sig[[vi[w] for w in init_words]].copy()
    assign = None
    for _ in range(KM_ITERS):
        d2 = ((sig[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # first-min = smallest cluster id
        for c in range(k):
            members = sig[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return {w: int(assign[vi[w]]) for w in vocab}


def featurize_wcl(docs, base_feats, clusters: dict, kinds: tuple,
                  byfirst_for_doc, with_gaz):
    """[(doc_id, fs_doc, gold_tags, gold_set)] with cluster features
    (and the shipped gaz stacking) appended — exp_gaz_stack.featurize
    item shape, consumable by fit_eval_items."""
    cl = lambda w: str(clusters.get(w, "oov"))  # noqa: E731
    out = []
    for doc_id, toks, spans in docs:
        n = len(toks)
        shapes = [_shape(w) for w in toks]
        fs_doc = [base_feats(toks, shapes, i) for i in range(n)]
        for i in range(n):
            if "wcl" in kinds:
                fs_doc[i].append(("wcl", cl(toks[i])))
            if "pwcl" in kinds:
                fs_doc[i].append(
                    ("pwcl", cl(toks[i - 1]) if i else "<bos>"))
            if "nwcl" in kinds:
                fs_doc[i].append(
                    ("nwcl", cl(toks[i + 1]) if i < n - 1 else "<eos>"))
        if with_gaz:
            flags = gaz_flags(toks, byfirst_for_doc(doc_id))
            for i, fl in enumerate(flags):
                for t in sorted(fl):
                    fs_doc[i].append(("gz", t))
        out.append((doc_id, fs_doc, spans_to_tags(n, spans), set(spans)))
    return out


def _val_arm(ds, kinds, train, val, fold_idx, full_idx):
    feats = make_feats(BASE[ds])
    clusters = build_clusters(train) if kinds else {}
    gaz = SPAN_GAZ[ds]
    if gaz:
        tr = featurize_wcl(train, feats, clusters, kinds,
                           lambda d: fold_idx[d % K], True)
        va = featurize_wcl(val, feats, clusters, kinds,
                           lambda d: full_idx, True)
    else:
        tr = featurize_wcl(train, feats, clusters, kinds, None, False)
        va = featurize_wcl(val, feats, clusters, kinds, None, False)
    return fit_eval_items(tr, va, CHECKPOINTS)


def _cv_arm(ds, kinds, docs):
    feats = make_feats(BASE[ds])
    gaz = SPAN_GAZ[ds]
    agg = {e: [0.0, 0.0, 0] for e in CHECKPOINTS}
    for fold in range(K):
        fit = [d for d in docs if d[0] % K != fold]
        held = [d for d in docs if d[0] % K == fold]
        clusters = build_clusters(fit) if kinds else {}
        if gaz:
            inner = {k: index_lex(build_lex(
                [d for d in fit if d[0] % K != k])) for k in range(K)}
            full = index_lex(build_lex(fit))
            tr = featurize_wcl(fit, feats, clusters, kinds,
                               lambda d: inner[d % K], True)
            va = featurize_wcl(held, feats, clusters, kinds,
                               lambda d: full, True)
        else:
            tr = featurize_wcl(fit, feats, clusters, kinds, None, False)
            va = featurize_wcl(held, feats, clusters, kinds, None, False)
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
    argv = sys.argv[1:]
    datasets = [a for a in argv if a in ("conll04", "custom")] or \
        ["conll04", "custom"]
    only = [a for a in argv if a in KINDS]
    arms = {lab: KINDS[lab] for lab in (only or KINDS)}
    for ds in datasets:
        train = load_split(ds, "train")
        val = load_split(ds, "val")
        docs = train + val
        full_idx = index_lex(build_lex(train))
        fold_idx = {k: index_lex(build_lex(
            [d for d in train if d[0] % K != k])) for k in range(K)}

        results = {}
        for lab, kinds in [("base", ())] + list(arms.items()):
            t0 = time.time()
            rv = _val_arm(ds, kinds, train, val, fold_idx, full_idx)
            print(f"[{ds}] val {lab:5s} {rv}  ({time.time()-t0:.0f}s)",
                  flush=True)
            t0 = time.time()
            rc = _cv_arm(ds, kinds, docs)
            print(f"[{ds}] cv  {lab:5s} {rc}  ({time.time()-t0:.0f}s)",
                  flush=True)
            results[lab] = (rv, rc)
        bv, bc = results["base"]
        # deployable-checkpoint rule: one epoch must win BOTH signals
        for lab in arms:
            if lab not in results:
                continue
            rv, rc = results[lab]
            wins = [e for e in CHECKPOINTS
                    if rv[e][2] > max(f1 for _, _, f1 in bv.values())
                    and rc[e] > max(bc.values())]
            verdict = f"ADOPT @ {min(wins)}" if wins else "reject"
            print(f"[{ds}] {lab}: best-val {max(f1 for _, _, f1 in bv.values()):.4f}"
                  f"->{max(f1 for _, _, f1 in rv.values()):.4f} "
                  f"best-cv {max(bc.values()):.4f}->{max(rc.values()):.4f} "
                  f" {verdict}", flush=True)


if __name__ == "__main__":
    main()
