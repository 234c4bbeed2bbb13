"""Val-split feature/epoch sweep for the averaged-perceptron span
tagger (operators/perceptron.py) — pure Python, no Spark.

Protocol guard: fits on TRAIN only, evaluates strict span F1 on VAL
only; the test split is never read. The fit replicates fit_ipm's exact
scaled-integer IPM semantics (8 fixed doc_id%8 shards, step=8 local
updates, exact //8 delta mixing, running averaged weights) so a config
selected here scores identically when refit by the Spark operator.

Feature families are toggled by name; the baseline set is the shipped
perceptron._feats. Run:  python tools/sweep_ptron_feats.py [fast]
"""

from __future__ import annotations

import json
import sys
import time
from collections import defaultdict

DATASETS = {
    "custom": "/root/reference/CRE Model/data/Custom Dataset/"
              "mixed_final_for_model_80-10-10_rs129.json",
    "conll04": "/root/reference/CRE Model/data/Conll04/"
               "conll04_nathan_for_model_rs129.json",
}
MAX_SEQ_LEN, MAX_SPAN_WIDTH = 200, 80

STATES = ["O", "B", "I", "E", "S"]
_SI = {s: i for i, s in enumerate(STATES)}
LEGAL = {("O", "O"), ("O", "B"), ("O", "S"), ("B", "I"), ("B", "E"),
         ("I", "I"), ("I", "E"), ("E", "O"), ("E", "B"), ("E", "S"),
         ("S", "O"), ("S", "B"), ("S", "S")}
START_OK = ("O", "B", "S")
END_OK = ("O", "E", "S")
P = 8


def load_split(ds: str, split: str):
    """[(doc_id, tokens, gold_spans)] with P1 valid-span filtering."""
    with open(DATASETS[ds], encoding="utf-8-sig") as f:
        blob = json.load(f)
    out = []
    for i, obs in enumerate(blob["data"][split]):
        toks = [str(t) for t in obs.get("tokens", [])]
        lim = min(len(toks), MAX_SEQ_LEN)
        spans = [(sp["start"], sp["end"]) for sp in obs.get("spans", [])
                 if sp["end"] - sp["start"] <= MAX_SPAN_WIDTH
                 and sp["end"] <= lim]
        out.append((i, toks, spans))
    return out


def _shape(w: str) -> str:
    if not w:
        return "other"
    if w.isdigit():
        return "digits"
    if all(not c.isalnum() for c in w):
        return "punct"
    if w[0].isupper():
        return "cap"
    if w.islower():
        return "lower"
    return "other"


def make_feats(extra: frozenset):
    """Feature fn keyed by the shipped baseline + named extras."""

    def feats(toks, shapes, i):
        n = len(toks)
        pt = toks[i - 1] if i > 0 else "<bos>"
        nt = toks[i + 1] if i < n - 1 else "<eos>"
        psh = shapes[i - 1] if i > 0 else "<bos>"
        nsh = shapes[i + 1] if i < n - 1 else "<eos>"
        w = toks[i]
        fs = [("w", w), ("sh", shapes[i]), ("pw", pt), ("nw", nt),
              ("psh", psh), ("nsh", nsh), ("suf", w[-3:]), ("pre", w[:2]),
              ("wsh", w + "|" + nsh), ("pww", pt + "|" + w)]
        if "pw2" in extra:
            fs.append(("pw2", toks[i - 2] if i > 1 else "<bos>"))
        if "nw2" in extra:
            fs.append(("nw2", toks[i + 2] if i < n - 2 else "<eos>"))
        if "suf4" in extra:
            fs.append(("suf4", w[-4:]))
        if "pre3" in extra:
            fs.append(("pre3", w[:3]))
        if "lw" in extra:
            fs.append(("lw", w.lower()))
        if "shtri" in extra:
            fs.append(("shtri", psh + "|" + shapes[i] + "|" + nsh))
        if "wnw" in extra:
            fs.append(("wnw", w + "|" + nt))
        if "skip" in extra:
            fs.append(("skip", pt + "|" + nt))
        if "wl" in extra:
            fs.append(("wl", str(min(len(w), 8))))
        if "psh2" in extra:
            fs.append(("psh2", shapes[i - 2] if i > 1 else "<bos>"))
        if "nsh2" in extra:
            fs.append(("nsh2", shapes[i + 2] if i < n - 2 else "<eos>"))
        if "pshw" in extra:
            fs.append(("pshw", psh + "|" + w))
        return fs

    return feats


def viterbi(fs_doc, W, Wt):
    n = len(fs_doc)
    emis = [[sum(W.get((f, s), 0) for f in fs) for s in STATES]
            for fs in fs_doc]
    NEG = float("-inf")
    dp = [[NEG] * 5 for _ in range(n)]
    bp = [[0] * 5 for _ in range(n)]
    for s in START_OK:
        dp[0][_SI[s]] = emis[0][_SI[s]]
    for i in range(1, n):
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


def tags_to_spans(tags):
    spans, start = [], None
    for i, t in enumerate(tags):
        if t == "S":
            spans.append((i, i + 1))
            start = None
        elif t == "B":
            start = i
        elif t == "E" and start is not None:
            spans.append((start, i + 1))
            start = None
        elif t == "O":
            start = None
    return spans


def spans_to_tags(n, spans):
    tags = ["O"] * n
    for s, e in spans:
        if e - s == 1:
            tags[s] = "S"
        else:
            tags[s] = "B"
            tags[e - 1] = "E"
            for i in range(s + 1, e - 1):
                tags[i] = "I"
    return tags


def fit_eval(train, val, feats, checkpoints):
    """IPM fit on train with averaged-weight snapshots at each epoch in
    ``checkpoints``; returns {epoch: (P, R, F1)} strict span scores on
    val. Feature lists are precomputed once (they don't change across
    epochs)."""
    shards = defaultdict(list)
    for doc_id, toks, spans in sorted(train):
        shapes = [_shape(w) for w in toks]
        fs_doc = [feats(toks, shapes, i) for i in range(len(toks))]
        gold = spans_to_tags(len(toks), spans)
        shards[doc_id % P].append((fs_doc, gold))
    val_fs = []
    n_gold = 0
    for doc_id, toks, spans in val:
        shapes = [_shape(w) for w in toks]
        val_fs.append(([feats(toks, shapes, i) for i in range(len(toks))],
                       set(spans)))
        n_gold += len(spans)

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
            for fs_doc, gold_set in val_fs:
                pred = set(tags_to_spans(viterbi(fs_doc, avgW, avgWt)))
                tp += len(pred & gold_set)
                fp += len(pred - gold_set)
            prec = tp / max(tp + fp, 1)
            rec = tp / max(n_gold, 1)
            f1 = 2 * prec * rec / max(prec + rec, 1e-12)
            results[epoch] = (round(prec, 4), round(rec, 4), round(f1, 4))
    return results


def main():
    fast = "fast" in sys.argv[1:]
    checkpoints = (15, 25, 35, 50) if fast else (15, 25, 35, 50, 70)
    candidates = ["pw2", "nw2", "suf4", "pre3", "lw", "shtri", "wnw",
                  "skip", "wl", "psh2", "nsh2", "pshw"]
    for ds in DATASETS:
        train = load_split(ds, "train")
        val = load_split(ds, "val")
        t0 = time.time()
        base = fit_eval(train, val, make_feats(frozenset()), checkpoints)
        best_f1 = {e: prf[2] for e, prf in base.items()}
        print(f"[{ds}] baseline {base}  ({time.time() - t0:.0f}s)",
              flush=True)
        # single-addition pass
        gains = []
        for c in candidates:
            r = fit_eval(train, val, make_feats(frozenset([c])),
                         checkpoints)
            bf = max(v[2] for v in r.values())
            gains.append((bf, c, r))
            print(f"[{ds}] +{c:6s} best={bf}  {r}", flush=True)
        gains.sort(reverse=True)
        # greedy forward selection from the best single addition
        chosen = []
        cur = max(best_f1.values())
        for bf, c, _ in gains:
            trial = frozenset(chosen + [c])
            r = fit_eval(train, val, make_feats(trial), checkpoints)
            bf2 = max(v[2] for v in r.values())
            if bf2 > cur + 1e-9:
                chosen.append(c)
                cur = bf2
                print(f"[{ds}] GREEDY keep {c}: {bf2}  {r}", flush=True)
            else:
                print(f"[{ds}] greedy drop {c}: {bf2}", flush=True)
        print(f"[{ds}] SELECTED extras={chosen} val_f1={cur}", flush=True)


if __name__ == "__main__":
    main()
