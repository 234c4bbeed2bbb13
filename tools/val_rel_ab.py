"""Production-exact VAL A/B for the rel-perceptron's REL_EXTRAS /
REL_EPOCHS (the adoption gate behind tools/sweep_rel_feats.py).

The sweep's scalar twin is selection-grade but not production-identical
in ONE place: it computes hlsh/tlsh with the perceptron shape classes,
where production fitted.pair_features uses fitted.SHAPE_RULES. This
tool re-runs ONLY the final A/B (baseline feature set vs the sweep's
selected extras) with a pair-feature twin that matches production
byte-for-byte — fitted._shape_py for hlsh/tlsh, perceptron._shape for
the hfsh/tfsh extras — so the adopted config is chosen on the numbers
the shipped chain will actually produce.

Protocol: span perceptron fit on TRAIN only (shipped epochs/features),
rel classifier fit on TRAIN only, scored on VAL over the predicted val
spans; the test split is never read. Run:
    python tools/val_rel_ab.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from causalre_spark.operators.fitted import _shape_py  # noqa: E402
from causalre_spark.operators.perceptron import _shape  # noqa: E402
from tools import sweep_rel_feats as SR  # noqa: E402
from tools.sweep_rel_feats import _gap_bucket  # noqa: E402

REL_EPOCH_GRID = (8, 12, 20, 30, 40)

# arms: the previously shipped sets vs the round-4 re-sweep's
# selections under the suf4+wl+psh2 span config (the change
# tools/rel_dual_check.py dual-gated)
PRIOR = {"conll04": ("tbow", "hltl", "hbow", "fl"),
         "custom": ("hfsh", "fl")}
SELECTED = {"conll04": ("tbow", "hltl", "hbow", "tf"),
            "custom": ("hfsh", "hf", "fl")}


def pair_feats_prod(toks, h_start, h_end, t_start, t_end, extra,
                    spans_sorted=None):
    """Production-exact distinct feature set of one ordered pair: twin
    of fitted.pair_features(extra_kinds=extra) — hlsh/tlsh via
    fitted.SHAPE_RULES, extras' shapes via perceptron._shape."""
    n = len(toks)
    hl, tl = toks[h_end - 1], toks[t_end - 1]
    first = toks[h_end] if t_start > h_end else "<adj>"
    last = toks[t_start - 1] if t_start > h_end else "<adj>"
    fs = {("gap", _gap_bucket(t_start - h_end)),
          ("first", first), ("last", last),
          ("pre", toks[h_start - 1] if h_start > 0 else "<bos>"),
          ("post", toks[t_end] if t_end < n else "<eos>"),
          ("hl", hl), ("tl", tl),
          ("hlsh", _shape_py(hl)), ("tlsh", _shape_py(tl)),
          ("hw", str(min(h_end - h_start, 8))),
          ("tw", str(min(t_end - t_start, 8)))}
    for i in range(h_end, t_start):
        fs.add(("btw", toks[i]))
    for i in range(h_end, t_start - 1):
        fs.add(("btw2", toks[i] + " " + toks[i + 1]))
    if "fl" in extra:
        fs.add(("fl", first + "|" + last))
    if "hltl" in extra:
        fs.add(("hltl", hl + "|" + tl))
    if "hfsh" in extra:
        fs.add(("hfsh", _shape(toks[h_start])))
        fs.add(("tfsh", _shape(toks[t_start])))
    if "hf" in extra:
        fs.add(("hf", toks[h_start]))
    if "tf" in extra:
        fs.add(("tf", toks[t_start]))
    if "hbow" in extra:
        for i in range(h_start, h_end):
            fs.add(("hbow", toks[i]))
    if "tbow" in extra:
        for i in range(t_start, t_end):
            fs.add(("tbow", toks[i]))
    return fs


def main() -> None:
    SR.pair_feats = pair_feats_prod  # production-exact twin
    for ds in SR.DATASETS:
        train_docs = SR.load_split_rels(ds, "train")
        val_docs = SR.load_split_rels(ds, "val")
        train_pairs = SR.labeled_train_pairs(train_docs)
        pv = SR.predicted_val_spans(ds)
        for label, extra in (("baseline", frozenset()),
                             ("prior", frozenset(PRIOR[ds])),
                             ("selected", frozenset(SELECTED[ds]))):
            snaps = SR.fit_rel_ipm_twin(train_pairs, extra,
                                        REL_EPOCH_GRID)
            best, best_e = (0, 0, -1), 0
            for e, W in snaps.items():
                r = SR.rel_prf(
                    val_docs, pv,
                    lambda toks, sp: SR.predict_ptron(toks, sp, W,
                                                      extra))
                if r[2] > best[2]:
                    best, best_e = r, e
            print(f"[{ds}] {label:8s} extras={sorted(extra)} "
                  f"best PT={best}@{best_e}", flush=True)


if __name__ == "__main__":
    main()
