"""Vectorized batch twins of the core model math.

Same semantics as causalre_spark.model.core scalar functions, computed
with NumPy array programs (outer products, prefix sums, sparse-table
range-max) so per-document cost is O(L log L + |B||E| + k²) array ops
instead of Python loops. Shared by the Spark Arrow UDFs AND the oracle
— both worlds call these functions, so numeric parity is by
construction (float accumulation order included).

Range max uses a sparse table (doubling): max over [s, e) =
max(T[k][s], T[k][e - 2^k]) with k = floor(log2(e - s)) — exact,
order-independent (max is associative/commutative), O(L log L) build.
"""

from __future__ import annotations

import numpy as np

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig
from causalre_spark.model import core


class DocEncoding:
    """Per-document precomputation shared by span + relation scoring."""

    def __init__(self, tokens: list[str], cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.tokens = tokens[: cfg.max_seq_len]
        self.reps = core.encode(tokens, cfg)
        L = self.reps.shape[0]
        self.L = L
        toks = self.tokens
        self.boundary = np.array([t in core.BOUNDARY_TOKENS for t in toks], dtype=bool)
        self.trigger = np.array([t in core.CAUSAL_TRIGGERS for t in toks], dtype=bool)
        self.trigger_ext = np.array(
            [t in core.CAUSAL_TRIGGERS or t in ("to", "in") for t in toks], dtype=bool)
        # prefix sums for O(1) range counts
        self.p_boundary = np.concatenate([[0], np.cumsum(self.boundary)])
        self.p_trigger_ext = np.concatenate([[0], np.cumsum(self.trigger_ext)])
        # sparse table for range max over reps
        self.table = [self.reps]
        k, size = 1, 2
        while size <= L:
            prev = self.table[-1]
            self.table.append(np.maximum(prev[: L - size + 1], prev[size // 2 : L - size // 2 + 1]))
            k += 1
            size *= 2
        # flat view of all levels + per-level row offsets: table_lookup
        # becomes ONE fancy index instead of a per-level masked-assign
        # loop (the loop was the hottest line of the whole fast path —
        # ~2 ms/doc of np.unique + boolean masks)
        self._tab_offsets = np.cumsum(
            [0] + [t.shape[0] for t in self.table[:-1]], dtype=np.int64)
        self._tab_flat = (np.concatenate(self.table, axis=0)
                          if len(self.table) > 1 else self.table[0])
        # prefix sums for range mean (sequential accumulation, float32)
        self.p_reps = np.concatenate(
            [np.zeros((1, self.reps.shape[1]), dtype=np.float32),
             np.cumsum(self.reps, axis=0, dtype=np.float32)])

    def range_max(self, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
        """Exact elementwise max of reps over [s, e) for each (s, e) pair.
        Requires e > s for all pairs."""
        w = ends - starts
        k = np.floor(np.log2(w)).astype(np.int64)
        size = (1 << k)
        a = self.table_lookup(k, starts)
        b = self.table_lookup(k, ends - size)
        return np.maximum(a, b)

    def table_lookup(self, k: np.ndarray, idx: np.ndarray) -> np.ndarray:
        return self._tab_flat[self._tab_offsets[k] + idx]


def tagger_logits_batch(enc: DocEncoding) -> tuple[np.ndarray, np.ndarray]:
    """N5 vectorized — identical values to core.tagger_logits."""
    b = enc.reps @ core.W_B
    e = enc.reps @ core.W_E
    if enc.L == 0:
        return b.astype(np.float32), e.astype(np.float32)
    prev_b = np.concatenate([[True], enc.boundary[:-1]])
    next_b = np.concatenate([enc.boundary[1:], [True]])
    b = b + core.BOUNDARY_BOOST * prev_b - core.BOUNDARY_BOOST * enc.boundary
    e = e + core.BOUNDARY_BOOST * next_b - core.BOUNDARY_BOOST * enc.boundary
    return b.astype(np.float32), e.astype(np.float32)


def decode_spans_batch(
    b_logits: np.ndarray, e_logits: np.ndarray, cfg: PipelineConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """N6/J2 vectorized: returns (starts, ends_exclusive, scores)."""
    thd = core.logit(cfg.predict_thd)
    b_idx = np.nonzero(b_logits >= thd)[0]
    e_idx = np.nonzero(e_logits >= thd)[0]
    if b_idx.size == 0 or e_idx.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.float32)
    # broadcasted band mask; nonzero walks row-major — identical pair
    # order to the earlier meshgrid+boolean-mask formulation, without
    # materializing the two index grids
    diff = e_idx[None, :] - b_idx[:, None]
    mask = (diff >= 0) & (diff < cfg.max_span_width)
    bi, ei = np.nonzero(mask)
    bs, es = b_idx[bi], e_idx[ei]
    scores = ((b_logits[bs] + e_logits[es]) / 2.0).astype(np.float32)
    starts, ends = bs.astype(np.int64), es.astype(np.int64) + 1
    # worst-case cap: keep the top candidates by tagger score before the
    # (more expensive) span-filter stage — deterministic order
    # (-tag_score, start, end), mirroring the reference's cheap-first
    # pruning cascade (model.py:788-885)
    cap = cfg.max_tagger_candidates
    if cap and starts.shape[0] > cap:
        order = np.lexsort((ends, starts, -scores))[:cap]
        starts, ends, scores = starts[order], ends[order], scores[order]
    return starts, ends, scores


# head / context / tail / width+dist weight views (same frozen vector,
# consumed piecewise — sum order differs from the concat dot, which is
# fine because oracle and UDFs share THIS implementation)
_D = core.DIM
_W_SPAN_MAX = core.W_SPAN[:_D]
_W_SPAN_MEAN = core.W_SPAN[_D : 2 * _D]
_W_SPAN_WIDTH = core.W_SPAN[2 * _D]
_W_REL_H = core.W_REL[:_D]
_W_REL_C = core.W_REL[_D : 2 * _D]
_W_REL_T = core.W_REL[2 * _D : 3 * _D]
_W_REL_DIST = core.W_REL[3 * _D]


def span_filter_scores_batch(
    enc: DocEncoding, starts: np.ndarray, ends: np.ndarray
) -> np.ndarray:
    """N7-N9 vectorized — core.span_filter_score semantics."""
    if starts.size == 0:
        return np.zeros(0, dtype=np.float32)
    seg_max = enc.range_max(starts, ends)
    widths = (ends - starts).astype(np.float32)
    seg_mean = (enc.p_reps[ends] - enc.p_reps[starts]) / widths[:, None]
    score = (
        seg_max @ _W_SPAN_MAX
        + seg_mean.astype(np.float32) @ _W_SPAN_MEAN
        + (widths / enc.cfg.max_span_width) * _W_SPAN_WIDTH
    ).astype(np.float32)
    crosses = (enc.p_boundary[ends] - enc.p_boundary[starts]) > 0
    score = np.where(crosses, score - np.float32(5.0), score)
    return score.astype(np.float32)


def rel_scores_batch(
    enc: DocEncoding,
    h_starts: np.ndarray, h_ends: np.ndarray,
    t_starts: np.ndarray, t_ends: np.ndarray,
) -> np.ndarray:
    """N10-N12 vectorized — core.rel_score semantics for ordered pairs."""
    m = h_starts.shape[0]
    if m == 0:
        return np.zeros(0, dtype=np.float32)
    h_term = enc.range_max(h_starts, h_ends) @ _W_REL_H
    t_term = enc.range_max(t_starts, t_ends) @ _W_REL_T
    lo = np.minimum(h_ends, t_ends)
    hi = np.maximum(h_starts, t_starts)
    ctx_term = np.zeros(m, dtype=np.float32)
    nz = hi > lo
    if nz.any():
        ctx_term[nz] = enc.range_max(lo[nz], hi[nz]) @ _W_REL_C
    dist = (t_starts - h_starts).astype(np.float32) / enc.cfg.max_seq_len
    score = (h_term + ctx_term + t_term + dist * _W_REL_DIST).astype(np.float32)
    score += core.REL_BASE_PENALTY
    # trigger-bridge boost: gap = tokens[h_end : t_start], 1-2 tokens,
    # first in TRIGGERS, all in TRIGGERS ∪ {to, in}
    gap = t_starts - h_ends
    ok_len = (gap >= 1) & (gap <= 2)
    first_idx = np.clip(h_ends, 0, max(enc.L - 1, 0))
    first_trig = enc.trigger[first_idx] if enc.L else np.zeros(m, dtype=bool)
    all_ext = (enc.p_trigger_ext[np.clip(t_starts, 0, enc.L)]
               - enc.p_trigger_ext[np.clip(h_ends, 0, enc.L)]) == gap
    boost = ok_len & first_trig & all_ext
    score = np.where(boost, score + core.TRIGGER_REL_BOOST, score)
    return score.astype(np.float32)


# ---------------------------------------------------------------------------
# fused per-document pipeline (UDF + oracle shared): decode -> filter ->
# top-k -> NMS -> pairs -> rel top-k -> threshold. All bounded by k
# (max_top_k_spans), so this is O(k²) per doc — the reference's pruning
# cascade (model.py:788-885) fused into one Arrow crossing.
# ---------------------------------------------------------------------------

def _iou_matrix(s: np.ndarray, e: np.ndarray) -> np.ndarray:
    inter = np.maximum(
        0, np.minimum(e[:, None], e[None, :]) - np.maximum(s[:, None], s[None, :]))
    union = (e - s)[:, None] + (e - s)[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def doc_extract(tokens: list[str], cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """One document -> kept spans + thresholded relations.

    Profile dispatch: cfg.model_profile == 'reference' routes to the
    faithful frozen-weight port of the reference N1-N12 stack
    (model/reference_math.py — subword pooling, biLSTM, nathan span
    reps, between_window_context rel reps with cross-attn pooling,
    graph transformer, typed output heads). The default 'fast' profile
    below is the 100TB hot path: same pipeline shape, semantic stand-in
    scores, ~100x fewer FLOPs/doc. Both profiles emit typed spans/rels
    (N12): the fast profile's single-type schema is the reference
    Custom-dataset schema ('event' spans, 'causal' rels).

    Deterministic orders match the oracle/operators exactly:
      top-k spans : (-filter_score, start, end)
      NMS         : (-filter_score, -width, start, end), keep if max IoU
                    with kept < overlap_thd
      top-k rels  : (-rel_score, h_start, h_end, t_start, t_end)
    """
    if cfg.model_profile == "reference":
        from causalre_spark.model import reference_math

        return reference_math.doc_extract_reference(tokens, cfg)
    enc = DocEncoding(tokens, cfg)
    b, e = tagger_logits_batch(enc)
    starts, ends, tag_scores = decode_spans_batch(b, e, cfg)
    fscores = span_filter_scores_batch(enc, starts, ends)
    keep = fscores >= cfg.span_thd
    starts, ends, tag_scores, fscores = (
        starts[keep], ends[keep], tag_scores[keep], fscores[keep])
    # top-k
    order = np.lexsort((ends, starts, -fscores))[: cfg.max_top_k_spans]
    starts, ends, tag_scores, fscores = (
        starts[order], ends[order], tag_scores[order], fscores[order])
    # NMS (greedy, k small)
    n = starts.shape[0]
    if n:
        nms_order = np.lexsort((ends, starts, -(ends - starts), -fscores))
        iou = _iou_matrix(starts, ends)
        kept_idx: list[int] = []
        for i in nms_order:
            if all(iou[i, j] < cfg.overlap_thd for j in kept_idx):
                kept_idx.append(int(i))
        sel = np.array(sorted(kept_idx), dtype=np.int64)
        starts, ends, tag_scores, fscores = (
            starts[sel], ends[sel], tag_scores[sel], fscores[sel])
        n = starts.shape[0]
    # ordered pairs (head != tail) — J1 bounded by k²
    if n >= 2:
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        mask = ii != jj
        hi, ti = ii[mask], jj[mask]
        rel = rel_scores_batch(enc, starts[hi], ends[hi], starts[ti], ends[ti])
        # top-k rels then threshold
        order = np.lexsort((ends[ti], starts[ti], ends[hi], starts[hi], -rel))
        order = order[: cfg.max_top_k_rels]
        hi, ti, rel = hi[order], ti[order], rel[order]
        thd = core.logit(cfg.rel_thd) if cfg.rel_thd != 0.5 else 0.0
        m = rel >= thd
        hi, ti, rel = hi[m], ti[m], rel[m]
    else:
        hi = ti = np.zeros(0, dtype=np.int64)
        rel = np.zeros(0, dtype=np.float32)
    return {
        "starts": starts, "ends": ends,
        "tag_scores": tag_scores, "filter_scores": fscores,
        "span_types": np.array(["event"] * starts.shape[0], dtype=object),
        "rel_h": hi, "rel_t": ti, "rel_scores": rel,
        "rel_types": np.array(["causal"] * hi.shape[0], dtype=object),
    }
