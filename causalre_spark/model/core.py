"""Frozen deterministic numeric model (the [NUM] stages of SURVEY.md §2.8).

The reference's numeric core is a PyTorch/HuggingFace stack
(``CRE Model/modules/layers_transformer_encoder_hf.py``,
``layers_token_tagging.py``, ``span_rep.py``, ``rel_rep.py``,
``layers_filtering.py``). Torch/transformers are not available in this
environment, and the pipeline's correctness surface is the *relational
algebra around the model*, so this module provides a frozen,
deterministic NumPy stand-in that preserves the reference's stage
structure and interfaces exactly:

  N1-N4  encode()            token reps (transformer+BiLSTM stand-in:
                             hash embeddings + neighbor mixing + L2 norm)
  N5     tagger_logits()     per-token B/E logits (BE mode,
                             layers_token_tagging.py:356-487: linear head,
                             sigmoid multi-label, predict_thd)
  N6/J2  decode_spans()      B-index x E-index pairing with range predicate
                             E >= B, width <= max_span_width; score =
                             mean(B_logit, E_logit)
                             (layers_token_tagging.py:105-175, 377-412)
  N7-N9  span_filter_score() span rep (endpoint/inner maxpool + width
                             feature, span_rep.py:182-251 'nathan' mode
                             simplified) -> binary filter logit
                             (layers_filtering.py:121-217)
  N10-12 rel_score()         head/context/tail rep concat
                             (rel_rep.py:444-487 between_window_context)
                             -> causal logit

All weights are derived from md5 digests of fixed strings — frozen,
reproducible across processes, machines and numpy versions. The single
process oracle (causalre_spark/oracle) and the Spark Arrow UDFs
(causalre_spark/model/udfs.py) both call THESE functions, so any
Spark-vs-oracle mismatch isolates a bug in the distributed algebra, not
in float jitter.

A real deployment swaps this module for a broadcast torch model loaded
once per Python worker (import-gated in model/udfs.py); every interface
stays the same.
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache

import numpy as np

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig

DIM = DEFAULT_CONFIG.hidden_dim  # stand-in hidden width (reference: 768)

# Causal trigger lexicon. The stand-in model's learned-ish behavior:
# spans open after boundaries, close before boundaries, and span pairs
# bridged by a trigger token score as causal. This mirrors what the
# trained reference model learns on causal-template corpora
# (dissertation §5) in a rule-checkable form.
CAUSAL_TRIGGERS = frozenset(
    {
        "caused", "causes", "cause", "causing",
        "led", "leads", "resulted", "results",
        "because", "due", "triggered", "triggers",
        "sparked", "provoked", "induced", "produced",
    }
)
BOUNDARY_TOKENS = CAUSAL_TRIGGERS | {".", ",", ";", "to"}

# sigmoid(x) >= thd  <=>  x >= logit(thd)
def logit(p: float) -> float:
    return math.log(p / (1.0 - p))


def _frozen_vec(name: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-random float32 vector in [-0.5, 0.5] from md5."""
    out = np.empty(dim, dtype=np.float32)
    i = 0
    block = 0
    while i < dim:
        digest = hashlib.md5(f"causalre:{name}:{block}".encode()).digest()
        chunk = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
        take = min(dim - i, chunk.shape[0])
        out[i : i + take] = chunk[:take] / 255.0 - 0.5
        i += take
        block += 1
    return out


# Frozen heads (reference: nn.Linear weights; model_manager.py:50-66 loads
# them from a checkpoint — here they are content-addressed constants).
W_B = _frozen_vec("tagger.begin", DIM)
W_E = _frozen_vec("tagger.end", DIM)
W_SPAN = _frozen_vec("span_filter", 2 * DIM + 1)   # [endpoint pool, inner pool... ] + width
W_REL = _frozen_vec("rel_head", 3 * DIM + 1)       # [head, context, tail] + dist
BOUNDARY_BOOST = np.float32(2.5)
TRIGGER_REL_BOOST = np.float32(4.0)
REL_BASE_PENALTY = np.float32(-2.0)


@lru_cache(maxsize=65536)
def token_embedding(token: str) -> np.ndarray:
    """Content-addressed token embedding (transformer-embedding stand-in)."""
    v = _frozen_vec("tok:" + token, DIM)
    v.setflags(write=False)
    return v


def encode(tokens: list[str], cfg: PipelineConfig = DEFAULT_CONFIG) -> np.ndarray:
    """N1-N4: token reps. Truncates to max_seq_len (data_processor.py:155-162).

    Neighbor mixing stands in for transformer attention + BiLSTM
    (layers_other.py:145-176); L2 row-norm stands in for layernorm.
    """
    toks = tokens[: cfg.max_seq_len]
    if not toks:
        return np.zeros((0, DIM), dtype=np.float32)
    emb = np.stack([token_embedding(t) for t in toks])
    mixed = emb.copy()
    mixed[1:] += 0.5 * emb[:-1]
    mixed[:-1] += 0.5 * emb[1:]
    norms = np.linalg.norm(mixed, axis=1, keepdims=True)
    np.maximum(norms, 1e-6, out=norms)
    return (mixed / norms).astype(np.float32)


def tagger_logits(
    tokens: list[str], reps: np.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG
) -> tuple[np.ndarray, np.ndarray]:
    """N5: per-token Begin/End logits (BE mode, sigmoid multi-label)."""
    n = reps.shape[0]
    toks = tokens[: cfg.max_seq_len]
    b = reps @ W_B
    e = reps @ W_E
    for i in range(n):
        if i == 0 or toks[i - 1] in BOUNDARY_TOKENS:
            b[i] += BOUNDARY_BOOST
        if i == n - 1 or toks[i + 1] in BOUNDARY_TOKENS:
            e[i] += BOUNDARY_BOOST
        if toks[i] in BOUNDARY_TOKENS:
            b[i] -= BOUNDARY_BOOST
            e[i] -= BOUNDARY_BOOST
    return b.astype(np.float32), e.astype(np.float32)


def decode_spans(
    b_logits: np.ndarray, e_logits: np.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG
) -> list[tuple[int, int, float]]:
    """N6/J2: B-index x E-index decode with range predicate.

    Returns (start, end_exclusive, score) — `end` exclusive matches the
    corpus convention (data_preparation.py:27). score = mean of the two
    logits (layers_token_tagging.py:105-175).
    """
    thd = logit(cfg.predict_thd)
    b_idx = np.nonzero(b_logits >= thd)[0]
    e_idx = np.nonzero(e_logits >= thd)[0]
    out = []
    for bi in b_idx:
        for ei in e_idx:
            if ei >= bi and (ei - bi) < cfg.max_span_width:
                out.append((int(bi), int(ei) + 1, float((b_logits[bi] + e_logits[ei]) / 2.0)))
    return out


def span_filter_score(tokens: list[str], reps: np.ndarray, start: int, end: int,
                      cfg: PipelineConfig = DEFAULT_CONFIG) -> float:
    """N7-N9: span rep -> binary keep-score (higher = keep).

    Span rep = [maxpool(interior), meanpool(interior), width/W] — a
    deterministic simplification of span_rep.py:182-251 ('nathan': window
    maxpools + width embedding + CLS); score = frozen linear head
    (layers_filtering.py:121-217 single-logit mode). A span whose
    interior crosses a boundary/trigger token is strongly penalized —
    the learned-model behavior on well-formed mentions, in rule form.
    """
    seg = reps[start:end]
    if seg.shape[0] == 0:
        return float(-1e4)
    feat = np.concatenate(
        [seg.max(axis=0), seg.mean(axis=0, dtype=np.float32),
         np.array([(end - start) / cfg.max_span_width], dtype=np.float32)]
    )
    score = np.float32(feat @ W_SPAN)
    toks = tokens[: cfg.max_seq_len]
    if any(t in BOUNDARY_TOKENS for t in toks[start:end]):
        score -= np.float32(5.0)
    return float(score)


def rel_score(
    tokens: list[str],
    reps: np.ndarray,
    head: tuple[int, int],
    tail: tuple[int, int],
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> float:
    """N10-N12: causal logit for an ordered (head, tail) span pair.

    Rep = [head maxpool, between-context maxpool, tail maxpool, dist]
    (rel_rep.py:444-487 'between_window_context' simplified: the context
    window here is exactly the between-span tokens). A causal trigger in
    the between-context is the dominant learned feature.
    """
    toks = tokens[: cfg.max_seq_len]
    h = reps[head[0] : head[1]]
    t = reps[tail[0] : tail[1]]
    if h.shape[0] == 0 or t.shape[0] == 0:
        return float(-1e4)
    lo, hi = min(head[1], tail[1]), max(head[0], tail[0])
    ctx = reps[lo:hi]
    ctx_pool = ctx.max(axis=0) if ctx.shape[0] else np.zeros(DIM, dtype=np.float32)
    dist = (tail[0] - head[0]) / cfg.max_seq_len
    feat = np.concatenate(
        [h.max(axis=0), ctx_pool, t.max(axis=0), np.array([dist], dtype=np.float32)]
    )
    score = np.float32(feat @ W_REL) + REL_BASE_PENALTY
    # directed: head must precede tail, with the gap being exactly a
    # causal trigger phrase ("caused", "led to", "resulted in", ...)
    gap = toks[head[1] : tail[0]]
    if (head[1] <= tail[0] and 1 <= len(gap) <= 2 and gap[0] in CAUSAL_TRIGGERS
            and all(g in CAUSAL_TRIGGERS or g in ("to", "in") for g in gap)):
        score += TRIGGER_REL_BOOST
    return float(score)
