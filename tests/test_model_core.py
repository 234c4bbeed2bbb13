"""Frozen model math: determinism and decode semantics.

Mirrors the reference's inline smoke tests
(layers_token_tagging.py:506-571 — toy-batch BE decode assertions).
"""

import numpy as np

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig
from causalre_spark.model import core


def test_weights_frozen():
    # content-addressed weights never drift
    assert abs(float(core.W_B[0]) - (core._frozen_vec("tagger.begin", core.DIM)[0])) == 0
    v1, v2 = core.token_embedding("rain"), core.token_embedding("rain")
    assert np.array_equal(v1, v2)
    assert not np.array_equal(core.token_embedding("rain"), core.token_embedding("snow"))


def test_encode_shapes_and_truncation():
    cfg = PipelineConfig(max_seq_len=5)
    reps = core.encode(["a"] * 10, cfg)
    assert reps.shape == (5, core.DIM)
    assert core.encode([], cfg).shape == (0, core.DIM)
    # unit rows
    assert np.allclose(np.linalg.norm(reps, axis=1), 1.0, atol=1e-5)


def test_decode_spans_range_predicate():
    cfg = PipelineConfig(max_span_width=3, predict_thd=0.3)
    b = np.array([10.0, -10.0, 10.0, -10.0], dtype=np.float32)
    e = np.array([-10.0, 10.0, -10.0, 10.0], dtype=np.float32)
    got = {(s, t) for (s, t, _) in core.decode_spans(b, e, cfg)}
    # B at {0,2}, E at {1,3}; (ei-bi) < 3 excludes (0,4) (token width 4)
    assert got == {(0, 2), (2, 4)}
    # scores = mean of logits
    sc = dict(((s, t), v) for (s, t, v) in core.decode_spans(b, e, cfg))
    assert sc[(0, 2)] == 10.0


def test_trigger_bridge_controls_rel_score():
    toks = "heavy rain caused severe flooding .".split()
    reps = core.encode(toks)
    pos = core.rel_score(toks, reps, (0, 2), (3, 5))   # gap = ['caused']
    rev = core.rel_score(toks, reps, (3, 5), (0, 2))   # wrong direction
    assert pos > 0 > rev


def test_boundary_interior_penalty():
    toks = "rain caused floods .".split()
    reps = core.encode(toks)
    clean = core.span_filter_score(toks, reps, 2, 3)
    crossing = core.span_filter_score(toks, reps, 0, 3)  # contains 'caused'
    assert clean > crossing


def test_decode_threshold_matches_sigmoid():
    cfg = DEFAULT_CONFIG
    thd = core.logit(cfg.predict_thd)
    assert abs(1 / (1 + np.exp(-thd)) - cfg.predict_thd) < 1e-9
