"""Faithful numeric-core port (model/reference_math.py): per-stage unit
tests on toy fixtures mirroring the reference's own smoke blocks
(layers_token_tagging.py:506-571 toy batch, rel_rep.py:598-634 shapes),
plus end-to-end reference-profile Spark-vs-oracle parity."""

import numpy as np
import pytest

from causalre_spark.config import PipelineConfig
from causalre_spark.model import core
from causalre_spark.model import reference_math as rm

CFG = PipelineConfig(model_profile="reference")


# ---------------------------------------------------------------- F4

def test_subword_split_and_map_roundtrip():
    # real vendored WordPiece vocab (tools/build_wordpiece_vocab.py):
    # in-vocab-coverable words reconstruct exactly; the w2sw map is
    # contiguous and covers all subwords once (hf.py:66-86 semantics)
    words = ["a", "the", "deterministic", "accident", "flooding"]
    subwords, w2sw = rm.words_to_subwords(words)
    assert len(w2sw) == len(words)
    for w, idxs in zip(words, w2sw):
        rebuilt = "".join(subwords[i].removeprefix("##") for i in idxs)
        assert rebuilt == w
    flat = [i for idxs in w2sw for i in idxs]
    assert flat == list(range(len(subwords)))
    # greedy longest-match-first: common whole words stay unsplit,
    # continuations carry '##', words outside the alphabet become [UNK]
    assert rm.subword_split("the") == ["the"]
    assert all(p.startswith("##") for p in rm.subword_split("deterministic")[1:])
    assert rm.subword_split("日本語") == ["[UNK]"]
    assert rm.subword_split("x" * 101) == ["[UNK]"]  # HF max_input_chars
    # legacy fixed-width fallback still available and unchanged
    assert rm.subword_split_fixed("beta") == ["beta"]
    assert rm.subword_split_fixed("deterministic")[0] == "dete"


def test_wordpiece_vocab_wellformed():
    from causalre_spark.model.wordpiece_vocab import VOCAB, VOCAB_SET

    assert len(VOCAB) == len(VOCAB_SET)  # no duplicates
    assert "[UNK]" in VOCAB_SET and "[CLS]" in VOCAB_SET
    # every multi-char continuation piece has the '##' prefix convention
    assert all(v.startswith("##") or not v.startswith("#") or v in
               ("#", "##") or v.startswith("[") for v in VOCAB)


# ---------------------------------------------------------------- N2 / N3

def test_subtoken_pooling_modes():
    """layers_transformer_encoder_hf.py:132-184: all five modes."""
    sw_reps = np.arange(12, dtype=np.float32).reshape(4, 3)  # 4 subwords, dim 3
    w2sw = [[0], [1, 2, 3]]
    first = rm.subtoken_pool(sw_reps, w2sw, "first")[:, :3]
    last = rm.subtoken_pool(sw_reps, w2sw, "last")[:, :3]
    mean = rm.subtoken_pool(sw_reps, w2sw, "mean")[:, :3]
    mx = rm.subtoken_pool(sw_reps, w2sw, "maxpool")[:, :3]
    assert np.allclose(first[1], sw_reps[1])
    assert np.allclose(last[1], sw_reps[3])
    assert np.allclose(mean[1], sw_reps[1:4].mean(axis=0))
    assert np.allclose(mx[1], sw_reps[1:4].max(axis=0))
    fl = rm.subtoken_pool(sw_reps, w2sw, "first_last")
    assert fl.shape[1] == 6                     # first_last doubles the dim
    assert np.allclose(fl[1], np.concatenate([sw_reps[1], sw_reps[3]]))
    with pytest.raises(ValueError):
        rm.subtoken_pool(sw_reps, w2sw, "bogus")


def test_first_last_reprojection_restores_hidden():
    """N3 (hf.py:53-62): reprojection pulls 2*D back to D."""
    words = ["alpha", "considerable", "downstream"]
    subwords, w2sw = rm.words_to_subwords(words)
    sw_reps, _ = rm.encode_subwords(subwords)
    fl = rm.subtoken_pool(sw_reps, w2sw, "first_last")
    assert fl.shape == (3, 2 * rm.DIM)
    out = rm.reproject(fl)
    assert out.shape == (3, rm.DIM)
    # identity when dims already match
    assert rm.reproject(out) is out


# ---------------------------------------------------------------- N4

def test_lstm_enrich_shape_skip_and_direction():
    reps = rm.encode_subwords([f"t{i}" for i in range(12)])[0]
    out = rm.lstm_enrich(reps)
    assert out.shape == reps.shape
    assert np.allclose(out, rm.lstm_enrich(reps))        # deterministic
    assert not np.allclose(out, reps)                     # it does something
    # bidirectional: reversing the input is NOT just a reversal of output
    out_rev = rm.lstm_enrich(reps[::-1].copy())
    assert not np.allclose(out_rev[::-1], out)
    assert rm.lstm_enrich(np.zeros((0, rm.DIM), dtype=np.float32)).shape == (0, rm.DIM)


# ---------------------------------------------------------------- N5/N6 BE + BECO

def test_be_decode_range_predicate():
    b = np.array([5.0, -9.0, 5.0, -9.0], dtype=np.float32)
    e = np.array([-9.0, 5.0, 5.0, -9.0], dtype=np.float32)
    cfg = PipelineConfig(predict_thd=0.3, max_span_width=3)
    starts, ends, scores = rm.decode_be(b, e, cfg)
    got = set(zip(starts.tolist(), ends.tolist()))
    # B at {0, 2}, E at {1, 2}; E >= B, width < 3
    assert got == {(0, 2), (0, 3), (2, 3)}
    i = list(zip(starts.tolist(), ends.tolist())).index((2, 3))
    assert scores[i] == pytest.approx(5.0)               # mean(B=5, E=5)


def test_beco_decode_unions_singles_and_dedup_max():
    """BECO toy (tagging.py:203-256): preds B,E,C,O from argmax; the
    single-token C span and the BC x EC multi-token spans, unique-max."""
    # 5 tokens with forced classes: B, O, C, E, O
    logits = np.full((5, 4), -10.0, dtype=np.float32)
    logits[0, 0] = 3.0   # B
    logits[1, 3] = 1.0   # O
    logits[2, 2] = 2.0   # C (both a start and an end)
    logits[3, 1] = 4.0   # E
    logits[4, 3] = 1.0   # O
    cfg = PipelineConfig(max_span_width=4)
    starts, ends, scores = rm.decode_beco(logits, cfg)
    got = dict(zip(zip(starts.tolist(), ends.tolist()), scores.tolist()))
    # BC = {0, 2}, EC = {2, 3}; multi: (0,3) (0,4) (2,4); single C: (2,3)
    assert set(got) == {(0, 3), (0, 4), (2, 4), (2, 3)}
    # multi score = (B logit at start, class B) + (E logit at end-1, class E)
    assert got[(0, 4)] == pytest.approx((3.0 + 4.0) / 2)
    assert got[(0, 3)] == pytest.approx((3.0 + logits[2, 1]) / 2)
    assert got[(2, 3)] == pytest.approx(2.0)               # single-token C logit
    # dedup-max: single (2,3) does not collide here; force a collision
    s = np.array([1, 1, 2], dtype=np.int64)
    e = np.array([3, 3, 4], dtype=np.int64)
    sc = np.array([0.5, 0.9, 0.1], dtype=np.float32)
    ds, de, dsc = rm.dedup_max_score(s, e, sc)
    assert list(zip(ds.tolist(), de.tolist(), dsc.tolist())) == [(1, 3, np.float32(0.9)), (2, 4, np.float32(0.1))]


# ---------------------------------------------------------------- N7/N8

def test_nathan_span_rep_edge_cases():
    """span_rep.py:215-251 edge cases: width-1 span repeats the start
    rep; no-inner spans reuse the start-window pool; alpha windows."""
    reps = rm.encode_subwords([f"w{i}" for i in range(20)])[0]
    cls = np.zeros(rm.DIM, dtype=np.float32)
    cfg = PipelineConfig(span_win_alpha=0.2, max_span_width=80)
    starts = np.array([3, 5, 0], dtype=np.int64)
    ends = np.array([4, 7, 20], dtype=np.int64)      # widths 1, 2, 20
    out = rm.nathan_span_reps(reps, starts, ends, cls, cfg)
    assert out.shape == (3, rm.DIM)
    assert np.isfinite(out).all()
    # width 1: start=inner=end pools identical => rep equals FFN of
    # [r, r, r, width_emb(1), cls]
    win = rm.width_embedding_table(cfg.max_span_width)
    feat = np.concatenate([reps[3], reps[3], reps[3], win[1], cls]).astype(np.float32)
    want = rm._ffn_projection(feat[None, :], "span_proj", feat.shape[0])[0]
    assert np.allclose(out[0], want, atol=1e-5)
    # width 20, alpha 0.2 -> win 4: start pool = max [0,4), end pool = max [16,20)
    feat20 = np.concatenate([
        reps[0:4].max(axis=0), reps[4:16].max(axis=0), reps[16:20].max(axis=0),
        win[20], cls]).astype(np.float32)
    want20 = rm._ffn_projection(feat20[None, :], "span_proj", feat20.shape[0])[0]
    assert np.allclose(out[2], want20, atol=1e-5)
    # modified-for-rels variant drops width + cls (different projection)
    out_rel = rm.nathan_span_reps(reps, starts, ends, None, cfg,
                                  with_width=False, with_cls=False,
                                  name="span_proj_rel")
    assert out_rel.shape == (3, rm.DIM)
    assert not np.allclose(out_rel[0], out[0])


# ---------------------------------------------------------------- N9

def test_filter_heads():
    reps = rm.encode_subwords(["a", "b", "c"])[0]
    single = rm.filter_head_single(reps, "span_filter")
    double = rm.filter_head_double(reps, "span_filter_d")
    assert single.shape == (3,) and double.shape == (3,)
    assert np.allclose(single, rm.filter_head_single(reps, "span_filter"))


# ---------------------------------------------------------------- N10

def test_rel_context_masks_window_between_minus_interiors():
    """rel_rep.py:472-487 + :286-317: (±win ∪ between) − interiors."""
    h_s, h_e = np.array([2]), np.array([4])    # head [2,4)
    t_s, t_e = np.array([8]), np.array([10])   # tail [8,10)
    m = rm.rel_context_masks(14, h_s, h_e, t_s, t_e, window=2)[0]
    want = set()
    want |= {0, 1}           # head left window [0,2)
    want |= {4, 5}           # head right window [4,6)
    want |= {6, 7}           # tail left window [6,8)
    want |= {10, 11}         # tail right window [10,12)
    want |= set(range(2, 10))  # between [min_start, max_end)
    want -= {2, 3, 8, 9}     # minus interiors
    assert set(np.nonzero(m)[0].tolist()) == want


def test_crossattn_no_context_fallback():
    """rel_rep.py:320-341: all-masked context rows get the learned
    no-context embedding (config rel_no_context_rep=emb)."""
    token_reps = rm.encode_subwords([f"x{i}" for i in range(6)])[0]
    head = token_reps[:2]
    tail = token_reps[2:4]
    masks = np.zeros((2, 6), dtype=bool)
    masks[1, 3] = True       # row 0 has NO context, row 1 has one token
    out = rm.crossattn_pool(head, tail, token_reps, masks)
    assert np.allclose(out[0], rm._vec("rel_ctx.no_context_emb", rm.DIM))
    assert not np.allclose(out[1], rm._vec("rel_ctx.no_context_emb", rm.DIM))


# ---------------------------------------------------------------- N11

def test_graph_transformer_shapes_skip_and_ablation():
    """layers_other.py:115-141 + model.py:996-1043: shapes preserved,
    enrichment changes reps (the dissertation's graph-ablation effect:
    with use_graph=False the pipeline consumes raw span/rel reps)."""
    span_reps = rm.encode_subwords([f"s{i}" for i in range(4)])[0]
    rel_reps = rm.encode_subwords([f"r{i}" for i in range(3)])[0]
    nodes, edges = rm.graph_transformer(span_reps, rel_reps)
    assert nodes.shape == span_reps.shape and edges.shape == rel_reps.shape
    assert not np.allclose(nodes, span_reps)   # enriched != input (ablation visible)
    n2, e2 = rm.graph_transformer(span_reps, rel_reps)
    assert np.allclose(nodes, n2) and np.allclose(edges, e2)
    # empty graph passes through
    z = np.zeros((0, rm.DIM), dtype=np.float32)
    nz, ez = rm.graph_transformer(z, z)
    assert nz.shape == (0, rm.DIM) and ez.shape == (0, rm.DIM)


def test_graph_ablation_changes_triples():
    """use_graph toggling changes the decoded span types for at least
    some docs (mirrors the dissertation ablation: graph on/off is a
    semantic difference, not a no-op)."""
    from causalre_spark.extract import tokenize
    from causalre_spark.model import batch
    from causalre_spark.sources.corpus import gen_page

    cfg_on = PipelineConfig(model_profile="reference", use_graph=True)
    cfg_off = PipelineConfig(model_profile="reference", use_graph=False)
    diff = 0
    for i in range(6):
        pg = gen_page(i)
        if pg["lang"] != "en":
            continue
        toks = tokenize(pg["text"])
        a = batch.doc_extract(toks, cfg_on)
        b = batch.doc_extract(toks, cfg_off)
        if (a["starts"].tolist(), a["span_types"].tolist()) != (
                b["starts"].tolist(), b["span_types"].tolist()):
            diff += 1
    assert diff > 0


# ---------------------------------------------------------------- N12

def test_unilabel_multilabel_decode():
    logits = np.array([[2.0, -1.0], [-1.0, 3.0]], dtype=np.float32)
    ids, probs = rm.decode_unilabel(logits)
    assert ids.tolist() == [0, 1]
    assert probs[1] == pytest.approx(1 / (1 + np.exp(-4.0)), abs=1e-6)
    keep, p = rm.decode_multilabel(np.array([[0.5], [-3.0]], dtype=np.float32), 0.3)
    assert keep[:, 0].tolist() == [True, False]


# ---------------------------------------------------------------- end-to-end

def test_reference_profile_pipeline_parity(spark):
    """Full Spark pipeline under model_profile='reference' matches the
    oracle's independent re-derivation exactly — spans, typed rels, and
    triples — proving the faithful numeric core is integrated end-to-end,
    not just unit-tested."""
    from causalre_spark.oracle.pipeline import oracle_pipeline
    from causalre_spark.pipeline import run_pipeline
    from causalre_spark.sources.corpus import gen_page, synth_pages_df

    n = 12
    res = run_pipeline(spark, synth_pages_df(spark, n, partitions=3), cfg=CFG)
    oracle = oracle_pipeline([gen_page(i) for i in range(n)], CFG)
    got_spans = {(r.url, r.start, r.end, r.span_type, round(r.filter_score, 4))
                 for r in res["spans"].collect()}
    want_spans = {(s["url"], s["start"], s["end"], s["span_type"],
                   round(s["filter_score"], 4)) for s in oracle["spans"]}
    assert got_spans == want_spans and len(got_spans) > 0
    got_rels = {(r.url, r.h_start, r.h_end, r.t_start, r.t_end, r.rel_type,
                 round(r.rel_score, 4)) for r in res["relations"].collect()}
    want_rels = {(r["url"], r["h_start"], r["h_end"], r["t_start"], r["t_end"],
                  r["rel_type"], round(r["rel_score"], 4))
                 for r in oracle["relations"]}
    assert got_rels == want_rels
    got_triples = {(r.cause_id, r.predicate, r.effect_id, r.n_evidence)
                   for r in res["triples"].collect()}
    want_triples = {(t["cause_id"], t["predicate"], t["effect_id"], t["n_evidence"])
                    for t in oracle["triples"]}
    assert got_triples == want_triples


def test_beco_profile_udf_oracle_parity():
    """BECO tagging mode end-to-end at the doc level: the UDF-side fused
    extraction and the oracle's independent re-derivation agree exactly
    (second decode mode behind the config switch, tagging.py:182-348)."""
    from causalre_spark.extract import tokenize
    from causalre_spark.model import batch
    from causalre_spark.oracle.pipeline import doc_extract_reference_oracle
    from causalre_spark.sources.corpus import gen_page

    cfg = PipelineConfig(model_profile="reference", tagging_mode="BECO")
    checked = 0
    for i in range(8):
        pg = gen_page(i)
        if pg["lang"] != "en":
            continue
        toks = tokenize(pg["text"])
        r = batch.doc_extract(toks, cfg)
        spans, rels = doc_extract_reference_oracle(toks, cfg)
        got = set(zip(r["starts"].tolist(), r["ends"].tolist(),
                      r["span_types"].tolist()))
        want = {(s["start"], s["end"], s["span_type"]) for s in spans}
        assert got == want
        got_r = set(zip([int(r["starts"][h]) for h in r["rel_h"]],
                        [int(r["starts"][t]) for t in r["rel_t"]],
                        r["rel_types"].tolist()))
        want_r = {(x["h_start"], x["t_start"], x["rel_type"]) for x in rels}
        assert got_r == want_r
        checked += 1
    assert checked >= 3


# ------------------------------------------- N8/N10 non-default modes

def test_span_rep_mode_expected_values():
    """span_rep.py:14-70 (graphER first/last), :76-109 (firstlast),
    :117-175 (spert): each mode's rep recomputed independently from the
    frozen weight tables."""
    reps = rm.encode_subwords([f"m{i}" for i in range(12)])[0]
    cls = rm.encode_subwords(["clsrep"])[1]
    cfg = PipelineConfig(max_span_width=10)
    starts = np.array([1, 4], dtype=np.int64)
    ends = np.array([3, 9], dtype=np.int64)

    # firstlast_grapher: relu BEFORE the projection
    flg = rm.firstlast_grapher_span_reps(reps, starts, ends)
    feat = np.maximum(np.concatenate([reps[1], reps[2]]), 0.0).astype(np.float32)
    want = rm._ffn_projection(feat[None, :], "span_flg", 2 * rm.DIM)[0]
    assert np.allclose(flg[0], want, atol=1e-5)

    # firstlast: plain endpoint concat (alpha=1 window)
    fl = rm.firstlast_span_reps(reps, starts, ends)
    feat = np.concatenate([reps[4], reps[8]]).astype(np.float32)
    want = rm._ffn_projection(feat[None, :], "span_fl", 2 * rm.DIM)[0]
    assert np.allclose(fl[1], want, atol=1e-5)
    assert not np.allclose(flg[0], fl[0])  # independent frozen weights

    # spert: whole-span maxpool + width emb + cls
    sp = rm.spert_span_reps(reps, starts, ends, cls, cfg)
    wtab = rm.width_embedding_table(cfg.max_span_width)
    feat = np.concatenate([reps[4:9].max(axis=0), wtab[5], cls]).astype(np.float32)
    want = rm._ffn_projection(feat[None, :], "span_spert", feat.shape[0])[0]
    assert np.allclose(sp[1], want, atol=1e-5)
    # width/cls off (modified-for-rels shape)
    sp2 = rm.spert_span_reps(reps, starts, ends, None, cfg,
                             with_width=False, with_cls=False)
    feat2 = reps[1:3].max(axis=0).astype(np.float32)
    want2 = rm._ffn_projection(feat2[None, :], "span_spert", rm.DIM)[0]
    assert np.allclose(sp2[0], want2, atol=1e-5)


def test_attn_span_rep_independent_mha_twin():
    """span_rep.py:260-320 SpanAttentionPoolerSelf: the pooled CLS row
    recomputed by an independent 4-head MHA implementation (explicit
    einsum-free loops) from the same frozen weights; plus the pooling
    is position-free — spans with identical token content pool
    identically."""
    base = rm.encode_subwords([f"a{i}" for i in range(10)])[0].copy()
    base[6:8] = base[2:4]  # span B [6,8) repeats span A [2,4) content
    cfg = PipelineConfig(max_span_width=10)
    starts = np.array([2, 6, 0], dtype=np.int64)
    ends = np.array([4, 8, 2], dtype=np.int64)
    cls = rm.encode_subwords(["c"])[1]
    out = rm.attn_span_reps(base, starts, ends, cls, cfg)
    assert out.shape == (3, rm.DIM) and np.isfinite(out).all()
    assert np.allclose(out[0], out[1], atol=1e-5)      # same content
    assert not np.allclose(out[0], out[2], atol=1e-3)  # different content

    # independent twin for span A
    name = "span_attnp"
    pooler = rm._vec(f"{name}.cls_emb", rm.DIM).astype(np.float32)
    seq = np.concatenate([pooler[None, :], base]).astype(np.float32)
    wq = rm._mat(f"{name}.attn.wq", rm.DIM, rm.DIM)
    wk = rm._mat(f"{name}.attn.wk", rm.DIM, rm.DIM)
    wv = rm._mat(f"{name}.attn.wv", rm.DIM, rm.DIM)
    wo = rm._mat(f"{name}.attn.wo", rm.DIM, rm.DIM)
    bq, bk = rm._vec(f"{name}.attn.bq", rm.DIM), rm._vec(f"{name}.attn.bk", rm.DIM)
    bv, bo = rm._vec(f"{name}.attn.bv", rm.DIM), rm._vec(f"{name}.attn.bo", rm.DIM)
    valid = [0, 3, 4]  # cls + span [2,4) shifted by 1
    q = pooler @ wq + bq
    k = seq @ wk + bk
    v = seq @ wv + bv
    dk = rm.DIM // rm.SPAN_ATTN_HEADS
    heads = []
    for h in range(rm.SPAN_ATTN_HEADS):
        sl = slice(h * dk, (h + 1) * dk)
        sc = np.array([float(q[sl] @ k[j, sl]) / np.sqrt(dk) for j in valid])
        w = np.exp(sc - sc.max())
        w /= w.sum()
        heads.append(sum(wi * v[j, sl] for wi, j in zip(w, valid)))
    attn = np.concatenate(heads) @ wo + bo
    pooled = pooler + rm._layer_norm(attn[None, :].astype(np.float32))[0]
    wtab = rm.width_embedding_table(cfg.max_span_width)
    feat = np.concatenate([pooled, wtab[2], cls]).astype(np.float32)
    want = rm._ffn_projection(feat[None, :], f"{name}.proj", feat.shape[0])[0]
    assert np.allclose(out[0], want, atol=1e-4)


def test_rel_context_mask_modes():
    """rel_rep.py:383-392 (between) and :400-436 (window) base masks,
    minus interiors; their union is the default between_window mask."""
    h_s, h_e = np.array([2]), np.array([4])
    t_s, t_e = np.array([8]), np.array([10])
    bw = rm.rel_context_masks(14, h_s, h_e, t_s, t_e, 2, "between_window")[0]
    bt = rm.rel_context_masks(14, h_s, h_e, t_s, t_e, 2, "between")[0]
    wd = rm.rel_context_masks(14, h_s, h_e, t_s, t_e, 2, "window")[0]
    assert set(np.nonzero(bt)[0].tolist()) == {4, 5, 6, 7}
    assert set(np.nonzero(wd)[0].tolist()) == {0, 1, 4, 5, 6, 7, 10, 11}
    assert (bw == (bt | wd)).all()
    with pytest.raises(ValueError):
        rm.rel_context_masks(14, h_s, h_e, t_s, t_e, 2, "bogus")


def test_rel_rep_modes_expected_and_dispatch():
    """rel_rep.py:19-88 no_context expected value; window/between chains
    produce mode-distinct finite reps; doc_extract_reference runs green
    under every (span_mode, rel_mode) combination and unknown modes fail
    loudly."""
    reps = rm.encode_subwords([f"r{i}" for i in range(14)])[0]
    cfg = PipelineConfig(model_profile="reference")
    starts = np.array([2, 8], dtype=np.int64)
    ends = np.array([4, 10], dtype=np.int64)
    srel = rm.span_reps_by_mode(reps, starts, ends, None, cfg,
                                with_width=False, with_cls=False,
                                variant="_rel")
    h_idx = np.array([0], dtype=np.int64)
    t_idx = np.array([1], dtype=np.int64)
    nc = rm.rel_reps_no_context(srel, h_idx, t_idx)
    feat = np.concatenate([srel[0], srel[1]]).astype(np.float32)
    want = rm._ffn_projection(feat[None, :], "rel_nc_proj", 2 * rm.DIM)[0]
    assert np.allclose(nc[0], want, atol=1e-5)

    outs = {}
    for mode in rm.REL_MODES:
        c = PipelineConfig(model_profile="reference", rel_mode=mode)
        outs[mode] = rm.rel_reps_by_mode(reps, srel, starts, ends,
                                         h_idx, t_idx, c)
        assert outs[mode].shape == (1, rm.DIM)
        assert np.isfinite(outs[mode]).all()
    vals = list(outs.values())
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            assert not np.allclose(vals[i], vals[j], atol=1e-3)

    # e2e: every mode combination decodes a real doc without error
    from causalre_spark.extract import tokenize
    from causalre_spark.sources.corpus import gen_page
    toks = tokenize(gen_page(0)["text"])
    for sm in rm.SPAN_MODES:
        for rmode in rm.REL_MODES:
            c = PipelineConfig(model_profile="reference",
                               span_mode=sm, rel_mode=rmode)
            r = rm.doc_extract_reference(toks, c)
            assert np.isfinite(r["filter_scores"]).all()
            assert r["starts"].shape == r["ends"].shape
    with pytest.raises(ValueError):
        rm.doc_extract_reference(toks, PipelineConfig(
            model_profile="reference", span_mode="bogus"))
    with pytest.raises(ValueError):
        rm.doc_extract_reference(toks, PipelineConfig(
            model_profile="reference", rel_mode="bogus"))


def test_nondefault_mode_udf_oracle_parity():
    """End-to-end parity for NON-default span/rel modes: the fused UDF
    extraction and the independent oracle re-derivation both dispatch
    on cfg.span_mode/cfg.rel_mode and must agree exactly (the r04
    review found the oracle hardcoded the defaults, leaving the new
    modes without a real parity gate)."""
    from causalre_spark.extract import tokenize
    from causalre_spark.model import batch
    from causalre_spark.oracle.pipeline import doc_extract_reference_oracle
    from causalre_spark.sources.corpus import gen_page

    for sm, rmode in (("spert", "no_context"),
                      ("firstlast", "between_context"),
                      ("firstlast_grapher", "window_context")):
        cfg = PipelineConfig(model_profile="reference",
                             span_mode=sm, rel_mode=rmode)
        checked = 0
        for i in range(6):
            pg = gen_page(i)
            if pg["lang"] != "en":
                continue
            toks = tokenize(pg["text"])
            r = batch.doc_extract(toks, cfg)
            spans, rels = doc_extract_reference_oracle(toks, cfg)
            got = set(zip(r["starts"].tolist(), r["ends"].tolist()))
            want = {(s["start"], s["end"]) for s in spans}
            assert got == want, (sm, rmode, i)
            got_r = set(zip([int(r["starts"][h]) for h in r["rel_h"]],
                            [int(r["starts"][t]) for t in r["rel_t"]]))
            want_r = {(x["h_start"], x["t_start"]) for x in rels}
            assert got_r == want_r, (sm, rmode, i)
            checked += 1
        assert checked >= 2
