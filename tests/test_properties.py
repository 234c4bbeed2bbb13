"""Property tests (SURVEY §5.2 item 4): algebraic invariants that must
hold for ANY input — idempotence of the greedy/suppression operators,
stability of iterative CC, text-function laws. Pure-Python twins are
exercised through hypothesis; the Spark operators share the same frozen
primitives, so these laws transfer."""

from hypothesis import given, settings
from hypothesis import strategies as st

from causalre_spark.config import DEFAULT_CONFIG
from causalre_spark.functions.text import fingerprint, normalize, simhash64
from causalre_spark.oracle.pipeline import iou

TEXT = st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    """Frozen spec: lowercase, ASCII punctuation -> space, collapse and
    trim SPACES. Control chars / non-ASCII pass through by design (the
    SQL twin does the same), so only space-hygiene is asserted."""
    n = normalize(s)
    assert normalize(n) == n
    assert "  " not in n
    assert not n.startswith(" ") and not n.endswith(" ")
    assert n == n.lower()


@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=8),
                min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_fingerprint_order_insensitive(tokens):
    a = fingerprint(" ".join(tokens))
    b = fingerprint(" ".join(reversed(tokens)))
    assert a == b                       # order-insensitive by construction
    assert fingerprint(" ".join(tokens + tokens)) == a   # multiplicity-insensitive


@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_simhash64_deterministic_and_bounded(tokens):
    h = simhash64(tokens)
    assert h == simhash64(list(tokens))
    assert 0 <= h < (1 << 64)


SPANS = st.lists(
    st.tuples(st.integers(0, 40), st.integers(1, 10),
              st.floats(-5, 5, allow_nan=False)),
    min_size=0, max_size=25,
).map(lambda xs: [{"start": s, "end": s + w, "filter_score": round(f, 4)}
                  for s, w, f in xs])


def _nms(spans, thd):
    """The oracle's greedy NMS order (oracle/pipeline.py doc_spans)."""
    order = sorted(spans, key=lambda r: (-r["filter_score"],
                                         -(r["end"] - r["start"]),
                                         r["start"], r["end"]))
    kept = []
    for r in order:
        if all(iou(r["start"], r["end"], k["start"], k["end"]) < thd for k in kept):
            kept.append(r)
    return sorted((k["start"], k["end"], k["filter_score"]) for k in kept)


@given(SPANS)
@settings(max_examples=150, deadline=None)
def test_nms_idempotent_and_conflict_free(spans):
    thd = DEFAULT_CONFIG.overlap_thd
    once = _nms(spans, thd)
    again = _nms([{"start": s, "end": e, "filter_score": f} for s, e, f in once], thd)
    assert again == once                          # idempotent
    for i, (s1, e1, _) in enumerate(once):        # no kept pair conflicts
        for s2, e2, _ in once[i + 1:]:
            assert iou(s1, e1, s2, e2) < thd


@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)), max_size=40),
       st.integers(1, 16))
@settings(max_examples=100, deadline=None)
def test_union_find_cc_stable_and_partitioning(edge_list, n_nodes):
    """CC assignment is a fixpoint: adding already-implied edges or
    re-running changes nothing; labels are the component minimum."""
    from causalre_spark.operators.linking import _union_find_components

    nodes = [f"n{i}" for i in range(n_nodes)]
    edges = [(f"n{a % n_nodes}", f"n{b % n_nodes}") for a, b in edge_list]
    lab = dict(_union_find_components(nodes, edges, lambda s: int(s[1:])))
    lab2 = dict(_union_find_components(nodes, edges + edges, lambda s: int(s[1:])))
    assert lab == lab2
    # each label is the min node-id in its component, and labels respect edges
    for a, b in edges:
        assert lab[a] == lab[b]
    for n in nodes:
        assert lab[n] <= int(n[1:])


@given(st.lists(st.tuples(st.integers(0, 20), st.integers(1, 5),
                          st.floats(-3, 3, allow_nan=False)), max_size=30))
@settings(max_examples=100, deadline=None)
def test_dedup_max_idempotent(rows):
    import numpy as np

    from causalre_spark.model.reference_math import dedup_max_score

    if not rows:
        return
    s = np.array([r[0] for r in rows], dtype=np.int64)
    e = np.array([r[0] + r[1] for r in rows], dtype=np.int64)
    sc = np.array([r[2] for r in rows], dtype=np.float32)
    s1, e1, c1 = dedup_max_score(s, e, sc)
    s2, e2, c2 = dedup_max_score(s1, e1, c1)
    assert (s1 == s2).all() and (e1 == e2).all() and (c1 == c2).all()
    # keys unique, and every max really is the max of its duplicates
    keys = list(zip(s1.tolist(), e1.tolist()))
    assert len(keys) == len(set(keys))
    for (ks, ke), kc in zip(keys, c1.tolist()):
        want = max(float(x) for (a, b, x) in zip(s.tolist(), e.tolist(), sc.tolist())
                   if (a, b) == (ks, ke))
        assert abs(kc - want) < 1e-6


@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=12))
@settings(max_examples=100, deadline=None)
def test_chunk_algebra_python_twin(n_toks, size, stride):
    """Pure-python twin of chunk_documents' window algebra (the Spark
    expression is sequence(0, n-1, stride) + slice): starts cover every
    token, overlap = size - stride where applicable, final partial
    window kept."""
    toks = [f"t{i}" for i in range(n_toks)]
    # a start survives only while the previous window has not reached
    # the end (the duplicate-suffix guard in chunk_documents)
    starts = [s for s in range(0, n_toks, stride)
              if s == 0 or s < n_toks - size + stride]
    chunks = [toks[s:s + size] for s in starts]
    # no chunk is a suffix of its predecessor
    for a, b in zip(chunks, chunks[1:]):
        assert not (len(b) <= len(a) and a[-len(b):] == b)
    # coverage: every token index appears in at least one chunk — holds
    # exactly when stride <= size (stride > size skips tokens by design)
    covered = set()
    for s, c in zip(starts, chunks):
        covered.update(range(s, s + len(c)))
    if stride <= size:
        assert covered == set(range(n_toks))
    else:
        assert covered < set(range(n_toks)) or n_toks <= size
    # chunk lengths: all == size except possibly trailing ones
    for s, c in zip(starts, chunks):
        assert len(c) == min(size, n_toks - s)
    # reconstruction when stride <= size: stride-prefixes of the
    # leading chunks + the final chunk in full
    if stride <= size:
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c[:stride])
        rebuilt.extend(chunks[-1])
        assert rebuilt == toks


@given(st.lists(st.integers(min_value=0, max_value=255), min_size=2,
                max_size=6),
       st.integers(min_value=0, max_value=255))
@settings(max_examples=100, deadline=None)
def test_zorder_monotone_per_dimension(xs, y):
    """Morton interleave is order-preserving in each dimension when the
    other is fixed — the property that makes zkey ranges prune 1-D
    slices of a 2-D predicate."""
    def z(x, yy, bits=8):
        return sum((((x >> i) & 1) << (2 * i)) + (((yy >> i) & 1) << (2 * i + 1))
                   for i in range(bits))

    xs_sorted = sorted(set(xs))
    zs = [z(x, y) for x in xs_sorted]
    assert zs == sorted(zs)
    ys_sorted = sorted(set(xs))  # reuse as y values, x fixed
    zs2 = [z(y, v) for v in ys_sorted]
    assert zs2 == sorted(zs2)


@given(st.lists(st.integers(min_value=1, max_value=50), min_size=1,
                max_size=30),
       st.integers(min_value=4, max_value=64))
@settings(max_examples=100, deadline=None)
def test_packing_prefix_scan_invariants(lengths, L):
    """Python twin of pack_sequences' per-shard algebra: offsets are a
    gapless prefix sum, pack_id = start // L, straddle iff the doc
    crosses a pack boundary, and total stream length is preserved."""
    off = 0
    for n in lengths:
        start, end = off, off + n
        pack = start // L
        straddle = (start // L) != ((end - 1) // L)
        assert straddle == (end - 1 >= (pack + 1) * L)
        if not straddle:
            assert end - 1 < (pack + 1) * L
        off = end
    assert off == sum(lengths)


def test_grid_constant_lint():
    """Source linter for the irrational-offset grid policy: every
    occurrence of the grid constant in the package must use the exact
    canonical digits (a transposed digit at one site would silently
    reintroduce the cross-engine rounding-tie class), and every
    occurrence must sit in a floor(x * 10^k + OFF) / 10^k form with a
    power-of-ten scale."""
    import pathlib
    import re

    from causalre_spark.functions.grid import GRID_OFFSET, grid_col, grid_sql

    assert repr(GRID_OFFSET) == "0.3141592653589793"
    pkg = pathlib.Path(__file__).resolve().parent.parent / "causalre_spark"
    approx = re.compile(r"0\.31415\d*")
    canonical = "0.3141592653589793"
    hits = 0
    for py in pkg.rglob("*.py"):
        src = py.read_text()
        for m in approx.finditer(src):
            assert m.group(0) == canonical, (py.name, m.group(0))
            hits += 1
            # where a scale multiplier precedes the constant on the same
            # statement, it must be one of the two sanctioned powers of
            # ten (constant DEFINITIONS like pagerank's _OFF have none)
            window = src[max(0, m.start() - 200):m.start()]
            scales = re.findall(r"\* (\d+)\.0", window)
            if scales:
                assert set(scales[-1:]) <= {"100", "10000"}, (py.name, scales)
    # the policy is actually in force across the tree: Column-side sites
    # were migrated to grid_col (ADVICE r03 — helpers must have call
    # sites, not just exist), so the remaining inline occurrences are
    # the SQL-string twins plus the canonical definition
    assert hits >= 15
    grid_calls = sum(
        py.read_text().count("grid_col(") for py in pkg.rglob("*.py")
        if py.name != "grid.py")
    assert grid_calls >= 12, grid_calls  # helper is THE Column-side policy
    # helper twins agree with the inline form
    assert grid_sql("x", 4) == "floor((x) * 10000.0 + 0.3141592653589793) / 10000.0"
    assert grid_sql("x", 2) == "floor((x) * 100.0 + 0.3141592653589793) / 100.0"
    assert grid_col is not None
