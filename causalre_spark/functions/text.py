"""Frozen text normalization / shingling / fingerprint helpers.

Pure-Python twins of the SQL used in the Spark operators; the oracle and
the Spark side must agree exactly, so everything here is defined to be
expressible with portable SQL (lower/regexp_replace/substring/md5).
"""

from __future__ import annotations

import re

from causalre_spark.functions.hashing import md5_long

# Normalization v2 (FROZEN): lowercase; ASCII punctuation -> space;
# collapse space runs; trim. Non-ASCII characters pass through
# unchanged. Implemented with translate + split/filter/join because
# Spark's regexp_replace costs ~50-100x more per row than translate in
# whole-stage codegen — at 10^12 mention instances the regexp variant
# IS the pipeline bottleneck.
PUNCT = "".join(chr(c) for c in range(33, 127) if not chr(c).isalnum())
_SPACES = " " * len(PUNCT)
_TRANS = str.maketrans(PUNCT, _SPACES)


def _sql_quote(s: str, backslash_escapes: bool) -> str:
    out = s.replace("'", "''")
    if backslash_escapes:
        out = out.replace("\\", "\\\\")
    return "'" + out + "'"


# Spark SQL twin (backslash IS an escape char in Spark string literals).
# Braces inside the punctuation literal are doubled so these templates
# remain str.format-safe ({x} is the only live placeholder).
NORMALIZE_SQL = (
    "concat_ws(' ', filter(split(translate(lower({x}), "
    + _sql_quote(PUNCT, backslash_escapes=True).replace("{", "{{").replace("}", "}}")
    + f", '{_SPACES}'), ' '), s -> s != ''))"
)


def normalize(s: str) -> str:
    """Canonical surface form: lowercase, punctuation -> space, collapse."""
    return " ".join(t for t in s.lower().translate(_TRANS).split(" ") if t)


def char_shingles(s: str, k: int = 3) -> set[str]:
    """Character k-shingles of a normalized string (padded if short)."""
    if len(s) < k:
        return {s} if s else set()
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def minhash_signature(shingles: set[str], n_hashes: int) -> list[int]:
    """n_hashes-wide minhash: ONE md5 per shingle + Carter-Wegman
    derivations (functions.hashing rationale) — the Python twin of the
    relational signature aggregation."""
    from causalre_spark.functions.hashing import cw_hash

    if not shingles:
        return [0] * n_hashes
    bases = [md5_long(sh) for sh in shingles]
    return [min(cw_hash(b, seed) for b in bases) for seed in range(n_hashes)]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token md5 hashes (16 hex chars = 64 bits)."""
    if not tokens:
        return 0
    counts = [0] * 64
    for t in tokens:
        h = md5_long(t, nhex=16)
        for b in range(64):
            counts[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if counts[b] > 0:
            out |= 1 << b
    return out


def fingerprint(text: str) -> int:
    """Order-insensitive document fingerprint: md5_long of the sorted
    distinct normalized tokens joined by a single space."""
    toks = sorted(set(normalize(text).split()))
    return md5_long(" ".join(toks))
