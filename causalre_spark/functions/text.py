"""Frozen text normalization / shingling / fingerprint helpers.

Pure-Python twins of the SQL used in the Spark operators; the oracle and
the Spark side must agree exactly, so everything here is defined to be
expressible with portable SQL (lower/regexp_replace/substring/md5).
"""

from __future__ import annotations

import re

from causalre_spark.functions.hashing import md5_long, minhash_long

_NORM_RE = re.compile(r"[^a-z0-9 ]+")
_WS_RE = re.compile(r" +")

# SQL twin (identical in Spark SQL & DuckDB):
#   trim(regexp_replace(regexp_replace(lower(x), '[^a-z0-9 ]+', ' '), ' +', ' '))
NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(lower({x}), '[^a-z0-9 ]+', ' '), ' +', ' '))"
)


def normalize(s: str) -> str:
    """Canonical surface form: lowercase, punctuation -> space, collapse."""
    return _WS_RE.sub(" ", _NORM_RE.sub(" ", s.lower())).strip()


def char_shingles(s: str, k: int = 3) -> set[str]:
    """Character k-shingles of a normalized string (padded if short)."""
    if len(s) < k:
        return {s} if s else set()
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def minhash_signature(shingles: set[str], n_hashes: int) -> list[int]:
    """n_hashes-wide minhash over md5-derived hash families (portable)."""
    if not shingles:
        return [0] * n_hashes
    return [min(minhash_long(sh, seed) for sh in shingles) for seed in range(n_hashes)]


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
