"""Arrow-batched UDF stages wrapping the frozen model math.

These are the ONLY Python-executed stages in the pipeline (input_hint:
vectorized pandas/Arrow UDFs, no per-row Python in the relational
plan). Each crosses the Arrow boundary once per stage:

  extract_docs   pages  -> docs  (html->text->tokens; N/A numeric)
  score_spans    docs   -> candidate spans with tagger + filter scores
                 (N1-N9 fused: one encode per document, like the
                 reference's shared encoder, model.py:39-44)
  score_pairs    (grouped per doc) spans+tokens -> scored ordered pairs
                 (J1 pair gen bounded by k^2 + N10-N12 rel scoring)

In production the frozen NumPy model is swapped for a broadcast torch
model loaded once per Python worker (import-gated below); interfaces
unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig
from causalre_spark.extract import extract_text, tokenize
from causalre_spark.model import core

try:  # pragma: no cover - production path, torch not in sandbox
    import torch  # noqa: F401

    HAS_TORCH = True
except Exception:  # pragma: no cover
    HAS_TORCH = False

DOCS_SCHEMA = "url string, text string, tokens array<string>, n_tokens int"
SPANS_SCHEMA = (
    "url string, start int, end int, tag_score float, filter_score float"
)
PAIRS_SCHEMA = (
    "url string, h_start int, h_end int, t_start int, t_end int, rel_score float"
)


def extract_docs_udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """pages(url, html) -> docs(url, text, tokens, n_tokens).

    text is re-extracted from html (never read from the text column) so
    the byte-identical invariant is enforceable downstream.
    """
    for pdf in batches:
        texts = [extract_text(bytes(h)) for h in pdf["html"]]
        toks = [tokenize(t) for t in texts]
        yield pd.DataFrame(
            {
                "url": pdf["url"].values,
                "text": texts,
                "tokens": toks,
                "n_tokens": [len(t) for t in toks],
            }
        )


def make_score_spans_udf(cfg: PipelineConfig = DEFAULT_CONFIG):
    """docs -> candidate spans. The O(L*W) span lattice is never
    materialized relationally (SURVEY §2.2 P4 note): the tagger decodes
    only B/E-candidate pairs inside the UDF, so per-doc output is
    |B|x|E| bounded, not L*W."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("url", "start", "end", "tag_score", "filter_score")}
            for url, tokens in zip(pdf["url"], pdf["tokens"]):
                tokens = list(tokens)
                reps = core.encode(tokens, cfg)
                b, e = core.tagger_logits(tokens, reps, cfg)
                for (s, t, sc) in core.decode_spans(b, e, cfg):
                    rows["url"].append(url)
                    rows["start"].append(s)
                    rows["end"].append(t)
                    rows["tag_score"].append(sc)
                    rows["filter_score"].append(
                        core.span_filter_score(tokens, reps, s, t, cfg))
            yield pd.DataFrame(rows)

    return udf


def make_score_pairs_udf(cfg: PipelineConfig = DEFAULT_CONFIG):
    """Grouped per document (applyInPandas over url): surviving spans +
    tokens -> all ordered head/tail pairs (head != tail) with causal
    logits. Fan-out bounded by max_top_k_spans^2 (reference caps rels
    quadratically, config.yaml:127-136); encode runs once per doc."""

    def udf(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {k: [] for k in
                                 ("url", "h_start", "h_end", "t_start", "t_end", "rel_score")}
        if len(pdf) == 0:
            return pd.DataFrame(rows)
        url = pdf["url"].iloc[0]
        tokens = list(pdf["tokens"].iloc[0])
        reps = core.encode(tokens, cfg)
        spans = sorted(zip(pdf["start"].astype(int), pdf["end"].astype(int)))
        for h in spans:
            for t in spans:
                if h == t:
                    continue
                sc = core.rel_score(tokens, reps, h, t, cfg)
                rows["url"].append(url)
                rows["h_start"].append(h[0])
                rows["h_end"].append(h[1])
                rows["t_start"].append(t[0])
                rows["t_end"].append(t[1])
                rows["rel_score"].append(sc)
        return pd.DataFrame(rows)

    return udf
