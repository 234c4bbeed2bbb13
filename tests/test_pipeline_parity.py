"""End-to-end golden parity: Spark pipeline == single-process oracle.

The north_rule gate is triple P/R >= 0.95 vs the reference-semantics
oracle; at this scale we assert exact set equality (strictly stronger),
plus exact span/relation parity so a regression is attributable to a
stage.
"""

import pytest

from causalre_spark.oracle.pipeline import oracle_pipeline
from causalre_spark.pipeline import run_pipeline
from causalre_spark.sources.corpus import gen_page, synth_pages_df

N_PAGES = 80


@pytest.fixture(scope="module")
def results(spark):
    pages = synth_pages_df(spark, N_PAGES, partitions=8)
    res = run_pipeline(spark, pages)
    oracle = oracle_pipeline([gen_page(i) for i in range(N_PAGES)])
    return res, oracle


def test_spans_exact(results):
    res, oracle = results
    got = {(r.url, r.start, r.end, round(r.filter_score, 4))
           for r in res["spans"].collect()}
    want = {(s["url"], s["start"], s["end"], round(s["filter_score"], 4))
            for s in oracle["spans"]}
    assert got == want


def test_relations_exact(results):
    res, oracle = results
    got = {(r.url, r.h_start, r.h_end, r.t_start, r.t_end, round(r.rel_score, 4))
           for r in res["relations"].collect()}
    want = {(r["url"], r["h_start"], r["h_end"], r["t_start"], r["t_end"],
             round(r["rel_score"], 4)) for r in oracle["relations"]}
    assert got == want


def test_triples_exact(results):
    res, oracle = results
    got = {(r.cause_id, r.cause, r.predicate, r.effect_id, r.effect, r.n_evidence)
           for r in res["triples"].collect()}
    want = {(t["cause_id"], t["cause"], t["predicate"], t["effect_id"],
             t["effect"], t["n_evidence"]) for t in oracle["triples"]}
    assert got == want
    # P/R >= 0.95 trivially implied, but state the gate explicitly:
    tp = len(got & want)
    assert tp / max(len(got), 1) >= 0.95 and tp / max(len(want), 1) >= 0.95


def test_relation_texts_bridge_triggers(results):
    res, _ = results
    rows = res["relations"].select("h_text", "t_text").limit(20).collect()
    assert all(r.h_text and r.t_text for r in rows)
