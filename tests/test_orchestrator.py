"""Sweep orchestrator (SURVEY §3.3): derived configs, per-run metrics
table, override effects, per-experiment resume."""

import pytest

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig
from causalre_spark.orchestrator import derive_config, run_sweep
from causalre_spark.sources.corpus import synth_pages_df


def test_derive_config_overrides_and_rejects_unknown():
    cfg = derive_config(DEFAULT_CONFIG, {"rel_thd": 0.9, "max_top_k_spans": 5})
    assert cfg.rel_thd == 0.9 and cfg.max_top_k_spans == 5
    assert DEFAULT_CONFIG.rel_thd == 0.5  # base untouched (frozen dataclass)
    with pytest.raises(ValueError, match="unknown config overrides"):
        derive_config(DEFAULT_CONFIG, {"not_a_knob": 1})


def test_sweep_results_table_and_override_effect(spark, tmp_path):
    pages = synth_pages_df(spark, 25, partitions=2).persist()
    results = run_sweep(
        spark, pages,
        [
            {"name": "base", "overrides": {}},
            {"name": "strict", "overrides": {"rel_thd": 0.999}},
        ],
        workdir=str(tmp_path / "sweep"),
    )
    rows = {r.experiment: r for r in results.collect()}
    assert set(rows) == {"base", "strict"}
    assert rows["base"].n_docs == rows["strict"].n_docs  # same corpus
    # a near-1 decode threshold must prune relations vs the base run
    assert rows["strict"].n_rels < rows["base"].n_rels
    assert rows["strict"].n_triples <= rows["base"].n_triples
    # per-experiment resume: rerunning is served from the checkpoints
    again = {r.experiment: r for r in run_sweep(
        spark, pages,
        [{"name": "base", "overrides": {}},
         {"name": "strict", "overrides": {"rel_thd": 0.999}}],
        workdir=str(tmp_path / "sweep"),
    ).collect()}
    assert again["base"].n_triples == rows["base"].n_triples
    assert again["strict"].n_rels == rows["strict"].n_rels
    pages.unpersist()
