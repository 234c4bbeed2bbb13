"""Experiment sweep orchestrator (SURVEY §3.3).

The reference's ``orchestrator.py:28-144`` loads an experiments JSON
(name + param overrides), derives one config per experiment, runs the
model per config, and later scrapes metrics back out of log files
(``modules/post processing utils/``). The Spark-native equivalent runs
each derived config through the pipeline and lands per-run metrics in a
**results table** — queryable, joinable, no log scraping.

Each experiment may get its own checkpoint workdir, so a killed sweep
resumes per-experiment (the reference reruns from scratch).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig
from causalre_spark.pipeline import run_pipeline

RESULTS_SCHEMA = (
    "experiment string, overrides string, n_docs long, n_spans long, "
    "n_rels long, n_triples long, secs double"
)


def derive_config(base: PipelineConfig, overrides: dict) -> PipelineConfig:
    """make_new_config twin (orchestrator.py:28-69): base config + the
    experiment's parameter overrides. Unknown keys fail loudly."""
    valid = {f.name for f in dataclasses.fields(base)}
    unknown = set(overrides) - valid
    if unknown:
        raise ValueError(f"unknown config overrides: {sorted(unknown)}")
    return dataclasses.replace(base, **overrides)


def run_sweep(
    spark: SparkSession,
    pages: DataFrame,
    experiments: list[dict],
    base_cfg: PipelineConfig = DEFAULT_CONFIG,
    workdir: str | None = None,
) -> DataFrame:
    """Run the pages->triples pipeline once per experiment.

    experiments: [{"name": str, "overrides": {cfg_field: value}}, ...]
    Returns the results table (RESULTS_SCHEMA); with a workdir, each
    experiment checkpoints under ``<workdir>/<name>`` and resumes
    independently.
    """
    rows = []
    for exp in experiments:
        cfg = derive_config(base_cfg, exp.get("overrides", {}))
        wd = os.path.join(workdir, exp["name"]) if workdir else None
        t0 = time.time()
        res = run_pipeline(spark, pages, cfg=cfg, workdir=wd,
                           verify_extraction=False)
        rows.append((
            exp["name"], json.dumps(exp.get("overrides", {}), sort_keys=True),
            res["docs"].count(), res["spans"].count(),
            res["relations"].count(), res["triples"].count(),
            round(time.time() - t0, 2),
        ))
        for k in ("docs", "spans", "relations", "entities"):
            res[k].unpersist()
    return spark.createDataFrame(rows, RESULTS_SCHEMA)
