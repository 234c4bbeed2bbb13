"""Checkpoint/resume (north_rule): rerun skips completed stages,
produces the identical result, and writes per-partition lineage."""

import os
import shutil
import time

from causalre_spark.pipeline import run_pipeline
from causalre_spark.sources.corpus import synth_pages_df

WD = "/tmp/causalre_test_wd"


def _triples_set(res):
    return {(r.cause_id, r.effect_id, r.n_evidence) for r in res["triples"].collect()}


def test_resume_identical_and_fast(spark):
    shutil.rmtree(WD, ignore_errors=True)
    pages = synth_pages_df(spark, 30, partitions=4)
    t0 = time.time()
    first = _triples_set(run_pipeline(spark, pages, workdir=WD))
    fresh_secs = time.time() - t0
    assert os.path.exists(os.path.join(WD, "triples", "_SUCCESS"))

    t0 = time.time()
    second = _triples_set(run_pipeline(spark, pages, workdir=WD, resume=True))
    resumed_secs = time.time() - t0
    assert second == first
    assert resumed_secs < fresh_secs / 2  # stages actually skipped

    # partial resume: drop the final stage only -> it alone is recomputed
    shutil.rmtree(os.path.join(WD, "triples"))
    third = _triples_set(run_pipeline(spark, pages, workdir=WD, resume=True))
    assert third == first

    metrics = spark.read.parquet(os.path.join(WD, "_metrics"))
    stages = {r["stage"] for r in metrics.select("stage").distinct().collect()}
    assert {"docs", "spans", "relations", "entities", "triples"} <= stages
