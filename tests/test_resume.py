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


def test_partitioned_triple_sink_and_resume(spark):
    """S5: the triples sink is directory-partitioned by a cause-id
    bucket (`_p=<n>` dirs on disk), the partition column is NOT in the
    returned DataFrame, and resume over the partitioned sink works."""
    import glob

    wd = "/tmp/causalre_test_wd_part"
    shutil.rmtree(wd, ignore_errors=True)
    pages = synth_pages_df(spark, 30, partitions=4)
    first = _triples_set(run_pipeline(spark, pages, workdir=wd))
    part_dirs = glob.glob(os.path.join(wd, "triples", "_p=*"))
    assert len(part_dirs) > 1, "triples sink is not partitioned"
    res2 = run_pipeline(spark, pages, workdir=wd, resume=True)
    assert "_p" not in res2["triples"].columns
    assert _triples_set(res2) == first


def test_length_bucketing_same_results(spark):
    """S4: repartitionByRange(length(text)) before the encoder UDF is a
    physical-layout change only — identical results."""
    from causalre_spark.config import PipelineConfig

    pages = synth_pages_df(spark, 30, partitions=4)
    plain = _triples_set(run_pipeline(spark, pages))
    bucketed = _triples_set(
        run_pipeline(spark, pages, cfg=PipelineConfig(length_bucket=True)))
    assert bucketed == plain
