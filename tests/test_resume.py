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


def test_iceberg_branch_write_read_resume(spark, monkeypatch, tmp_path):
    """The catalog-managed (iceberg) branch: writeTo(...).using('iceberg')
    with a qualified identifier, read-back via spark.read.table (NOT the
    parquet path), doneness via catalog.tableExists (NOT _SUCCESS).
    The sandbox has no iceberg jars, so the catalog surface is faked at
    the pyspark API layer — the plan construction and resume logic under
    test are real (ADVICE r02: the old branch read stale parquet and
    never resumed)."""
    from causalre_spark.pipeline import StageIO

    store: dict[str, object] = {}     # table ident -> pandas snapshot
    calls = {"write": 0, "read": 0}

    class FakeWriterV2:
        def __init__(self, df, ident):
            self.df, self.ident = df, ident
            self.fmt, self.parts = None, None

        def using(self, fmt):
            self.fmt = fmt
            return self

        def partitionedBy(self, col):
            self.parts = col
            return self

        def createOrReplace(self):
            assert self.fmt == "iceberg"
            calls["write"] += 1
            store[self.ident] = self.df.toPandas()

    # patch the CONCRETE runtime classes (pyspark 4 classic subclasses
    # override these; patching the pyspark.sql.DataFrame base is a no-op)
    probe = spark.range(1)
    monkeypatch.setattr(type(probe), "writeTo",
                        lambda self, ident: FakeWriterV2(self, ident))
    monkeypatch.setattr(
        type(spark.read), "table",
        lambda self, ident: (calls.__setitem__("read", calls["read"] + 1)
                             or spark.createDataFrame(store[ident])))
    monkeypatch.setattr(type(spark.catalog), "tableExists",
                        lambda self, ident: ident in store)

    io = StageIO(spark, str(tmp_path), resume=True, table_namespace="graph.ns")
    df_in = spark.range(10).selectExpr("id AS cause_id", "id * 2 AS v")
    built = {"n": 0}

    def _stage():
        built["n"] += 1
        return df_in

    out = io.checkpoint("triples", _stage, partition_expr="pmod(cause_id, 4)",
                        table_format="iceberg")
    assert "graph.ns.triples" in store          # qualified identifier used
    assert calls["write"] == 1 and built["n"] == 1
    assert "_p" not in out.columns and out.count() == 10

    # resume: table exists in the catalog -> stage fn NOT rebuilt, no rewrite
    out2 = io.checkpoint("triples", _stage, partition_expr="pmod(cause_id, 4)",
                         table_format="iceberg")
    assert built["n"] == 1 and calls["write"] == 1
    assert out2.count() == 10
    # resume=False forces a rebuild
    io2 = StageIO(spark, str(tmp_path), resume=False, table_namespace="graph.ns")
    io2.checkpoint("triples", _stage, partition_expr="pmod(cause_id, 4)",
                   table_format="iceberg")
    assert built["n"] == 2 and calls["write"] == 2


def test_bucketed_graph_join_has_no_exchange(spark):
    """write_bucketed_graph: a self-join of the bucketed triples table on
    the bucket key must run WITHOUT a shuffle exchange on either side —
    the property that amortizes the write across every downstream graph
    join at scale."""
    import io as _io
    from contextlib import redirect_stdout

    from causalre_spark.pipeline import write_bucketed_graph

    triples = spark.range(200).selectExpr(
        "id % 37 AS cause_id", "concat('c', id % 37) AS cause",
        "'CAUSES' AS predicate", "id % 11 AS effect_id",
        "concat('e', id % 11) AS effect", "1 AS n_evidence",
        "cast(0.5 as float) AS max_score")
    spark.sql("DROP TABLE IF EXISTS kg_triples_test")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        t = write_bucketed_graph(spark, triples, name="kg_triples_test",
                                 buckets=8)
        assert t.count() == 200
        # A tiny test table would normally compile to a broadcast join;
        # disable that so we see the plan a 10^12-row graph table gets
        # (sort-merge over co-bucketed sides, no shuffle on either).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # evidence re-aggregation / entity-expansion shape: self-join on
        # the bucket key
        j = t.alias("x").join(t.alias("y"), "cause_id")
        buf = _io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert j.count() > 0
        # aggregation on the bucket key: also shuffle-free
        a = t.groupBy("cause_id").count()
        buf = _io.StringIO()
        with redirect_stdout(buf):
            a.explain("formatted")
        assert "Exchange hashpartitioning" not in buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS kg_triples_test")


def test_incremental_matches_full(spark):
    """run_incremental parity contract: processing half the corpus, then
    an incremental run over the full corpus, yields triple-for-triple
    the same graph as one full run — while re-encoding ONLY the delta
    (the new run's docs sink holds just the unprocessed pages)."""
    from causalre_spark.functions.hashing import md5_long_sql_spark
    from causalre_spark.pipeline import run_incremental
    from pyspark.sql import functions as F

    wd_full = "/tmp/causalre_test_wd_incr_full"
    wd_half = "/tmp/causalre_test_wd_incr_half"
    wd_inc = "/tmp/causalre_test_wd_incr_delta"
    for wd in (wd_full, wd_half, wd_inc):
        shutil.rmtree(wd, ignore_errors=True)

    pages = synth_pages_df(spark, 40, partitions=4)
    half = pages.filter(F.expr(f"pmod({md5_long_sql_spark('url')}, 2) = 0"))

    def _full_triples(res):
        return {(r.cause, r.predicate, r.effect, r.n_evidence)
                for r in res["triples"].collect()}

    full = _full_triples(run_pipeline(spark, pages, workdir=wd_full))
    prev = run_pipeline(spark, half, workdir=wd_half)
    inc = run_incremental(spark, pages, prev_workdir=wd_half, workdir=wd_inc)
    assert _full_triples(inc) == full
    assert full, "synthetic corpus should produce triples"

    # the incremental run encoded only the delta
    n_all = spark.read.parquet(os.path.join(wd_full, "docs")).count()
    n_prev = spark.read.parquet(os.path.join(wd_half, "docs")).count()
    n_delta = spark.read.parquet(os.path.join(wd_inc, "docs")).count()
    assert n_delta == n_all - n_prev
    assert 0 < n_delta < n_all

    # and records the delta size in its lineage metrics
    metrics = spark.read.parquet(os.path.join(wd_inc, "_metrics"))
    delta_rows = [r["rows"] for r in metrics.filter("stage = '_delta'").collect()]
    assert delta_rows == [n_delta]

    # resume over the incremental workdir: identical result, delta not recomputed
    inc2 = run_incremental(spark, pages, prev_workdir=wd_half, workdir=wd_inc)
    assert _full_triples(inc2) == full

    for wd in (wd_full, wd_half, wd_inc):
        shutil.rmtree(wd, ignore_errors=True)


def test_incremental_requires_completed_prev(spark):
    import pytest as _pytest

    from causalre_spark.pipeline import run_incremental

    pages = synth_pages_df(spark, 4, partitions=1)
    with _pytest.raises(RuntimeError, match="incremental run requires"):
        run_incremental(spark, pages,
                        prev_workdir="/tmp/causalre_missing_prev_wd",
                        workdir="/tmp/causalre_test_wd_incr_err")
import shutil

from pyspark.sql import functions as F


def test_compaction_plan_and_rewrite(spark):
    """Small-file compaction: the plan packs files into ~target bins
    (bin bytes <= target + one straddling file), the rewrite preserves
    content row-for-row and collapses the file count to the bin count."""
    from causalre_spark.operators.maintenance import (
        compact_parquet,
        compaction_plan,
        file_inventory,
    )

    src = "/tmp/causalre_compact_src"
    dst = "/tmp/causalre_compact_dst"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)
    # 24 tiny files (one per partition)
    spark.range(2400).repartition(24).write.mode("overwrite").parquet(src)
    inv = file_inventory(spark.read.parquet(src))
    n_files = inv.count()
    assert n_files == 24
    sizes = {r["file"]: r["bytes"] for r in inv.collect()}
    target = 4 * max(sizes.values())
    plan = {r["file"]: (r["bytes"], r["bin"])
            for r in compaction_plan(inv, target).collect()}
    assert set(plan) == set(sizes)
    # bins are contiguous in file order and size-bounded
    per_bin: dict = {}
    for f in sorted(plan):
        b, bin_ = plan[f]
        per_bin.setdefault(bin_, 0)
        per_bin[bin_] += b
    for bin_, total in per_bin.items():
        assert total <= target + max(sizes.values())
    assert 1 < len(per_bin) < n_files            # actually compacts

    executed = compact_parquet(spark, src, dst, target)
    assert executed.count() == n_files
    out = spark.read.parquet(dst)  # bin shows up as the partition col
    assert sorted(r["id"] for r in out.collect()) == list(range(2400))
    n_out = out.select(F.col("_metadata.file_path")).distinct().count()
    assert n_out == len(per_bin)
    assert {r["bin"] for r in out.select("bin").distinct().collect()} \
        == set(per_bin)
    # the schema-preserving reader: original columns only
    from causalre_spark.operators.maintenance import read_compacted
    clean = read_compacted(spark, dst)
    assert clean.columns == spark.read.parquet(src).columns


def test_predictions_json_sink_round_trip(spark):
    """Reference-shaped JSON predictions sink: nested span/relation
    objects survive a write+read round trip and match the docs frame
    content (S5 alternate sink; format per process_preds.load_predictions)."""
    import json
    import shutil

    from causalre_spark.pipeline import extract_docs, write_predictions_json
    from causalre_spark.config import DEFAULT_CONFIG
    from causalre_spark.sources.corpus import synth_pages_df

    path = "/tmp/causalre_pred_json"
    shutil.rmtree(path, ignore_errors=True)
    docs = extract_docs(synth_pages_df(spark, 30, partitions=2),
                        DEFAULT_CONFIG).cache()
    write_predictions_json(docs, path)
    back = spark.read.json(path)
    assert back.count() == docs.count()
    # per-url span sets survive the nesting change
    want = {r["url"]: {(s["start"], s["end"], s["span_type"])
                       for s in (r["spans"] or [])}
            for r in docs.collect()}
    got = {r["url"]: {(s["start"], s["end"], s["type"])
                      for s in (r["spans"] or [])}
           for r in back.collect()}
    assert got == want
    # the physical files are plain JSON lines with the reference nesting
    import glob
    line = next(ln for f in glob.glob(path + "/part-*")
                for ln in open(f) if ln.strip())
    obj = json.loads(line)
    assert set(obj) <= {"url", "spans", "relations"}
    if obj.get("relations"):
        assert {"head", "tail", "type", "score"} <= set(obj["relations"][0])
    docs.unpersist()
