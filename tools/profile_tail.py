"""Tail profiler: per-substage wall times + Spark job counts for the
pipeline's post-extraction tail (explode -> linking -> triples) on the
bench corpus, mirroring linking.link_mentions step-for-step.

Why: the 2-vs-8-core scaling legs show the extract stage at ~0.88
efficiency but the tail at ~0.3 — the tail is near-constant wall time
regardless of cores. This tool attributes that constant to substages
(and to Spark job *count*, since per-job scheduling latency is the
usual suspect for a tiny-data tail that will not scale) so the fix
targets the real cost instead of a guess.

Usage: python tools/profile_tail.py [--cores 8] [--corpus PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--corpus", default="/tmp/causalre_bench_corpus_250000")
    ap.add_argument("--skip-warm", action="store_true")
    args = ap.parse_args()

    from causalre_spark import pipeline as P
    from causalre_spark.config import DEFAULT_CONFIG as cfg
    from causalre_spark.operators import linking as L
    from causalre_spark.functions.hashing import md5_long_sql_spark
    from causalre_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app="profile_tail", cores=args.cores,
                      extra_conf={"spark.sql.shuffle.partitions": "8",
                                  "spark.driver.extraJavaOptions": "-Xms32g"})
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    pages = spark.read.parquet(args.corpus).persist()
    pages.agg({"html": "count"}).collect()

    if not args.skip_warm:
        warm = P.run_pipeline(spark, pages, verify_extraction=False)
        warm["triples"].count()
        for k in ("docs", "spans", "relations", "entities", "triples"):
            warm[k].unpersist()
        spark.catalog.clearCache()
        pages.persist()
        pages.agg({"html": "count"}).collect()

    rows: list[tuple[str, float, int]] = []

    def n_jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    def step(name, fn):
        j0 = n_jobs()
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        dj = n_jobs() - j0
        rows.append((name, round(dt, 3), dj))
        print(f"{name:34s} {dt:8.3f}s  jobs+{dj}", file=sys.stderr)
        return out

    # --- extract + explode (mirrors run_pipeline) ---
    docs = P.extract_docs(pages, cfg).persist()
    step("extract_docs", lambda: docs.count())
    kept = P.explode_spans(docs).persist()
    rels = P.explode_rels(docs).persist()
    step("explode_spans", lambda: kept.count())
    step("explode_rels", lambda: rels.count())

    # --- link_mentions, unrolled (operators/linking.py) ---
    mentions = kept.select("text")
    step("rels.isEmpty gate", lambda: rels.isEmpty())
    rawmap = L.mention_form_map(mentions, "text").persist()
    step("rawmap distinct+normalize", lambda: rawmap.count())
    forms = rawmap.select("form").distinct().persist()
    n_forms = step("forms distinct+count", lambda: forms.count())
    fmap = forms.select(
        "form", F.expr(md5_long_sql_spark("form")).alias("fid")).persist()
    sh = L.form_shingles(fmap, cfg.shingle_size, key="fid").persist()
    sigs = L.minhash_signatures(sh, cfg.minhash_hashes).persist()
    cleanup = [forms, fmap, sh, sigs]
    cands = L.lsh_candidate_pairs(
        sigs, cfg.minhash_hashes, cfg.minhash_band_size,
        dedup=False, max_bucket=cfg.lsh_max_bucket).persist()
    cleanup.append(cands)
    step("lsh candidate pairs (count)", lambda: cands.count())
    edges = L.verify_jaccard(cands, sh, cfg.link_jaccard_thd,
                             n_forms=n_forms, cleanup=cleanup)
    labels_fid = step("connected_components", lambda: L.connected_components(
        fmap.select(F.col("fid").alias("form")), edges, cfg.cc_max_iters,
        n_nodes=n_forms, keyed=True))
    labels = step("labels join + localCheckpoint", lambda: (
        labels_fid.withColumnRenamed("form", "fid")
        .join(fmap, "fid").select("form", "component").localCheckpoint()))
    step("unpersist cleanup", lambda: [d.unpersist() for d in cleanup])
    entities = step("canonical_entities", lambda: L.canonical_entities(labels))
    entities = entities.persist()
    step("entities.count", lambda: entities.count())

    # --- triples (canonical_triples + dedup agg) ---
    caches: list = []
    triples = P.canonical_triples(kept, rels, entities, cleanup=caches,
                                  form_map=rawmap)
    step("triples count", lambda: triples.count())
    rawmap.unpersist()
    for d in caches:
        d.unpersist()

    total = sum(r[1] for r in rows)
    print(json.dumps({
        "cores": args.cores, "n_forms": n_forms,
        "total_tail_secs": round(total, 2),
        "steps": [{"name": n, "secs": s, "jobs": j} for n, s, j in rows],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
