"""Physical-plan inspection (writes BENCH/PLANS.md).

Prints .explain('formatted') for the load-bearing operators and asserts
the plan properties the design depends on:
  - parquet scans show PushedFilters / pruned ReadSchema
  - the triples entity joins are BroadcastHashJoin
  - relational operators run inside WholeStageCodegen (no Python rows)
  - the windowed top-k is a single Exchange + Window, not a self-join
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from causalre_spark.plans import entry_queries as Q  # noqa: E402
from causalre_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    spark = get_spark(app="explain", cores=8,
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    checks: list[tuple[str, bool, str]] = []
    sections: list[tuple[str, str]] = []

    # 1. filter + projection pushdown into the parquet scan
    df = (spark.read.parquet(f"{SF}/documents.parquet")
          .filter(F.col("lang") == "en").select("doc_id", "n_chars"))
    p = plan_of(df)
    sections.append(("pushdown: lang filter + 2-column projection", p))
    checks.append(("PushedFilters contains lang", "lang" in p and "PushedFilters" in p, p))
    checks.append(("ReadSchema pruned to 3 cols",
                   "ReadSchema" in p and "text" not in p.split("ReadSchema")[1][:200], p))

    # 2. windowed top-k: one exchange + window, no join
    p = plan_of(Q.q_t1_topk_spans(spark, SF))
    sections.append(("T1 windowed top-k", p))
    checks.append(("top-k uses Window not Join", "Window" in p and "SortMergeJoin" not in p, p))

    # 3. triples stage: entity joins must be broadcast. The SEEDED pages
    # are used because the unseeded driver corpus decodes zero relations
    # and the pipeline (correctly) early-exits with an empty literal
    # triples plan — no join left to inspect.
    from causalre_spark.pipeline import run_pipeline
    from causalre_spark.plans.entry_queries import _seeded_pages_from_documents
    res = run_pipeline(spark, _seeded_pages_from_documents(spark, SF),
                       verify_extraction=False)
    p = plan_of(res["triples"])
    sections.append(("triples stage (canonical joins + dedup agg)", p))
    checks.append(("entity joins broadcast", "BroadcastHashJoin" in p, p))
    # note: one SortMergeJoin remains inside canonical_entities
    # (labels x canon on component) — intentional: at web scale the form
    # dictionary can exceed broadcast limits, and it runs once on the
    # (small) entity table, not on the relation stream

    # 4. dedup minhash: band self-join is an equi hash join; no python
    p = plan_of(Q.q_dedup_minhash_lsh(spark, SF))
    sections.append(("dedup MinHash-LSH", p))
    checks.append(("LSH plan is hash-agg + broadcast joins",
                   "HashAggregate" in p and "BroadcastHashJoin" in p, p))
    checks.append(("LSH plan has no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # 5. cosine top-k: broadcast of the 1-row query side
    p = plan_of(Q.q_sim_cosine_topk(spark, SF))
    sections.append(("cosine top-k", p))
    checks.append(("query vector broadcast", "Broadcast" in p, p))

    # 6. every similarity top-k tail compiles to TakeOrderedAndProject
    # (bounded per-partition heap + driver merge), NOT a global
    # row_number Window funneling all candidates through one partition
    for qname in ("sim_cosine_topk", "ann_topk_bucketed",
                  "ann_topk_multiprobe", "ann_topk_ivf"):
        p = plan_of(Q.QUERIES[qname](spark, SF))
        sections.append((f"{qname} tail", p))
        checks.append((f"{qname} uses TakeOrderedAndProject",
                       "TakeOrderedAndProject" in p, p))

    # 7. salted skew aggregation: the salt key must appear in the partial
    # (phase-1) aggregate so a hot key fans out, and the whole plan stays
    # JVM-side
    p = plan_of(Q.q_skew_salted_agg(spark, SF))
    sections.append(("salted skew aggregation", p))
    checks.append(("salted agg: _salt in phase-1 keys", "_salt" in p, p))
    checks.append(("salted agg: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # 8. kg 2-hop graph join: equi hash joins, no Python eval
    p = plan_of(Q.q_kg_2hop(spark, SF))
    sections.append(("kg 2-hop graph join", p))
    checks.append(("kg_2hop: hash equi-joins",
                   ("SortMergeJoin" in p or "BroadcastHashJoin" in p or
                    "ShuffledHashJoin" in p), p))
    checks.append(("kg_2hop: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # 9. TPC-H Q3 tail: global top-10 must be TakeOrderedAndProject, and
    # the segment/date filters must reach the parquet scans
    p = plan_of(Q.q_tpch_q3_topk(spark, SF))
    sections.append(("tpch_q3 top-k tail", p))
    checks.append(("tpch_q3: TakeOrderedAndProject tail",
                   "TakeOrderedAndProject" in p, p))
    checks.append(("tpch_q3: segment filter pushed to scan",
                   "BUILDING" in p.split("PushedFilters")[1][:400]
                   if "PushedFilters" in p else False, p))

    # 10. TPC-H Q5: nation/region dims broadcast (explicit), no Python
    p = plan_of(Q.q_tpch_q5_local_supplier(spark, SF))
    sections.append(("tpch_q5 star join", p))
    checks.append(("tpch_q5: dims broadcast", "BroadcastHashJoin" in p, p))
    checks.append(("tpch_q5: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # 11. ngram-jaccard prefix join: equi hash join on the shingle key
    # (never a cartesian/NLJ), all-JVM
    p = plan_of(Q.q_dedup_ngram_jaccard(spark, SF))
    sections.append(("ngram-jaccard prefix join", p))
    checks.append(("ngram_jaccard: no cartesian product",
                   "CartesianProduct" not in p
                   and "BroadcastNestedLoopJoin" not in p, p))
    checks.append(("ngram_jaccard: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # 12. triangles: joins are equi-joins; no cartesian, no Python
    p = plan_of(Q.q_kg_triangles(spark, SF))
    sections.append(("kg triangles (degree-ordered)", p))
    checks.append(("kg_triangles: no cartesian product",
                   "CartesianProduct" not in p
                   and "BroadcastNestedLoopJoin" not in p, p))
    checks.append(("kg_triangles: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # 13. as-of join: ONE shuffle by join key (union + running last),
    # not a range join — exactly one Exchange hashpartitioning(user_id)
    p = plan_of(Q.q_asof_join_orders(spark, SF))
    sections.append(("as-of join (union-tag + running last)", p))
    checks.append(("asof: single user_id window, no join operator",
                   "Window" in p and "Join" not in p, p))
    checks.append(("asof: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # 14. bucketed range join: the time-bucket equi key must make this a
    # hash join (broadcast at this scale), never a cartesian/NLJ theta join
    p = plan_of(Q.q_range_join_errors(spark, SF))
    sections.append(("bucketed range join", p))
    checks.append(("range_join: equi hash join on bucket, no cartesian",
                   ("BroadcastHashJoin" in p or "SortMergeJoin" in p
                    or "ShuffledHashJoin" in p)
                   and "CartesianProduct" not in p
                   and "BroadcastNestedLoopJoin" not in p, p))

    # 15. hash sampling: the md5 predicate is partition-local — no
    # Exchange anywhere in the plan (sampling must not shuffle)
    p = plan_of(Q.q_sample_hash(spark, SF))
    sections.append(("deterministic hash sampling", p))
    checks.append(("sample_hash: no Exchange (map-only plan)",
                   "Exchange" not in p, p))

    # 16. tf-idf: hash aggregates + per-doc WindowGroupLimit top-k;
    # the corpus-size side is a broadcast, everything JVM-side
    p = plan_of(Q.q_tfidf_topk(spark, SF))
    sections.append(("tf-idf top-k per doc", p))
    checks.append(("tfidf: WindowGroupLimit bounds the per-doc top-k",
                   "WindowGroupLimit" in p, p))
    checks.append(("tfidf: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # 16b. BM25 retrieval: global top-10 must be TakeOrderedAndProject
    # (per-partition heaps — NOT a single-partition global sort), the
    # doc-length pass must stay a HOF projection (no second explode
    # shuffle: exactly one Generate in the plan, the query-term
    # postings explode), df/stats sides broadcast, all JVM-side.
    p = plan_of(Q.q_bm25_topk(spark, SF))
    sections.append(("bm25 top-k retrieval", p))
    checks.append(("bm25: TakeOrderedAndProject tail",
                   "TakeOrderedAndProject" in p, p))
    # exactly TWO Generate nodes, both the query-term-filtered postings
    # explode (the df branch recomputes tf's lineage — a second map-only
    # corpus scan, deliberately preferred over a per-term window shuffle
    # that would funnel every posting of a hot term to one partition).
    # The doc-LENGTH pass contributes none: it is a size∘filter∘split
    # HOF projection.
    import re as _re
    checks.append(("bm25: two Generates (filtered postings x2; length pass is HOF)",
                   len(_re.findall(r"^\(\d+\) Generate", p, _re.M)) == 2, p))
    checks.append(("bm25: df/corpus-stats joins are broadcast",
                   "BroadcastHashJoin" in p, p))
    checks.append(("bm25: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # 17. gazetteer tagging: the lexicon match must be a broadcast hash
    # join (map-join — corpus never shuffles) and the whole chain stays
    # JVM-side. The tiny widths dimension joins via a deliberate
    # broadcast nested-loop (it IS a flatmap over <=|widths| rows), so
    # no BNLJ-absence assertion here.
    p = plan_of(Q.q_gazetteer_spans(spark, SF))
    sections.append(("gazetteer tagging (broadcast lexicon map-join)", p))
    checks.append(("gazetteer: lexicon match is BroadcastHashJoin",
                   "BroadcastHashJoin" in p, p))
    checks.append(("gazetteer: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # 18. linking jaccard-verify (the pipeline tail's dominant stage):
    # the pair x shingle stream must be SHUFFLED HASH joined (the
    # shuffle_hash hint — jstack showed the default sort-merge join's
    # UnsafeExternalSorter dominating the tail on 25M+ rows), the
    # shingle-count size prefilter must sit BEFORE those wide joins, and
    # everything stays JVM-side. Built from the same linking operators
    # the pipeline calls (operators/linking.py verify_jaccard).
    from causalre_spark.operators.linking import (
        form_shingles, lsh_candidate_pairs, minhash_signatures,
        normalized_forms, verify_jaccard)

    forms = normalized_forms(
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.expr(Q.FORM_EXPR).alias("text")))
    sh = form_shingles(forms, 3)
    sigs = minhash_signatures(sh, 4)
    cands = lsh_candidate_pairs(sigs, 4, 2)
    edges = verify_jaccard(cands, sh, 0.6, n_forms=1000)
    p = plan_of(edges)
    sections.append(("linking jaccard-verify (size prefilter + SHJ)", p))
    checks.append(("verify: shingle joins are ShuffledHashJoin (hint honored)",
                   "ShuffledHashJoin" in p, p))
    checks.append(("verify: size prefilter present (least/greatest ratio)",
                   "least(" in p and "greatest(" in p, p))
    checks.append(("verify: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # Gopher repetition signals: per-doc array expressions + two hash
    # aggregations on doc_id; nothing may fall out of the JVM and no
    # window may appear (the top-bigram argmax is max(struct), not
    # row_number)
    p = plan_of(Q.q_text_repetition(spark, SF))
    sections.append(("text_repetition (Gopher signals)", p))
    checks.append(("repetition: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))
    checks.append(("repetition: hash-agg argmax, no Window",
                   "HashAggregate" in p and "Window" not in p, p))

    # percentile gate: threshold table must broadcast back onto the
    # per-doc side
    p = plan_of(Q.q_quality_percentile(spark, SF))
    sections.append(("quality_percentile gate", p))
    checks.append(("percentile gate: threshold join is broadcast",
                   "BroadcastHashJoin" in p, p))

    # fitted k-means: the assignment is centroid literals folded into
    # projections — the plan over the embeddings scan must contain no
    # join and no exchange beyond the argmax projection itself
    from causalre_spark.operators import clustering as CL
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(CL._assign_to_centroids(
        emb, {c: [0.01 * (c + j) for j in range(64)] for c in range(8)},
        "vec_id", "embedding"))
    sections.append(("k-means assignment (vectorized Arrow crossing)", p))
    # r6: assignment moved from the O(k·dim) literal-chain projection to
    # one MapInPandas crossing (bit-identical, no huge-method codegen);
    # still row-local — no join — and the only exchange is the
    # round-robin spread of the unsplittable scan
    checks.append(("kmeans assign: no join (row-local assignment)",
                   "Join" not in p, p))
    checks.append(("kmeans assign: vectorized Arrow crossing, "
                   "no row-at-a-time Python",
                   "MapInPandas" in p and "BatchEvalPython" not in p, p))

    # corpus-curation additions (round 3)
    # decontaminate: the benchmark gram side must broadcast so the
    # corpus side never shuffles before the per-doc aggregate
    p = plan_of(Q.q_decontaminate(spark, SF))
    sections.append(("decontaminate (benchmark n-gram overlap)", p))
    checks.append(("decontaminate: benchmark side is BroadcastHashJoin",
                   "BroadcastHashJoin" in p, p))
    checks.append(("decontaminate: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # crossdoc dup-ngram stats: two hash aggs + one equi-join on the
    # 48-bit gram key; no Window, no Python
    p = plan_of(Q.q_dedup_crossdoc(spark, SF))
    sections.append(("dedup_crossdoc (dup-ngram stats)", p))
    checks.append(("crossdoc: hash-agg pipeline, no Window",
                   "HashAggregate" in p and "Window" not in p, p))
    checks.append(("crossdoc: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # stratified sample: rank<=quota must push a per-partition
    # WindowGroupLimit below the exchange
    p = plan_of(Q.q_sample_stratified(spark, SF))
    sections.append(("sample_stratified (exact-quota)", p))
    checks.append(("stratified: WindowGroupLimit pre-limit present",
                   "WindowGroupLimit" in p, p))

    # skew profile: ONE corpus-wide hash agg; the totals window runs on
    # the tiny aggregated frame (plan may single-partition it — fine),
    # and nothing Python touches the corpus scan
    p = plan_of(Q.q_domain_skew_stats(spark, SF))
    sections.append(("domain_skew_stats (hot-group profile)", p))
    checks.append(("skew stats: partial hash agg over scan",
                   "HashAggregate" in p, p))
    checks.append(("skew stats: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # DSIR: the 64-row bucket model must broadcast onto the per-doc
    # bucket counts; nothing Python near the corpus scan
    p = plan_of(Q.q_dsir_weights(spark, SF))
    sections.append(("dsir_weights (importance weighting)", p))
    checks.append(("dsir: bucket model join is broadcast",
                   "BroadcastHashJoin" in p, p))
    checks.append(("dsir: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # composite curation verdict: the signal joins are all on doc_id
    # (co-partitioned after one exchange) and nothing Python touches
    # the corpus
    p = plan_of(Q.q_curation_verdict(spark, SF))
    sections.append(("curation_verdict (composite gates)", p))
    checks.append(("curation verdict: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))
    checks.append(("curation verdict: contamination side broadcast",
                   "BroadcastHashJoin" in p, p))

    # negative sampling: positives filter must be an anti join
    p = plan_of(Q.q_kg_negative_samples(spark, SF))
    sections.append(("kg_negative_samples (filtered corruption)", p))
    checks.append(("negatives: LeftAnti join against positives",
                   "LeftAnti" in p, p))
    checks.append(("negatives: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # LM perplexity: both count models broadcast back onto the corpus
    # bigram stream; bigram generation is HOF projection (no Window);
    # nothing Python
    p = plan_of(Q.q_lm_perplexity(spark, SF))
    sections.append(("lm_perplexity (hashed-bigram LM filter)", p))
    checks.append(("lm ppl: count models join broadcast",
                   "BroadcastHashJoin" in p, p))
    checks.append(("lm ppl: bigrams via HOFs, no Window",
                   "Window" not in p, p))
    checks.append(("lm ppl: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # chunking: MAP-ONLY — no Exchange anywhere in the plan
    p = plan_of(Q.q_chunk_documents(spark, SF))
    sections.append(("chunk_documents (token-window chunking)", p))
    checks.append(("chunking: zero Exchange (map-only)",
                   "Exchange" not in p, p))
    checks.append(("chunking: no Python eval",
                   "BatchEvalPython" not in p and "ArrowEval" not in p, p))

    # PQ-ADC: the query's distance table is a function of ONE row — r6
    # inlines it as array literals (1-row collect), so the scoring scan
    # has NO join at all; codes come from the vectorized MapInPandas
    # assignment; the final top-k must be TakeOrderedAndProject, not a
    # global sort
    p = plan_of(Q.q_ann_topk_pq(spark, SF))
    sections.append(("ann_topk_pq (PQ-ADC top-k)", p))
    checks.append(("pq adc: distance table inlined as literals (no join)",
                   "Join" not in p, p))
    checks.append(("pq adc: scoring is map-only (no shuffle exchange)",
                   "Exchange hashpartitioning" not in p
                   and "Exchange rangepartitioning" not in p, p))
    checks.append(("pq adc: top-k is TakeOrderedAndProject",
                   "TakeOrderedAndProject" in p, p))
    checks.append(("pq adc: codes via vectorized Arrow crossing, "
                   "no row-at-a-time Python",
                   "MapInPandas" in p and "BatchEvalPython" not in p, p))

    # sequence packing: the running offset must be a PARTITIONED window
    # (per-shard streams), never a global single-partition sort
    p = plan_of(Q.q_pack_sequences(spark, SF))
    sections.append(("pack_sequences (sharded prefix scan)", p))
    checks.append(("packing: partitioned window (per-shard, no global sort)",
                   "windowspecdefinition(shard" in p
                   and "BatchEvalPython" not in p, p))

    # LPA communities: iterative join rounds stay relational (hash aggs
    # + joins, no Python, no cartesian)
    p = plan_of(Q.q_kg_communities(spark, SF))
    sections.append(("kg_communities (label propagation)", p))
    checks.append(("lpa: hash-agg + join rounds, no Python",
                   "HashAggregate" in p and "BatchEvalPython" not in p, p))
    checks.append(("lpa: no cartesian product",
                   "CartesianProduct" not in p, p))

    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"), exist_ok=True)
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "PLANS.md")
    with open(out_path, "w") as f:
        f.write("# Physical plans of load-bearing operators\n\n")
        f.write("Generated by tools/explain_plans.py; assertions below run in CI-style.\n\n")
        f.write("## Assertions\n\n")
        for name, ok, _ in checks:
            f.write(f"- {'PASS' if ok else 'FAIL'}: {name}\n")
        for title, plan in sections:
            f.write(f"\n## {title}\n\n```\n{plan.strip()}\n```\n")
    failures = [name for name, ok, _ in checks if not ok]
    print(f"{len(checks) - len(failures)}/{len(checks)} plan assertions passed -> {out_path}")
    if failures:
        print("FAILED:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
