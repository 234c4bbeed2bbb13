"""Freeze the seeded-flagship triple surface for a value-hash oracle.

Runs q_causal_triples_seeded (the full pages -> extract -> link ->
canonicalize -> triples pipeline over the causally-seeded driver
corpus) at every driver scale factor and writes ONE parquet —
fixtures/seeded/causal_triples_seeded.parquet — keyed by
(n_docs, sum_len) where sum_len = sum(length(text)) over the documents
table (the row count alone is ambiguous: the driver's sf0.001 and
sf0.01 documents tables both have 500 rows with different content), so
the static oracle SQL selects the stripe matching whatever documents
table the driver registered:

    WHERE n_docs = (SELECT count(*) FROM documents)
      AND sum_len = (SELECT sum(length(text)) FROM documents)

This upgrades the flagship from a rows-only driver row to
rows+schema+hash (VERDICT r03 #6). Division of evidence: the frozen
fixture pins END-TO-END DETERMINISM of the whole pipeline (any drift
in extraction, model decode, NMS, linking, canonical pick or dedup
changes the hash); CORRECTNESS of the same output is the independent
single-process oracle in tests/test_pipeline_parity.py (exact
triple-set equality, recomputed from scratch at test time, including
the seeded twin). Rerun this tool after any intentional model/pipeline
change and commit the diff.

Run: python tools/freeze_seeded.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX = os.path.join(REPO, "fixtures", "seeded")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def main() -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from causalre_spark.plans.entry_queries import QUERIES
    from causalre_spark.session import get_spark

    spark = get_spark(app="freeze_seeded", cores=16)
    os.makedirs(FIX, exist_ok=True)
    from pyspark.sql import functions as F

    frames = []
    for sf in SF_DIRS:
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        n_docs, sum_len = docs.agg(
            F.count(F.lit(1)), F.sum(F.length("text"))).collect()[0]
        pdf = QUERIES["causal_triples_seeded"](spark, sf).toPandas()
        pdf.insert(0, "sum_len", sum_len)
        pdf.insert(0, "n_docs", n_docs)
        frames.append(pdf.sort_values(
            ["cause_id", "effect_id", "predicate"]).reset_index(drop=True))
        print(f"{sf}: {len(pdf)} triples over {n_docs} docs (sum_len={sum_len})")
    out = os.path.join(FIX, "causal_triples_seeded.parquet")
    pq.write_table(pa.Table.from_pandas(pd.concat(frames),
                                        preserve_index=False), out)
    print("froze", out)


if __name__ == "__main__":
    main()
