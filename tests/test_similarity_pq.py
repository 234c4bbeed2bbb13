"""The vectorized PQ assignment (similarity.pq_assign's Arrow crossing)
must reproduce the literal squared-distance-chain + struct-argmin
expression spelling code-for-code on real driver embeddings."""

from pyspark.sql import functions as F

from causalre_spark.operators import similarity as S


def test_pq_assign_matches_expression_spelling(spark):
    m, ksub, dim = 8, 8, 64
    dsub = dim // m
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    book = S.pq_codebook(m, ksub, dsub)
    elem = lambda j: f"embedding[{j}]"  # noqa: E731
    dist_cols = [
        F.expr(S._sqdist_literal(elem, s * dsub, book[s][c])).alias(f"_d{s}_{c}")
        for s in range(m) for c in range(ksub)
    ]
    code_cols = [
        F.expr(S._pq_argmin(s, ksub)).cast("long").alias(f"code_{s}")
        for s in range(m)
    ]
    expr_side = (emb.select("vec_id", *dist_cols)
                 .select("vec_id", *code_cols))
    a = {r["vec_id"]: tuple(r[f"code_{s}"] for s in range(m))
         for r in expr_side.collect()}
    b = {r["vec_id"]: tuple(r[f"code_{s}"] for s in range(m))
         for r in S.pq_assign(emb, m, ksub, dim).collect()}
    assert a == b
