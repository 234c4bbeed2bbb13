"""Units for the fitted k-means + SemDeDup operators (the oracle
queries cover bulk semantics on the embeddings table; these lock init
determinism, convergence on a separable toy set, and tie/empty-cluster
corners)."""

from pyspark.sql import functions as F

from causalre_spark.operators import clustering as C


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_kmeans_separable_two_clusters(spark):
    # two tight blobs on opposite corners; k=2 must split them exactly
    a = [(i, [10.0 + 0.1 * i, 10.0]) for i in range(5)]
    b = [(i + 5, [-10.0, -10.0 - 0.1 * i]) for i in range(5)]
    out = {r["vec_id"]: r["cluster"]
           for r in C.kmeans_assign(_emb(spark, a + b), k=2, iters=3,
                                    dim=2).collect()}
    assert len({out[i] for i in range(5)}) == 1
    assert len({out[i + 5] for i in range(5)}) == 1
    assert out[0] != out[5]


def test_kmeans_deterministic_under_partitioning(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = _emb(spark, rows)
    r1 = sorted((r["vec_id"], r["cluster"])
                for r in C.kmeans_assign(df, k=4, iters=2, dim=8).collect())
    r2 = sorted((r["vec_id"], r["cluster"])
                for r in C.kmeans_assign(df.repartition(13), k=4, iters=2,
                                         dim=8).collect())
    assert r1 == r2


def test_kmeans_duplicate_points_tie_to_smallest_cluster(spark):
    # all identical vectors: every centroid ties; argmax picks cluster 0,
    # clusters 1.. go empty and must not crash later iterations
    df = _emb(spark, [(i, [1.0, 1.0]) for i in range(6)])
    out = {r["vec_id"]: r["cluster"]
           for r in C.kmeans_assign(df, k=3, iters=2, dim=2).collect()}
    assert set(out.values()) == {0}


def test_semantic_dedup_within_cluster_only(spark):
    # near-identical pair in blob A; blob B far away. The A-pair must
    # surface; no cross-blob pair can (different clusters block them).
    rows = [(0, [1.0, 0.0]), (1, [0.999, 0.01]),
            (2, [-1.0, 0.0]), (3, [-0.999, -0.01])]
    pairs = {(r["id_a"], r["id_b"])
             for r in C.semantic_dedup_pairs(_emb(spark, rows), thd=0.9,
                                             k=2, iters=2, dim=2).collect()}
    assert (0, 1) in pairs
    assert (2, 3) in pairs
    assert not any((a, b) in pairs for a in (0, 1) for b in (2, 3))


def test_kmeans_sizes_total(spark):
    df = _emb(spark, [(i, [float(i % 5), float(i % 3)]) for i in range(30)])
    sizes = C.kmeans_sizes(df, k=4, iters=2, dim=2).collect()
    assert sum(r["n_vectors"] for r in sizes) == 30


def test_assign_frame_matches_expression_spelling(spark):
    """The vectorized Arrow assignment (_assign_frame) must reproduce
    the literal-chain expression spelling (_assign_col / _norm_fixed)
    BIT-FOR-BIT — cluster ids equal, norms equal as exact doubles —
    on real driver embeddings (non-trivial 64-dim float32 data)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = C.kmeans_fit(emb, k=8, iters=2, dim=64)
    expr_side = emb.select(
        "vec_id",
        C._assign_col(cents, "embedding").alias("cluster"),
        F.expr(C._norm_fixed("embedding", 64)).alias("nrm"))
    udf_side = C._assign_frame(emb, cents, "vec_id", "embedding",
                               with_norm=True)
    a = {r["vec_id"]: (r["cluster"], r["nrm"]) for r in expr_side.collect()}
    b = {r["vec_id"]: (r["cluster"], r["nrm"]) for r in udf_side.collect()}
    assert a == b  # exact equality, including the float64 norms
