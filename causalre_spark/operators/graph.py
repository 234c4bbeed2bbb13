"""Graph analytics operators over edge DataFrames.

Degree-ordered triangle enumeration (Cohen's MapReduce algorithm; Suri
& Vassilvitskii, "Counting triangles and the curse of the last reducer",
WWW'11) and degree statistics. Everything is pure DataFrame algebra —
two hash aggregations and two joins — so it scales as ordinary shuffles.

Reference context: the CausalRE pipeline materializes (cause, CAUSES,
effect) triples into a graph table (north rule / SURVEY §2.11); these
are the first health-check / analysis workloads a KG team runs over
that table. cc_components / kg_pagerank cover connectivity and
centrality; this module adds local clustering structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical undirected edge set (u < v), self-loops dropped."""
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v"))
        .distinct()
    )


def degrees(und: DataFrame) -> DataFrame:
    """(node, deg) from a canonical undirected edge set."""
    return (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    )


def degree_histogram(und: DataFrame) -> DataFrame:
    """(deg, n_nodes) histogram — the standard graph health check."""
    return degrees(und).groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))


def triangles(und: DataFrame) -> DataFrame:
    """Enumerate each triangle exactly once via the (degree, id) total
    order: direct every edge low-rank -> high-rank, join wedges on the
    middle node, close with a left-semi join against the directed set.

    Why the ordering matters at scale: wedge fan-out per node is
    bounded by its OUT-degree under the order, which is O(sqrt(m)) for
    any node — a degree-d celebrity node contributes min(d, sqrt(m))²
    wedges instead of d². Total work O(m^{3/2}) versus the naive
    neighborhood-square join that dies on the hottest reducer.

    Returns id-canonical rows (a < b < c), one per triangle.
    """
    und = und.persist()
    deg = degrees(und)
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    u_first = (
        (F.col("deg_u") < F.col("deg_v"))
        | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v")))
    )
    directed = (
        und.join(du, "u").join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
        )
        .persist()
    )
    wedge = (
        directed.alias("p")
        .join(directed.alias("q"), F.col("p.y") == F.col("q.x"))
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"),
                F.col("q.y").alias("z"))
    )
    tri = wedge.join(
        directed.select(F.col("x").alias("x"), F.col("y").alias("z")),
        ["x", "z"], "left_semi")
    return tri.select(
        F.least("x", "y", "z").alias("a"),
        (F.col("x") + F.col("y") + F.col("z")
         - F.least("x", "y", "z") - F.greatest("x", "y", "z")).alias("b"),
        F.greatest("x", "y", "z").alias("c"),
    )


def negative_samples(edges: DataFrame, nodes: DataFrame,
                     n_nodes: int) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training data:
    for every positive edge (src, dst), propose the tail corruption
    dst_neg = md5(src # dst) mod n_nodes, then keep only proposals that
    (a) land on a real node, (b) differ from src, and (c) are NOT a
    positive edge (anti-join) — the standard filtered-corruption scheme
    of TransE-family training pipelines, minus the RNG: md5 over the
    edge identity makes the draw reproducible across engines and reruns.

    Output: (src, dst_neg) one candidate per positive edge that survives
    the filters (dropped proposals are simply absent — the resample-on-
    collision loop of a trainer is a per-epoch concern, not a corpus
    materialization one).

    Scale shape: the proposal is a map-only projection; the node-
    validity check is an equi-join on the node id (broadcast when dims
    are small, shuffle-hash otherwise), and the positive filter is a
    LEFT ANTI join on (src, dst_neg) against the edge set itself —
    the same key distribution as the edge table, so co-partitioned
    bucketing (pipeline.write_bucketed_graph) makes it exchange-free.
    """
    from causalre_spark.functions.hashing import md5_long_sql_spark

    edge_key = "concat(cast(src as string), '#', cast(dst as string))"
    prop = edges.select(
        "src",
        (F.expr(md5_long_sql_spark(edge_key)) % F.lit(n_nodes))
        .alias("dst_neg"),
    ).filter(F.col("dst_neg") != F.col("src"))
    valid = prop.join(
        nodes.select(F.col(nodes.columns[0]).alias("dst_neg")), "dst_neg")
    return (
        valid.join(
            edges.select("src", F.col("dst").alias("dst_neg")),
            ["src", "dst_neg"], "left_anti")
        .select("src", "dst_neg")
        .distinct()
    )


def label_propagation(nodes: DataFrame, edges: DataFrame,
                      rounds: int = 3) -> DataFrame:
    """Deterministic synchronous label-propagation communities (LPA,
    Raghavan et al. 2007 — public paper), the community-detection
    sibling of connected components: labels start as node ids; each
    round every node adopts the most frequent label among its
    neighbors, tie-broken (count desc, label asc) so the answer is
    total-order deterministic under any partitioning; isolated nodes
    keep their own label. `edges` (src, dst) is symmetrized here.

    Scale shape: per round one equi-join (neighbor-label gather) + two
    hash aggregations on uniform node ids — the same iterative-join
    shape as PageRank; rounds are FIXED so the plan is static and a
    production run can checkpoint labels between rounds.

    Returns (node, label) after `rounds` rounds.
    """
    # persisted: the symmetrized edge set is re-joined once per round —
    # without the cache every round's subtree re-derives the full edge
    # DAG (doc-graph joins) inside one deeply nested plan
    und = (edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct().persist())
    labels = nodes.select("node").withColumn("label", F.col("node"))
    for _ in range(rounds):
        nb = (und.join(labels, und["dst"] == labels["node"])
              .select("src", "label"))
        cnt = nb.groupBy("src", "label").agg(F.count(F.lit(1)).alias("c"))
        best = cnt.groupBy("src").agg(
            F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl")))
            .alias("t"))
        new = best.select(F.col("src").alias("node"),
                          (-F.col("t.nl")).cast("long").alias("new_label"))
        labels = (nodes.select("node").join(new, "node", "left")
                  .select("node",
                          F.coalesce("new_label", "node").alias("label")))
    return labels
