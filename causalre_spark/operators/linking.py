"""Entity linking & canonicalization (north_rule addition; SURVEY §2.11).

No reference analogue — the reference emits raw span surface forms
(predictor.py:63-113); at web scale the same real-world entity surfaces
with many variants, so triples must be keyed by canonical entity ids.

Design (all DataFrame algebra, zero Python UDFs):
  1. normalize mention surface (portable SQL twin of functions.text.normalize)
  2. char-k shingles, relationally (transform+sequence+substring, exploded)
  3. MinHash signatures: one groupBy with n_hashes min() aggregates over
     md5-derived portable hash families (functions.hashing)
  4. LSH banding: band keys -> self-equi-join -> candidate pairs
     (hash join on band key; the classic band trick keeps this linear-ish
     instead of the quadratic all-pairs join)
  5. exact Jaccard verification on collected shingle arrays
  6. connected components: iterative min-label propagation with
     localCheckpoint() lineage cuts (GraphFrames-style; near-dup clusters
     have tiny diameter so few iterations; cc_max_iters bounds worst case)
  7. canonical id = min md5_long(form) in component (deterministic);
     canonical surface = the form carrying that minimum
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from causalre_spark.config import DEFAULT_CONFIG, PipelineConfig
from causalre_spark.functions.hashing import md5_long_sql_spark, minhash_sql_spark
from causalre_spark.functions.text import NORMALIZE_SQL


def normalized_forms(mentions: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct normalized mention forms.

    Distinct-first: dedupe the raw surface strings (cheap hash agg)
    BEFORE the regexp normalization, which is ~100x more expensive per
    row — raw-distinct mentions are orders of magnitude fewer than
    mention instances at any corpus size."""
    return (
        mentions.select(F.col(text_col).alias("_raw")).distinct()
        .select(F.expr(NORMALIZE_SQL.format(x="_raw")).alias("form"))
        .filter(F.col("form") != "")
        .distinct()
    )


def mention_form_map(mentions: DataFrame, text_col: str = "text") -> DataFrame:
    """(raw text -> normalized form) dictionary over distinct raw
    mentions — broadcast-join this instead of re-normalizing per
    instance row."""
    return (
        mentions.select(F.col(text_col).alias("text")).distinct()
        .withColumn("form", F.expr(NORMALIZE_SQL.format(x="text")))
        .filter(F.col("form") != "")
    )


def form_shingles(forms: DataFrame, k: int) -> DataFrame:
    """(form, shingle) pairs — char k-shingles; short forms shingle to
    themselves (matches functions.text.char_shingles)."""
    return forms.select(
        "form",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, greatest(1, length(form) - {k} + 1)),"
                f" i -> substring(form, i, {k})))"
            )
        ).alias("shingle"),
    )


def minhash_signatures(shingles: DataFrame, n_hashes: int) -> DataFrame:
    """form -> h0..h{n-1} minhash signature (one shuffle)."""
    aggs = [
        F.min(F.expr(minhash_sql_spark("shingle", seed))).alias(f"h{seed}")
        for seed in range(n_hashes)
    ]
    return shingles.groupBy("form").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, n_hashes: int, band_size: int, dedup: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH banding -> distinct candidate pairs (form_a < form_b).

    Bands are emitted with one explode projection (not an n_bands-way
    union) so the plan stays a single scan -> explode -> self-join.
    max_bucket drops oversized buckets before the quadratic self-join —
    the skew guard that keeps worst-case corpora (low-entropy text where
    every form minhashes together) from exploding to O(n²) pairs."""
    n_bands = n_hashes // band_size
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[F.col(f"h{b * band_size + j}").cast("string")
                               for j in range(band_size)]).alias("bkey"),
        )
        for b in range(n_bands)
    ])
    banded = sigs.select("form", F.explode(band_structs).alias("bk")).select(
        "form", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    if max_bucket:
        sizes = banded.groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("_n"))
        banded = banded.join(
            sizes.filter(F.col("_n") <= max_bucket).drop("_n"),
            ["band", "bkey"], "left_semi")
    a = banded.select("band", "bkey", F.col("form").alias("form_a"))
    bb = banded.select("band", "bkey", F.col("form").alias("form_b"))
    out = (
        a.join(bb, ["band", "bkey"])
        .filter(F.col("form_a") < F.col("form_b"))
        .select("form_a", "form_b")
    )
    # cross-band duplicates are harmless to downstream verification (it
    # re-distincts) — dedup here only when the caller consumes raw pairs
    return out.distinct() if dedup else out


def verify_jaccard(
    pairs: DataFrame, shingles: DataFrame, thd: float,
    broadcast_max_forms: int = 200_000, n_forms: int | None = None,
) -> DataFrame:
    """Exact Jaccard on collected shingle arrays; keeps edges >= thd.

    When the form dictionary is small enough, both lookup sides are
    broadcast so the (much larger) candidate-pair stream never shuffles —
    the join is map-side and the array intersect/union runs in codegen.
    Beyond the threshold it degrades to a shuffle join automatically.
    Pass n_forms when already known to avoid an extra count job."""
    sets = shingles.groupBy("form").agg(F.collect_set("shingle").alias("sh"))
    if (n_forms if n_forms is not None else sets.count()) <= broadcast_max_forms:
        sets = F.broadcast(sets.persist())
    return (
        pairs.join(sets.withColumnRenamed("form", "form_a")
                        .withColumnRenamed("sh", "sh_a"), "form_a")
        .join(sets.withColumnRenamed("form", "form_b")
                  .withColumnRenamed("sh", "sh_b"), "form_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= thd)
        .select("form_a", "form_b", "jaccard")
        .distinct()
    )


def _union_find_components(nodes: list[str], edges: list[tuple[str, str]],
                           label_of) -> list[tuple[str, int]]:
    """Driver-side union-find; component = min label over members."""
    parent: dict[str, str] = {n: n for n in nodes}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    best: dict[str, int] = {}
    for n in nodes:
        r = find(n)
        lab = label_of(n)
        if r not in best or lab < best[r]:
            best[r] = lab
    return [(n, best[find(n)]) for n in nodes]


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 20,
    rows_per_partition: int = 10_000, n_nodes: int | None = None,
    driver_max_nodes: int = 2_000_000, driver_max_edges: int = 5_000_000,
) -> DataFrame:
    """Connected components over (form_a, form_b) edges.

    Returns (form, component) where component = min md5_long(form) over
    the component.

    Adaptive physical strategy (same spirit as Catalyst's broadcast-vs-
    shuffle join selection): a mention graph that fits on the driver is
    solved with one collect + union-find — O(E α(N)) and zero Spark jobs
    per round — while larger graphs take the distributed min-label
    propagation loop. Labels are identical either way.

    Distributed path notes: every iteration eagerly localCheckpoints (a
    lazy chain would reference `labels` twice per round and duplicate
    the upstream plan exponentially); partition count is sized from the
    node count; converges in O(component diameter) rounds, bounded by
    max_iters.
    """
    from causalre_spark.functions.hashing import md5_long

    if n_nodes is None:
        n_nodes = nodes.count()
    spark = nodes.sparkSession
    if n_nodes <= driver_max_nodes:
        # gate on BOTH node and edge counts before taking the driver
        # path: a dense near-dup graph can have edges >> nodes, and an
        # unconditional edge collect would land the whole graph on the
        # driver. One bounded collect (limit max+1) both measures and
        # fetches — no separate count job on the small-graph fast path.
        edges = edges.persist()
        edge_rows = edges.select("form_a", "form_b") \
            .limit(driver_max_edges + 1).collect()
        if len(edge_rows) <= driver_max_edges:
            node_list = [r["form"] for r in nodes.select("form").collect()]
            edge_list = [(r["form_a"], r["form_b"]) for r in edge_rows]
            assigned = _union_find_components(node_list, edge_list, md5_long)
            return spark.createDataFrame(assigned, "form string, component long")
    max_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = max(1, min(max_parts, n_nodes // rows_per_partition + 1))
    labels = (
        nodes.select("form", F.expr(md5_long_sql_spark("form")).alias("component"))
        .repartition(parts, "form")
        .localCheckpoint()
    )
    sym = (
        edges.select("form_a", "form_b")
        .unionByName(edges.select(F.col("form_b").alias("form_a"),
                                  F.col("form_a").alias("form_b")))
        .repartition(parts, "form_b")
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("form", "form_b")
                           .withColumnRenamed("component", "nbr_component"), "form_b")
            .groupBy(F.col("form_a").alias("form"))
            .agg(F.min("nbr_component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, "form", "left")
            .select(
                "form",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("new_component"),
                F.col("component"),
            )
            .repartition(parts, "form")
        ).localCheckpoint()
        n_changed = updated.filter(F.col("new_component") != F.col("component")).count()
        labels = updated.select("form", F.col("new_component").alias("component"))
        if n_changed == 0:
            break
    return labels


def canonical_entities(labels: DataFrame) -> DataFrame:
    """(form, canonical_id, canonical_form): canonical = the form whose
    md5_long equals the component minimum (deterministic; tie-broken by
    form for the astronomically-unlikely 48-bit collision)."""
    with_h = labels.withColumn("fh", F.expr(md5_long_sql_spark("form")))
    w = Window.partitionBy("component").orderBy(F.col("fh").asc(), F.col("form").asc())
    canon = (
        with_h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("component"), F.col("form").alias("canonical_form"))
    )
    return (
        labels.join(canon, "component")
        .select(
            "form",
            F.col("component").alias("canonical_id"),
            "canonical_form",
        )
    )


def link_mentions(
    mentions: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG, text_col: str = "text"
) -> DataFrame:
    """Full linking stage: mentions -> (form, canonical_id, canonical_form).

    forms/shingles are persisted: the distinct over the (much larger)
    mention table must run once, not once per downstream consumer —
    shingles alone is referenced three times (signatures + both sides of
    the jaccard verification)."""
    forms = normalized_forms(mentions, text_col).persist()
    n_forms = forms.count()  # single materialization/count, reused below
    sh = form_shingles(forms, cfg.shingle_size).persist()
    # persisted: the banded plan under the max_bucket guard references the
    # signature aggregation THREE times (bucket sizes + both self-join
    # sides) — without the cache the 8-way minhash groupBy runs 3x
    sigs = minhash_signatures(sh, cfg.minhash_hashes).persist()
    cands = lsh_candidate_pairs(sigs, cfg.minhash_hashes, cfg.minhash_band_size,
                                dedup=False, max_bucket=cfg.lsh_max_bucket)
    edges = verify_jaccard(cands, sh, cfg.link_jaccard_thd, n_forms=n_forms)
    labels = connected_components(forms, edges, cfg.cc_max_iters, n_nodes=n_forms)
    return canonical_entities(labels)
