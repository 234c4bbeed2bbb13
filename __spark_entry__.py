"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: the causal-KG span-extraction + entity-linking
                 pipeline over the sf0.001 documents table adapted to the
                 input_hint page schema; returns canonical mention
                 entities with counts (guaranteed non-empty).
queries()      — one entry per implemented operator from SURVEY.md §2
                 plus the training-data-pipeline families (dedup,
                 similarity, text analysis, linking, CC, multimodal,
                 typed decode, grouping sets, IVF ANN, rel loose
                 matching, gold-data eval, gazetteer extraction fitted
                 on the reference train split, URL canonicalization
                 dedup, graph 2-hop join + fixed-iteration PageRank,
                 salted skew aggregation, cross-doc dup-ngram stats,
                 benchmark decontamination, stratified sampling,
                 hot-group skew profiling, KG negative sampling, DSIR
                 importance weighting, temperature mixing weights,
                 composite curation verdict, CC size histogram,
                 fitted HMM span tagger + NB relation classifier on the
                 reference gold splits, averaged-perceptron span tagger
                 and relation classifier fitted by exact scaled-integer
                 Iterative Parameter Mixing, seeded-flagship surface):
                 111 queries, 109 with exact DuckDB oracles.
oracle_sql()   — exact DuckDB twins for every relational operator; the
                 two remaining UDF-backed pipeline queries
                 (pipeline_spans, causal_triples) are rows-only by
                 design — their golden correctness gate is the pytest
                 oracle-parity suite (tests/test_pipeline_parity.py,
                 tests/test_reference_math.py), which asserts exact
                 span/relation/triple-set equality vs the independent
                 single-process oracle, including on the driver's own
                 testdata (empty and seeded). causal_triples_seeded is
                 hash-gated via a frozen surface fixture keyed by the
                 documents table fingerprint (tools/freeze_seeded.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _ensure_importable(spark: SparkSession) -> None:
    """Ship the package to Python workers regardless of driver cwd
    (spark-submit --py-files equivalent for the sandbox)."""
    import shutil
    import tempfile

    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "causalre_spark")
    zip_base = os.path.join(tempfile.gettempdir(), "causalre_spark_pkg")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(zip_base, "zip",
                            root_dir=os.path.dirname(pkg_dir),
                            base_dir="causalre_spark")
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added in this context


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: extract mention spans with the
    frozen tagger UDFs, link + canonicalize them, return the entity table."""
    _ensure_importable(spark)
    from causalre_spark.config import DEFAULT_CONFIG
    from causalre_spark.operators.linking import link_mentions
    from causalre_spark.functions.text import NORMALIZE_SQL
    from causalre_spark.plans.entry_queries import q_pipeline_spans

    sf_dir = "/root/testdata/sf0.001"
    mentions = q_pipeline_spans(spark, sf_dir)
    entities = link_mentions(mentions.select("text"), DEFAULT_CONFIG)
    # the ONE frozen normalizer (functions.text.NORMALIZE_SQL) on both
    # sides of the join — a second inline normalization here would
    # silently drop any mention whose surface normalizes differently
    # (e.g. non-ASCII, which NORMALIZE_SQL passes through)
    counts = mentions.select(
        F.expr(NORMALIZE_SQL.format(x="text")).alias("form")
    ).groupBy("form").agg(F.count(F.lit(1)).alias("n_mentions"))
    return (
        entities.join(counts, "form")
        .groupBy("canonical_id", "canonical_form")
        .agg(F.sum("n_mentions").alias("n_mentions"),
             F.count(F.lit(1)).alias("n_surface_forms"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from causalre_spark.plans.entry_queries import QUERIES

    def _wrap(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_importable(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from causalre_spark.plans.entry_queries import ORACLES

    return dict(ORACLES)
