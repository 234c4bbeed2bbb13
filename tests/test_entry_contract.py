"""Driver-contract smoke: entry() returns rows; a representative subset
of queries() matches oracle_sql() via DuckDB at sf0.001 (the full sweep
is tools/check_entry.py at sf0.01 — the round driver's own gate)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SUBSET = [
    "t1_topk_spans", "j1_pair_gen", "a1_micro_prf", "a3_lost_rels",
    "a2_loose_rels",
    "dedup_exact", "dedup_simhash", "text_fingerprint",
    "sim_cosine_topk", "cc_components", "events_sessionize",
    "kg_2hop", "kg_pagerank", "skew_salted_agg",
    "kg_triangles", "kg_degree_stats", "dedup_ngram_jaccard",
    "asof_join_orders", "range_join_errors", "sample_hash",
    "tfidf_topk", "group_quantiles",
    "dedup_crossdoc", "decontaminate", "sample_stratified",
    "domain_skew_stats", "kg_negative_samples", "dsir_weights",
    "lang_mixing_weights", "curation_verdict", "cc_size_stats",
    "bm25_topk", "dedup_compaction", "dedup_near_clusters",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _normalized(df):
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if d[c].dtype.kind == "f":
            d[c] = d[c].round(6)
    return sorted(tuple(str(v) for v in row) for row in d.itertuples(index=False))


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"canonical_id", "canonical_form", "n_mentions"} <= set(df.columns)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = qs[name](spark, SF).toPandas()
    odf = duck.execute(oracles[name]).df()
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _normalized(sdf) == _normalized(odf)
