"""Reference-format annotated-corpus JSON loader (SURVEY §2.1 S1-S3).

Reads the reference's corpus JSON layout (format documented at
data_preparation.py:242-288, validated by validator.py:32-59):

  { "schema": { "span_types": [...], "relation_types": [...] },
    "data": { "train"|"val"|"test"|"predict": [
        { "tokens": [...], "spans": [{start,end,type}],
          "relations": [{head,tail,type}] }, ... ] } }

-> one DataFrame per split with columns
   (doc_id long, tokens array<string>,
    spans array<struct<start int, end int, type string>>,
    relations array<struct<head int, tail int, type string>>)
plus the schema dict. Both on-disk id conventions are handled: 'idx'
(head/tail index the spans list — passed through) and 'id' (spans carry
unique ids referenced by relations — converted to list indexes, like
data_preparation.py:128-137).

Valid-span filtering (P1, data_preparation.py:141-181) and the relation
remap after filtering (P2, :166-179) are relational operators here —
see filter_valid_spans().
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPLIT_SCHEMA = (
    "doc_id long, tokens array<string>, "
    "spans array<struct<start:int, end:int, type:string>>, "
    "relations array<struct<head:int, tail:int, type:string>>"
)


def load_corpus_json(
    spark: SparkSession, path: str, data_format: str = "idx"
) -> tuple[dict, dict[str, DataFrame]]:
    """-> (schema_dict, {split_name: DataFrame}). UTF-8/UTF-8-SIG safe
    (utils.py:187-229 BOM sniff equivalent)."""
    with open(path, encoding="utf-8-sig") as f:
        blob = json.load(f)
    schema = blob.get("schema", {})
    splits: dict[str, DataFrame] = {}
    for split, obs_list in blob.get("data", {}).items():
        rows = []
        for i, obs in enumerate(obs_list):
            spans = obs.get("spans", [])
            rels = obs.get("relations", [])
            if data_format == "id":
                # span 'id' -> positional index (data_preparation.py:128-137)
                id2idx = {sp["id"]: j for j, sp in enumerate(spans)}
                rels = [
                    {"head": id2idx[r["head"]], "tail": id2idx[r["tail"]],
                     "type": r["type"]}
                    for r in rels
                ]
            rows.append((
                i,
                list(obs.get("tokens", [])),
                [(sp["start"], sp["end"], sp["type"]) for sp in spans],
                [(r["head"], r["tail"], r["type"]) for r in rels],
            ))
        splits[split] = spark.createDataFrame(rows, SPLIT_SCHEMA)
    return schema, splits


def filter_valid_spans(
    df: DataFrame, max_seq_len: int, max_span_width: int
) -> DataFrame:
    """P1 + P2 relationally: drop spans violating width/length limits and
    remap relation head/tail indexes onto the surviving spans; relations
    with a pruned endpoint are dropped (lost-rel semantics,
    data_preparation.py:141-181).

    Pure array algebra (transform/filter/array_position) — no explode,
    no shuffle: the document row is the unit of work.
    """
    lim = (
        f"filter(spans, sp -> sp.end - sp.start <= {max_span_width}"
        f" AND sp.end <= least(size(tokens), {max_seq_len}))"
    )
    return (
        df.withColumn("kept_spans", F.expr(lim))
        .withColumn("n_rels_orig", F.size("relations"))
        .withColumn(
            "relations",
            F.expr(
                # old index -> the span struct -> its position in kept list
                "filter(transform(relations, r -> struct("
                "  cast(array_position(kept_spans, spans[r.head]) - 1 as int) as head,"
                "  cast(array_position(kept_spans, spans[r.tail]) - 1 as int) as tail,"
                "  r.type as type)),"
                " r -> r.head >= 0 AND r.tail >= 0)"
            ),
        )
        # A3: per-doc lost-relation count (rel_processor.py:96-114)
        .withColumn("n_lost_rels", F.col("n_rels_orig") - F.size("relations"))
        .drop("spans", "n_rels_orig")
        .withColumnRenamed("kept_spans", "spans")
    )
