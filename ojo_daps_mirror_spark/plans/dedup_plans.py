"""Deduplication queries (SURVEY.md §2.A10–A12).

Duplicate key for the documents table: md5 of the first 40 chars of
``text`` — the testdata has no full-text duplicates, but prefix groups
exist, giving the operators real multi-member groups to resolve. The
reference's analog key is the 768-dim description vector; the graph /
exemplar / split machinery downstream is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    chain_edges,
    connected_components,
    exact_duplicates,
    split_components_by,
)
from ..sources import load_table
from . import register


def _dup_key() -> F.Column:
    return F.md5(F.substring(F.col("text"), 1, 40))


_A10_ORACLE = """
SELECT doc_id,
       md5(substr(text, 1, 40)) AS dup_key,
       MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40))) AS exemplar_id,
       COUNT(*)    OVER (PARTITION BY md5(substr(text, 1, 40))) AS group_size,
       doc_id <> MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40)))
         AS is_duplicate
FROM documents
ORDER BY doc_id
"""


@register("dedup_exact", oracle=_A10_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups with min-id exemplar
    (dqa/data_getters.py:identify_duplicates, weight=1 case)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_duplicates(docs, "doc_id", _dup_key()).orderBy("doc_id")


_A11_ORACLE = """
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40))) AS component_id
FROM documents
ORDER BY doc_id
"""


@register("dedup_components", oracle=_A11_ORACLE)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the duplicate-link chain edges
    (dqa/data_getters.py:get_duplicate_subgraphs, networkx → distributed
    min-label propagation).

    The edges are a *chain* per duplicate group, so the oracle's
    closed-form answer (min doc_id per key group) is only reproduced if
    transitive closure actually works.
    """
    docs = load_table(spark, sf_dir, "documents")
    edges = chain_edges(docs, "doc_id", _dup_key())
    comps = connected_components(edges, docs.select("doc_id"), id_col="doc_id")
    return comps.orderBy("doc_id")


_A12_ORACLE = """
WITH keyed AS (
  SELECT doc_id, source,
         MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40))) AS component_id
  FROM documents
), sub AS (
  SELECT *,
         COUNT(*)    OVER (PARTITION BY component_id, source) AS subgroup_size,
         MIN(doc_id) OVER (PARTITION BY component_id, source) AS exemplar_id
  FROM keyed
)
SELECT doc_id, source, component_id, subgroup_size, exemplar_id,
       doc_id <> exemplar_id AS is_duplicate
FROM sub
WHERE subgroup_size > 1
ORDER BY doc_id
"""


@register("dedup_split_by_source", oracle=_A12_ORACLE)
def dedup_split_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Components re-split by source, singletons dropped, exemplar per
    split group (dqa/data_getters.py:get_subgraphs_by_location — job ads
    in different locations are not each other's duplicates)."""
    docs = load_table(spark, sf_dir, "documents")
    edges = chain_edges(docs, "doc_id", _dup_key())
    comps = connected_components(edges, docs.select("doc_id"), id_col="doc_id")
    members = docs.select("doc_id", "source").join(comps, "doc_id")
    split = split_components_by(members, "component_id", "source", "doc_id")
    return split.select(
        "doc_id",
        "source",
        "component_id",
        "subgroup_size",
        "exemplar_id",
        "is_duplicate",
    ).orderBy("doc_id")
