"""Denormalised feature assembly (SURVEY.md §2 A23–A24).

- features_table — the reference's feature-collection join
  (dqa/data_getters.py:get_features): every per-ad enrichment output
  keyed by ad id, merged into one wide frame. The reference loops
  feature getters into a driver-side dict-of-dicts; here it is one
  multi-way equi-join on doc_id that Catalyst collapses into a single
  shuffle-stage pipeline (each input is already doc_id-unique).
- dedup_weight_band — duplicate ids filtered to a link-weight band
  (dqa/data_getters.py:get_duplicate_ids / identify_duplicates with
  MIN/MAX_DUPE_WEIGHT): near-dup edges carry their similarity as the
  weight; the band filter selects which links count before components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import connected_components
from ..sources import load_table
from . import register
from .dedup_plans import dedup_exact
from .enrich_plans import requires_degree
from .text_plans import lang_id, quality_score, token_count
from .vector_plans import near_dup_cosine
from ..functions.vectors import sql_cosine

# ---------------------------------------------------------------- A23

_A23_ORACLE = """
WITH toks AS (
  SELECT doc_id, text,
         string_split_regex(text, '\\s+') AS tk
  FROM documents
),
tc AS (
  SELECT doc_id, len(tk) AS n_tokens FROM toks
),
q AS (
  SELECT doc_id,
         ROUND(0.4 * (len(list_filter(tk, t -> t IN
                 ('the','a','of','to','and','in','is','on','for','with')))
                 * 1.0 / len(tk))
             + 0.3 * least((list_sum(list_transform(tk, s -> length(s)))
                 * 1.0 / len(tk)) / 10.0, 1.0)
             + 0.3 * (1.0 - len(regexp_extract_all(text, '[.,;:!?]'))
                 * 1.0 / length(text)) + 1e-9, 4) AS quality_score
  FROM toks
),
deg AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(
                regexp_replace(regexp_replace(text, '^\\[|\\]$', '', 'g'),
                               '\\s+\\S+$', ''),
                '\\b(vector|stream|merge)\\b')
              THEN 1 ELSE 0 END AS requires_degree
  FROM documents
),
dup AS (
  SELECT doc_id,
         doc_id <> MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40)))
           AS is_duplicate
  FROM documents
)
SELECT d.doc_id, d.lang, d.source,
       tc.n_tokens, q.quality_score, deg.requires_degree,
       dup.is_duplicate
FROM documents d
JOIN tc  USING (doc_id)
JOIN q   USING (doc_id)
JOIN deg USING (doc_id)
JOIN dup USING (doc_id)
ORDER BY doc_id
"""


@register("features_table", oracle=_A23_ORACLE)
def features_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One wide feature row per document, assembled from the registered
    enrichment plans (dqa/data_getters.py:get_features, where the
    feature_getters list is merged into a per-ad dict on the driver).

    Each feature input is doc_id-unique, so the multi-join is a chain of
    1:1 equi-joins — AQE broadcast-joins the thin feature frames into
    the documents scan; no feature ever re-reads the corpus.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    tc = token_count(spark, sf_dir).select("doc_id", "n_tokens")
    q = quality_score(spark, sf_dir).select("doc_id", "quality_score")
    deg = requires_degree(spark, sf_dir)
    dup = dedup_exact(spark, sf_dir).select("doc_id", "is_duplicate")
    return (
        docs.join(tc, "doc_id")
        .join(q, "doc_id")
        .join(deg, "doc_id")
        .join(dup, "doc_id")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- A24

MIN_DUPE_WEIGHT = 0.5  # the band: looser than near-dup's 0.4 floor alone
MAX_DUPE_WEIGHT = 0.99  # exclude exact-copy links, as the reference's
                        # MAX_DUPE_WEIGHT excludes weight-1 exact dups

_A24_ORACLE = f"""
WITH RECURSIVE
v AS (SELECT vec_id, embedding FROM embeddings),
edges AS (
  -- round to 4 dp first: the weight the Spark side band-filters on is
  -- the rounded cos_sim near_dup_cosine emits
  SELECT a.vec_id AS x, b.vec_id AS y
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
  WHERE ROUND({sql_cosine('a.embedding', 'b.embedding')} + 1e-9, 4)
          BETWEEN {MIN_DUPE_WEIGHT} AND {MAX_DUPE_WEIGHT}
),
reach AS (
  SELECT vec_id AS v, vec_id AS w FROM v
  UNION
  SELECT r.v, e.y FROM reach r JOIN edges e ON r.w = e.x
),
comp AS (
  SELECT v AS vec_id, MIN(w) AS component_id FROM reach GROUP BY v
)
SELECT vec_id, component_id,
       vec_id <> component_id AS is_duplicate
FROM comp ORDER BY vec_id
"""


@register("dedup_weight_band", oracle=_A24_ORACLE)
def dedup_weight_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate components restricted to a link-weight band.

    Reference: dqa/data_getters.py:get_duplicate_ids filters the
    JobAdDuplicateLink edge list to [min_weight, max_weight] before
    taking subgraphs — weight 1.0 means exact copy, lower means near
    dup. Here the near-dup cosine IS the link weight; the band keeps
    mid-similarity links only, then the same distributed components +
    min-id exemplar as A11, with the non-exemplar rows flagged
    duplicate (the set get_duplicate_ids yields).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = (
        near_dup_cosine(spark, sf_dir)
        .where(
            (F.col("cos_sim") >= MIN_DUPE_WEIGHT)
            & (F.col("cos_sim") <= MAX_DUPE_WEIGHT)
        )
        .select(F.col("id_a").alias("first_id"), F.col("id_b").alias("second_id"))
    )
    comps = connected_components(pairs, emb.select("vec_id"), id_col="vec_id")
    return comps.select(
        "vec_id",
        "component_id",
        (F.col("vec_id") != F.col("component_id")).alias("is_duplicate"),
    ).orderBy("vec_id")
