"""Seventy-third sweep (SURVEY.md §2 B132-B133, C148).

Theil inequality decomposition (the DECOMPOSABLE inequality index —
B81's Gini can't split between/within; Theil does, exactly), restricted
mean survival time over B72's Kaplan-Meier curve (the
clinically-standard scalar a survival curve reduces to), and
IDF-weighted Jaccard near-dup verification (soft dedup: shared RARE
text counts more than shared boilerplate — the similarity C7's
unweighted Jaccard mis-ranks on boilerplate-heavy corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import shingles, sql_shingles, sql_tokens, tokens
from ..operators.attach import scalars
from ..sources import load_table
from . import register
from .llm_plans37 import _B72_ORACLE, kaplan_meier_retention
from .text_plans import MH_SHINGLE_K, NG_BLOCK_K, NG_DF_CAP

# ---------------------------------------------------------------- B132

_B132_ORACLE = f"""
WITH vals AS (
  SELECT c.c_nationkey AS g,
         CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
per_g AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(x) AS BIGINT) AS s_g,
         SUM((x * 1.0) * ln(x)) AS xlnx_g
  FROM vals GROUP BY g
),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s
  FROM per_g
),
parts AS (
  SELECT
    SUM(p.xlnx_g) / (t.s * 1.0) - ln(t.s * 1.0 / t.n) AS t_total,
    SUM((p.s_g * 1.0 / t.s)
        * ln((p.s_g * 1.0 / p.n_g) / (t.s * 1.0 / t.n))) AS t_between,
    SUM((p.s_g * 1.0 / t.s)
        * (p.xlnx_g / (p.s_g * 1.0) - ln(p.s_g * 1.0 / p.n_g)))
      AS t_within,
    MAX(t.n) AS n
  FROM per_g p CROSS JOIN tot t
  GROUP BY t.s, t.n
)
SELECT CAST(n AS BIGINT) AS n_orders,
       {sql_round('t_total', 6)} AS theil_total,
       {sql_round('t_between', 6)} AS theil_between,
       {sql_round('t_within', 6)} AS theil_within,
       {sql_round('t_total - t_between - t_within', 6)} AS residual
FROM parts
"""


@register("theil_decomposition", oracle=_B132_ORACLE)
def theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of order values, decomposed EXACTLY into
    between-nation and within-nation components (T = T_b + T_w — the
    additive-decomposability property B81's Gini lacks, and the reason
    inequality-by-segment reports use Theil): answers "is revenue
    concentration a geography story or an in-market story" in one
    query. The residual column proves the identity holds to 6dp.

    Scale shape: ONE fact-grain aggregate to per-group sufficient
    statistics (n, Σx, Σx·ln x — the income-weighted entropy partial),
    totals derive from the partials and every Theil term is a
    |groups|-row projection. Σx·ln x map-side partials merge by
    addition at any scale.
    """
    vals = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_nationkey").alias("g"),
            F.round(F.col("o_totalprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("x"),
        )
    )
    per_g = vals.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("x").cast("bigint").alias("s_g"),
        F.sum((F.col("x") * 1.0) * F.log(F.col("x"))).alias("xlnx_g"),
    )
    per_g = per_g.persist()
    tot = per_g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
    )
    j = per_g.transform(scalars(tot))
    mu = F.col("s") * 1.0 / F.col("n")
    mu_g = F.col("s_g") * 1.0 / F.col("n_g")
    share = F.col("s_g") * 1.0 / F.col("s")
    agg = j.groupBy("s", "n").agg(
        (F.sum("xlnx_g") / (F.first("s") * 1.0) - F.log(mu)).alias(
            "t_total"
        ),
        F.sum(share * F.log(mu_g / mu)).alias("t_between"),
        F.sum(
            share
            * (F.col("xlnx_g") / (F.col("s_g") * 1.0) - F.log(mu_g))
        ).alias("t_within"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_orders"),
        round_eps(F.col("t_total"), 6).alias("theil_total"),
        round_eps(F.col("t_between"), 6).alias("theil_between"),
        round_eps(F.col("t_within"), 6).alias("theil_within"),
        round_eps(
            F.col("t_total") - F.col("t_between") - F.col("t_within"), 6
        ).alias("residual"),
    )


# ---------------------------------------------------------------- B133

RMST_HORIZON = 30  # days, matches B72's censoring horizon

_B133_ORACLE = f"""
WITH km AS ({_B72_ORACLE}),
stepped AS (
  SELECT t, survival,
         LEAD(t) OVER (ORDER BY t) AS t_next,
         ROW_NUMBER() OVER (ORDER BY t) AS rn
  FROM km
),
head AS (
  SELECT LEAST(MIN(t), {RMST_HORIZON}) * 1.0 AS h FROM km
),
segs AS (
  SELECT survival
         * (LEAST(COALESCE(t_next, {RMST_HORIZON}), {RMST_HORIZON})
            - LEAST(t, {RMST_HORIZON})) AS seg
  FROM stepped WHERE t < {RMST_HORIZON}
)
SELECT CAST({RMST_HORIZON} AS BIGINT) AS horizon_days,
       {sql_round('(SELECT h FROM head) + COALESCE(SUM(seg), 0)', 6)}
         AS rmst_days
FROM segs
"""


@register("rmst_summary", oracle=_B133_ORACLE)
def rmst_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time over B72's Kaplan-Meier curve:
    RMST(30d) = ∫₀³⁰ S(t)dt — the area under the step curve, i.e. the
    average event-free days in the first month. THE scalar that makes
    survival curves comparable (median survival is undefined when the
    curve never crosses 0.5 — RMST always exists), computed by exact
    step-integration: S=1 head segment + survival·Δt per step. Oracle
    EMBEDS B72's oracle verbatim so curve and scalar can never drift
    (the C63 no-drift recipe).

    Scale shape: composes B72's output (a |days|-row frame); the
    integration is one LEAD window plus a 1-row reduction.
    """
    km = kaplan_meier_retention(spark, sf_dir).select("t", "survival")
    w = Window.orderBy("t")
    stepped = km.select(
        "t", "survival", F.lead("t").over(w).alias("t_next")
    )
    head = km.agg(
        (F.least(F.min("t"), F.lit(RMST_HORIZON)) * 1.0).alias("h")
    )
    segs = stepped.where(F.col("t") < RMST_HORIZON).select(
        (
            F.col("survival")
            * (
                F.least(
                    F.coalesce(F.col("t_next"), F.lit(RMST_HORIZON)),
                    F.lit(RMST_HORIZON),
                )
                - F.least(F.col("t"), F.lit(RMST_HORIZON))
            )
        ).alias("seg")
    )
    return segs.agg(
        F.coalesce(F.sum("seg"), F.lit(0.0)).alias("tail")
    ).transform(scalars(head)).select(
        F.lit(RMST_HORIZON).cast("bigint").alias("horizon_days"),
        round_eps(F.col("h") + F.col("tail"), 6).alias("rmst_days"),
    )


# ---------------------------------------------------------------- C148

WJ_THRESHOLD = 0.4

_C148_ORACLE = f"""
WITH blocks AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), NG_BLOCK_K)} AS bh
  FROM documents
),
ex AS (SELECT doc_id, unnest(bh) AS s FROM blocks),
df_ AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= {NG_DF_CAP}),
posts AS (
  SELECT s, list_sort(list(DISTINCT doc_id)) AS ds
  FROM (SELECT ex.doc_id, ex.s FROM ex JOIN df_ USING (s))
  GROUP BY s HAVING len(list(DISTINCT doc_id)) BETWEEN 2 AND {NG_DF_CAP}
),
cand AS (
  SELECT DISTINCT p.i, p.j FROM (
    SELECT unnest(flatten(list_transform(ds, (x, ii) ->
      list_transform(ds[ii + 1:], y -> struct_pack(i := x, j := y))))) AS p
    FROM posts
  )
),
docs3 AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), MH_SHINGLE_K)} AS sh
  FROM documents
),
n_docs AS (SELECT COUNT(*) * 1.0 AS nd FROM documents),
sdf AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest(sh) AS s FROM docs3) GROUP BY s
),
pair_shingles AS (
  SELECT c.i, c.j, u.s,
         MAX(CASE WHEN u.side = 'a' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN u.side = 'b' THEN 1 ELSE 0 END) AS in_b
  FROM cand c
  JOIN (
    SELECT doc_id, unnest(sh) AS s, 'a' AS side FROM docs3
    UNION ALL
    SELECT doc_id, unnest(sh) AS s, 'b' AS side FROM docs3
  ) u ON (u.side = 'a' AND u.doc_id = c.i)
      OR (u.side = 'b' AND u.doc_id = c.j)
  GROUP BY c.i, c.j, u.s
),
weighted AS (
  SELECT i, j,
         SUM(CASE WHEN in_a = 1 AND in_b = 1
             THEN ln(1.0 + (SELECT nd FROM n_docs) / sdf.df) ELSE 0 END)
           AS w_int,
         SUM(ln(1.0 + (SELECT nd FROM n_docs) / sdf.df)) AS w_uni
  FROM pair_shingles JOIN sdf USING (s)
  GROUP BY i, j
)
SELECT i AS id_a, j AS id_b,
       {sql_round('w_int / w_uni', 4)} AS weighted_jaccard
FROM weighted WHERE w_int / w_uni >= {WJ_THRESHOLD}
ORDER BY id_a, id_b
"""


@register("weighted_jaccard_dedup", oracle=_C148_ORACLE)
def weighted_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted Jaccard near-dup pairs: C7's capped blocking
    candidates, verified with Σ_{s∈A∩B} w_s / Σ_{s∈A∪B} w_s where
    w_s = ln(1 + N/df_s) — shared RARE shingles count, shared
    boilerplate barely does (the soft-dedup measure that separates
    "same template" from "same content", which unweighted Jaccard
    conflates; pairs scoring ≥0.4 weighted are content-level dupes).

    Scale shape: identical candidate generation to C7 (one capped
    posting shuffle, map-side pair expansion); verification explodes
    only CANDIDATE docs' shingles (side-tagged union, one
    (pair, shingle) aggregate) and joins the shingle-DF frame derived
    from one corpus-wide aggregate. Weight sums are ordered by the
    per-pair group, same float order both engines at 4dp.
    """
    raw = load_table(spark, sf_dir, "documents")
    ex = raw.select(
        "doc_id",
        F.explode(shingles(tokens(F.col("text")), NG_BLOCK_K)).alias("s"),
    )
    posts = (
        ex.groupBy("s")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= NG_DF_CAP))
    )
    ds = F.col("ds")
    pair_arr = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("i"), y.alias("j")),
            ),
        )
    )
    cand = (
        posts.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .distinct()
    )
    cand = cand.persist()
    docs3 = raw.select(
        "doc_id", shingles(tokens(F.col("text")), MH_SHINGLE_K).alias("sh")
    )
    n_docs = raw.agg((F.count(F.lit(1)) * 1.0).alias("nd"))
    sdf = (
        docs3.select("doc_id", F.explode("sh").alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    exploded = docs3.select("doc_id", F.explode("sh").alias("s"))
    a_side = cand.join(
        exploded.withColumnRenamed("doc_id", "i"), "i"
    ).select("i", "j", "s", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    b_side = cand.join(
        exploded.withColumnRenamed("doc_id", "j"), "j"
    ).select("i", "j", "s", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    pair_shingles = (
        a_side.unionByName(b_side)
        .groupBy("i", "j", "s")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    weighted = (
        pair_shingles.join(sdf, "s")
        .transform(scalars(n_docs))
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.when(
                    (F.col("in_a") == 1) & (F.col("in_b") == 1),
                    F.log(1.0 + F.col("nd") / F.col("df")),
                ).otherwise(0.0)
            ).alias("w_int"),
            F.sum(F.log(1.0 + F.col("nd") / F.col("df"))).alias("w_uni"),
        )
    )
    return (
        weighted.where(F.col("w_int") / F.col("w_uni") >= WJ_THRESHOLD)
        .select(
            F.col("i").alias("id_a"),
            F.col("j").alias("id_b"),
            round_eps(F.col("w_int") / F.col("w_uni"), 4).alias(
                "weighted_jaccard"
            ),
        )
        .orderBy("id_a", "id_b")
    )
