"""Sixteenth sweep (SURVEY.md §2 B52, C73).

Mutual-information feature screening between categorical dimensions and
Kneser–Ney-smoothed bigram probabilities (the LM-quality upgrade of
C23's raw-MLE surprisal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_tokens, tokens
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B52

_B52_ORACLE = f"""
WITH joint AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS pri, COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
tot AS (SELECT SUM(n) AS t FROM joint),
probs AS (
  SELECT seg, pri, n,
         n * 1.0 / (SELECT t FROM tot) AS pxy,
         SUM(n) OVER (PARTITION BY seg) * 1.0 / (SELECT t FROM tot) AS px,
         SUM(n) OVER (PARTITION BY pri) * 1.0 / (SELECT t FROM tot) AS py
  FROM joint
)
SELECT seg, pri, n,
       {sql_round('pxy * ln(pxy / (px * py))', 8)} AS mi_term,
       {sql_round('(SELECT SUM(pxy * ln(pxy / (px * py))) FROM probs)', 8)}
         AS mi_total
FROM probs
ORDER BY seg, pri
"""


@register("mutual_information_features", oracle=_B52_ORACLE)
def mutual_information_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (market
    segment × order priority) — the feature-screening statistic: does
    knowing the segment tell you anything about priority? Per-cell MI
    terms p(x,y)·ln(p(x,y)/(p(x)p(y))) plus the total.

    The fact join reduces to the |X|×|Y| contingency table in ONE
    map-side-combined aggregate (customer dim broadcasts); marginals
    and the total are windows over that ≤25-row table — nothing
    data-volume-sized touches a second shuffle.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joint = (
        orders.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = F.sum("n").over(Window.partitionBy())
    probs = joint.select(
        "seg",
        "pri",
        "n",
        (F.col("n") / t).alias("pxy"),
        (F.sum("n").over(Window.partitionBy("seg")) / t).alias("px"),
        (F.sum("n").over(Window.partitionBy("pri")) / t).alias("py"),
    )
    term = F.col("pxy") * F.log(F.col("pxy") / (F.col("px") * F.col("py")))
    return (
        probs.withColumn("mi_term", round_eps(term, 8))
        .withColumn(
            "mi_total", round_eps(F.sum(term).over(Window.partitionBy()), 8)
        )
        .select("seg", "pri", "n", "mi_term", "mi_total")
        .orderBy("seg", "pri")
    )


# ---------------------------------------------------------------- C73

KN_D = 0.75  # absolute discount
KN_TOP = 20

_C73_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens("text")} AS t FROM documents
),
bgs AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
),
c2 AS (
  SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
         CAST(COUNT(*) AS BIGINT) AS c FROM bgs GROUP BY 1, 2
),
left_ AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
         CAST(COUNT(*) AS BIGINT) AS types_after
  FROM c2 GROUP BY w1
),
cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS types_before FROM c2 GROUP BY w2
),
n_types AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM c2),
scored AS (
  SELECT c2.w1, c2.w2, c2.c,
         greatest(c2.c - {KN_D}, 0) / left_.cw1
           + {KN_D} * left_.types_after / left_.cw1
             * cont.types_before / (SELECT nt FROM n_types) AS p_kn
  FROM c2
  JOIN left_ ON left_.w1 = c2.w1
  JOIN cont ON cont.w2 = c2.w2
)
SELECT w1, w2, c, {sql_round('p_kn', 6)} AS p_kn
FROM scored
ORDER BY c DESC, w1, w2
LIMIT {KN_TOP}
"""


@register("kneser_ney_bigram", oracle=_C73_ORACLE)
def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser–Ney-smoothed bigram probabilities (the LM-quality upgrade
    of C23's raw MLE): P_KN(w2|w1) = max(c−D,0)/c(w1·) + λ(w1)·P_cont(w2)
    with absolute discount D={KN_D} and the continuation probability
    P_cont(w2) = |{{w : c(w,w2)>0}}| / |bigram types| — the correction
    that stops "Francisco" looking probable everywhere just because
    "San Francisco" is frequent. Top-{KN_TOP} bigrams by count.

    Everything derives from the bigram TYPE table (vocabulary-scale,
    like C45): one corpus-sized shuffle to (w1,w2) counts, then
    left-context totals, continuation counts and the type total are
    map-side-combined aggregates of that table, joined back broadcast.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        tokens(F.col("text")).alias("t")
    )
    bg_arr = F.zip_with(
        F.col("t"),
        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bgs = toks.select(
        F.explode(
            F.slice(bg_arr, 1, F.greatest(F.size("t") - 1, F.lit(0)))
        ).alias("bg")
    )
    c2 = (
        bgs.select(
            F.split("bg", " ")[0].alias("w1"), F.split("bg", " ")[1].alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()  # feeds four aggregates of a vocab-sized table
    )
    left = c2.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count(F.lit(1)).alias("types_after")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("types_before"))
    p_kn = (
        F.greatest(F.col("c") - KN_D, F.lit(0.0)) / F.col("cw1")
        + KN_D
        * F.col("types_after")
        / F.col("cw1")
        * F.col("types_before")
        / F.col("nt")
    )
    # |bigram types| attaches as a broadcast 1-row scalar — a global
    # window here would funnel the whole type table through one task
    nt = c2.agg(F.count(F.lit(1)).alias("nt"))
    return (
        c2.join(F.broadcast(left), "w1")
        .join(F.broadcast(cont), "w2")
        .transform(scalars(nt))
        .select("w1", "w2", "c", round_eps(p_kn, 6).alias("p_kn"))
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(KN_TOP)
    )
