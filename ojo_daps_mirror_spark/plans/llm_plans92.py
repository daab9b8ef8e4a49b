"""Ninety-second sweep (SURVEY.md §2 B170-B171, C167).

Ljung-Box Q (the omnibus "is this series white noise" test that
reads B93's whole correlogram at once instead of eyeballing lags),
arc elasticity of demand by brand-year (the pricing number between
two observed points — what B86's static log-log regression averages
away), and the background-Jaccard null distribution (what similarity
do UNRELATED document pairs have — the calibration floor under
C5/C7's thresholds; a threshold below the null's tail manufactures
duplicates out of topic overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import shingles, sql_shingles, sql_tokens, tokens
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B170

LB_LAGS = 8

_B170_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7 AS BIGINT)
           AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
dev AS (
  SELECT w,
         y - (SUM(y) OVER ()) * 1.0 / (COUNT(*) OVER ()) AS e,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM weekly
),
lagged AS (
  SELECT n, e,
         {", ".join(
             f"LAG(e, {k}) OVER (ORDER BY w) AS e{k}" for k in
             range(1, LB_LAGS + 1))}
  FROM dev
),
red AS (
  SELECT MAX(n) AS n, SUM(e * e) AS s0,
         {", ".join(
             f"SUM(CASE WHEN e{k} IS NULL THEN 0.0 ELSE e * e{k} END)"
             f" AS s{k}" for k in range(1, LB_LAGS + 1))}
  FROM lagged
)
SELECT n AS n_weeks, {LB_LAGS} AS df,
       {sql_round(
           "n * (n + 2.0) * ("
           + " + ".join(
               f"(s{k} / s0) * (s{k} / s0) / (n - {k})"
               for k in range(1, LB_LAGS + 1))
           + ")", 6)} AS q_stat,
       {sql_round(
           "GREATEST(" + ", ".join(
               f"ABS(s{k} / s0)" for k in range(1, LB_LAGS + 1))
           + ")", 6)} AS max_abs_r
FROM red
"""


@register("ljung_box_q", oracle=_B170_ORACLE)
def ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q over lags 1..{LB_LAGS} of the weekly order-volume
    series: Q = n(n+2) sum r_k^2/(n-k), chi2({LB_LAGS}) under white
    noise — the OMNIBUS whiteness test that summarises B93's whole
    correlogram in one number (and the standard residual check after
    any B49/B96-style forecast fit). Also reports the largest
    single autocorrelation.

    Exactness: the mean and deviations are identical IEEE shapes
    over the bounded |weeks| frame; each lag product sum is one
    window + one reduction; the Q algebra is O(1).

    Scale shape: fact collapses to |weeks| rows once; all
    {LB_LAGS} lags come from ONE projection with {LB_LAGS} lag
    windows over that frame and ONE reduction — no per-lag rescans
    (B93's banded join asks per-lag PAIRWISE correlations; the LB
    statistic needs the simpler common-mean form, so lags are
    columns, not joins).
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (
                F.datediff(
                    F.date_trunc("week", F.col("o_orderdate")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    w_all = Window.partitionBy()
    dev = weekly.select(
        "w",
        (
            F.col("y")
            - F.sum("y").over(w_all) * 1.0 / F.count(F.lit(1)).over(w_all)
        ).alias("e"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    w_t = Window.orderBy("w")
    lag_cols = [F.col("e")] + [
        F.lag("e", k).over(w_t).alias(f"e{k}") for k in range(1, LB_LAGS + 1)
    ]
    lagged = dev.select("n", *lag_cols)
    aggs = [F.max("n").alias("n"), F.sum(F.col("e") * F.col("e")).alias("s0")]
    for k in range(1, LB_LAGS + 1):
        aggs.append(
            F.sum(
                F.when(F.col(f"e{k}").isNull(), 0.0).otherwise(
                    F.col("e") * F.col(f"e{k}")
                )
            ).alias(f"s{k}")
        )
    red = lagged.agg(*aggs)
    n = F.col("n")
    q = n * (n + 2.0) * sum(
        (F.col(f"s{k}") / F.col("s0"))
        * (F.col(f"s{k}") / F.col("s0"))
        / (n - k)
        for k in range(1, LB_LAGS + 1)
    )
    max_r = F.greatest(
        *[F.abs(F.col(f"s{k}") / F.col("s0")) for k in range(1, LB_LAGS + 1)]
    )
    return red.select(
        n.alias("n_weeks"),
        F.lit(LB_LAGS).cast("int").alias("df"),
        round_eps(q, 6).alias("q_stat"),
        round_eps(max_r, 6).alias("max_abs_r"),
    )


# ---------------------------------------------------------------- B171

_B171_ORACLE = f"""
WITH by AS (
  SELECT p.p_brand AS brand, CAST(year(l.l_shipdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS r
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
lagged AS (
  SELECT brand, yr, q, r,
         LAG(q) OVER (PARTITION BY brand ORDER BY yr) AS q0,
         LAG(r) OVER (PARTITION BY brand ORDER BY yr) AS r0,
         yr - LAG(yr) OVER (PARTITION BY brand ORDER BY yr) AS gap
  FROM by
),
elastic AS (
  SELECT brand, yr,
         r * 1.0 / q AS p1, r0 * 1.0 / q0 AS p0,
         ((q - q0) * 1.0 / ((q + q0) / 2.0))
           / ((r * 1.0 / q - r0 * 1.0 / q0)
              / ((r * 1.0 / q + r0 * 1.0 / q0) / 2.0)) AS el
  FROM lagged
  WHERE q0 IS NOT NULL AND gap = 1
    AND CAST(r AS HUGEINT) * q0 <> CAST(r0 AS HUGEINT) * q
)
SELECT brand, yr AS year,
       {sql_round('p1 / 100.0', 4)} AS unit_price,
       {sql_round('el', 6)} AS arc_elasticity
FROM elastic ORDER BY brand, yr
"""


@register("arc_elasticity", oracle=_B171_ORACLE)
def arc_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arc (midpoint) price elasticity of demand per brand between
    consecutive ship years: %dQ / %dP with midpoint bases — the
    two-point pricing number a category manager reads, where B86's
    static log-log regression averages all years into one slope.
    Year pairs with unchanged price are excluded by the EXACT
    integer cross-product test r*q0 != r0*q (no double-equality
    trap).

    Exactness: quantities and revenue are exact BIGINTs at
    (brand, year) grain; unit prices and the elasticity are
    identical IEEE shapes; consecutive-year pairing is a lag window
    with an exact gap check.

    Scale shape: one fact aggregate riding the broadcast part join,
    then lag windows over the bounded (brand, year) frame.
    """
    by = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
            F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
            F.round(F.col("l_extendedprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("cents"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("pk"),
                    F.col("p_brand").alias("brand"),
                )
            ),
            "pk",
        )
        .groupBy("brand", "yr")
        .agg(
            F.sum("qty").cast("bigint").alias("q"),
            F.sum("cents").cast("bigint").alias("r"),
        )
    )
    w_b = Window.partitionBy("brand").orderBy("yr")
    lagged = by.select(
        "brand",
        "yr",
        "q",
        "r",
        F.lag("q").over(w_b).alias("q0"),
        F.lag("r").over(w_b).alias("r0"),
        (F.col("yr") - F.lag("yr").over(w_b)).alias("gap"),
    )
    p1 = F.col("r") * 1.0 / F.col("q")
    p0 = F.col("r0") * 1.0 / F.col("q0")
    el = ((F.col("q") - F.col("q0")) * 1.0 / ((F.col("q") + F.col("q0")) / 2.0)) / (
        (p1 - p0) / ((p1 + p0) / 2.0)
    )
    return (
        lagged.where(
            F.col("q0").isNotNull()
            & (F.col("gap") == 1)
            & (
                F.col("r").cast("decimal(38,0)") * F.col("q0")
                != F.col("r0").cast("decimal(38,0)") * F.col("q")
            )
        )
        .select(
            "brand",
            F.col("yr").alias("year"),
            round_eps(p1 / 100.0, 4).alias("unit_price"),
            round_eps(el, 6).alias("arc_elasticity"),
        )
        .orderBy("brand", "year")
    )


# ---------------------------------------------------------------- C167

BJ_SHINGLE_K = 3

_C167_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), BJ_SHINGLE_K)} AS sh
  FROM documents
),
ranked AS (
  SELECT sh, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM docs
),
pairs AS (
  SELECT a.rn AS i,
         len(list_intersect(a.sh, b.sh)) * 1.0
           / len(list_distinct(a.sh || b.sh)) AS jac
  FROM ranked a JOIN ranked b ON b.rn = a.rn + a.n // 2
),
stats AS (
  SELECT jac, ROW_NUMBER() OVER (ORDER BY jac DESC, i) AS rk,
         COUNT(*) OVER () AS np
  FROM pairs
)
SELECT CAST(MAX(np) AS BIGINT) AS n_pairs,
       {sql_round('AVG(jac)', 6)} AS mean_jaccard,
       {sql_round(
           'MAX(CASE WHEN rk = CAST(FLOOR(0.05 * np) + 1 AS BIGINT)'
           ' THEN jac END)', 6)} AS p95_jaccard,
       {sql_round('MAX(jac)', 6)} AS max_jaccard
FROM stats
"""


@register("background_jaccard_null", oracle=_C167_ORACLE)
def background_jaccard_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Background-similarity null distribution: exact 3-shingle
    Jaccard over maximally-separated deterministic document pairs
    (rank i paired with rank i + n/2 — unrelated by construction),
    reporting mean, p95 and max. This is the calibration floor under
    every near-dup threshold here: C5/C7's 0.5 cut is meaningful
    only if the null's upper tail sits well below it — on a
    template-heavy corpus the null creeps up and the same threshold
    starts manufacturing "duplicates" out of shared boilerplate
    (which C121's sensitivity sweep would then misread as real).

    Scale shape: shingling is map-side; the pairing is ONE equi-join
    on a rank key (deterministic, no sampling RNG); the tail
    quantile is an exact order statistic over the |pairs| frame.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", shingles(tokens(F.col("text")), BJ_SHINGLE_K).alias("sh")
    )
    w_all = Window.partitionBy()
    ranked = docs.select(
        "sh",
        F.row_number().over(Window.orderBy("doc_id")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    ranked = ranked.persist()
    a = ranked.select(
        F.col("rn").alias("i"),
        F.col("sh").alias("sh_a"),
        (F.col("rn") + F.floor(F.col("n") / 2)).cast("int").alias("match_rn"),
    )
    b = ranked.select(F.col("rn").alias("match_rn"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, "match_rn").select(
        "i",
        (
            F.size(F.array_intersect("sh_a", "sh_b"))
            * F.lit(1.0)
            / F.size(F.array_union("sh_a", "sh_b"))
        ).alias("jac"),
    )
    stats = pairs.select(
        "jac",
        F.row_number()
        .over(Window.orderBy(F.col("jac").desc(), F.col("i")))
        .alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("np"),
    )
    return stats.agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        round_eps(F.avg("jac"), 6).alias("mean_jaccard"),
        round_eps(
            F.max(
                F.when(
                    F.col("rk")
                    == (F.floor(0.05 * F.col("np")) + 1).cast("bigint"),
                    F.col("jac"),
                )
            ),
            6,
        ).alias("p95_jaccard"),
        round_eps(F.max("jac"), 6).alias("max_jaccard"),
    )
