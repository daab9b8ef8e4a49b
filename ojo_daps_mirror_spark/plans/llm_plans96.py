"""Ninety-sixth sweep (SURVEY.md §2 B178-B179, C171).

Supplier lead-time league table (per-supplier order-to-ship
distribution + SLA breach share — the procurement scorecard), the
chain-ladder run-off triangle (actuarial development factors and
IBNR projection — the cohort-completion estimate that naive
"shipped so far" reporting understates), and the quality-length
confound audit (is C2's quality score secretly a length score — the
metric-validity check before any score-gated filtering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import (
    STOPWORDS,
    sql_stopword_hits,
    sql_tokens,
    stopword_hits,
    tokens,
)
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B178

SLA_DAYS = 90

_B178_ORACLE = f"""
WITH lt AS (
  SELECT l.l_suppkey AS supp,
         datediff('day', o.o_orderdate, l.l_shipdate) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
grp AS (
  SELECT supp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(days) AS BIGINT) AS s1,
         CAST(SUM(CAST(days AS BIGINT) * days) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN days > {SLA_DAYS} THEN 1 ELSE 0 END)
              AS BIGINT) AS breaches
  FROM lt GROUP BY supp
)
SELECT supp AS suppkey, n AS n_lines,
       {sql_round('s1 * 1.0 / n', 4)} AS mean_days,
       {sql_round(
           'sqrt((n * 1.0 * s2 - CAST(s1 AS DOUBLE) * s1)'
           ' / ((n * 1.0) * (n - 1)))', 4)} AS sd_days,
       {sql_round('breaches * 100.0 / n', 4)} AS pct_over_{SLA_DAYS}d
FROM grp ORDER BY suppkey
"""


@register("supplier_leadtime_league", oracle=_B178_ORACLE)
def supplier_leadtime_league(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier lead-time league table: per supplier, the order-to-
    ship day distribution (mean, sd) and the share of lines breaching
    the {SLA_DAYS}-day SLA — the procurement scorecard that B149's
    aggregate W averages away and A32's integrity audit doesn't
    grade. Read the sd column with the mean: two suppliers with the
    same mean and 3x the spread are NOT the same supplier.

    Exactness: day counts are exact integers; per-supplier moment
    sums are exact BIGINTs from one aggregate riding the
    orders-lineitem key join.

    Scale shape: one key-partitioned fact-fact join, one map-side-
    combined aggregate to |suppliers| rows.
    """
    lt = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").alias("supp"),
            F.col("l_shipdate").alias("ship"),
        )
        .join(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("ok"),
                F.col("o_orderdate").alias("od"),
            ),
            "ok",
        )
        .select("supp", F.datediff("ship", "od").alias("days"))
    )
    grp = lt.groupBy("supp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("days").cast("bigint").alias("s1"),
        F.sum(F.col("days").cast("bigint") * F.col("days"))
        .cast("bigint")
        .alias("s2"),
        F.sum(F.when(F.col("days") > SLA_DAYS, 1).otherwise(0))
        .cast("bigint")
        .alias("breaches"),
    )
    n = F.col("n")
    return grp.select(
        F.col("supp").alias("suppkey"),
        n.alias("n_lines"),
        round_eps(F.col("s1") * 1.0 / n, 4).alias("mean_days"),
        round_eps(
            F.sqrt(
                (n * 1.0 * F.col("s2") - F.col("s1").cast("double") * F.col("s1"))
                / ((n * 1.0) * (n - 1))
            ),
            4,
        ).alias("sd_days"),
        round_eps(F.col("breaches") * 100.0 / n, 4).alias(
            f"pct_over_{SLA_DAYS}d"
        ),
    ).orderBy("suppkey")


# ---------------------------------------------------------------- B179

CL_COHORT_YEAR = 1996
CL_VAL_IDX = 1997 * 12 + 6  # valuation month: June 1997
CL_MAX_LAG = 6

_B179_ORACLE = f"""
WITH cells AS (
  SELECT (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS im,
         LEAST((year(l.l_shipdate) * 12 + month(l.l_shipdate))
               - (year(o.o_orderdate) * 12 + month(o.o_orderdate)),
               {CL_MAX_LAG}) AS j,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS x
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE year(o.o_orderdate) = {CL_COHORT_YEAR}
    AND (year(l.l_shipdate) * 12 + month(l.l_shipdate)) <= {CL_VAL_IDX}
  GROUP BY 1, 2
),
cum AS (
  SELECT im, j,
         CAST(SUM(x) OVER (PARTITION BY im ORDER BY j
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS c,
         {CL_VAL_IDX} - im AS max_lag
  FROM cells
),
factors AS (
  SELECT a.j AS from_lag,
         SUM(b.c) * 1.0 / SUM(a.c) AS f
  FROM cum a JOIN cum b ON a.im = b.im AND b.j = a.j + 1
  GROUP BY a.j
),
latest AS (
  SELECT im, c, j FROM (
    SELECT im, c, j,
           ROW_NUMBER() OVER (PARTITION BY im ORDER BY j DESC) AS rk
    FROM cum
  ) WHERE rk = 1
),
projected AS (
  SELECT l.im, l.c AS observed_cum,
         l.c * COALESCE(exp(SUM(ln(f.f))), 1.0) AS ultimate
  FROM latest l
  LEFT JOIN factors f ON f.from_lag >= l.j
  GROUP BY l.im, l.c
)
SELECT im AS cohort_month,
       {sql_round('observed_cum / 100.0', 2)} AS observed_value,
       {sql_round('ultimate / 100.0', 2)} AS ultimate_value,
       {sql_round('(ultimate - observed_cum) / 100.0', 2)} AS ibnr_value
FROM projected ORDER BY im
"""


@register("chain_ladder", oracle=_B179_ORACLE)
def chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder run-off triangle on {CL_COHORT_YEAR} order
    cohorts valued at mid-1997: shipment value develops over
    order-to-ship month lags, volume-weighted age-to-age factors
    f_j = sum C_(i,j+1) / sum C_(i,j) project each cohort's
    still-censored tail to ultimate — the actuarial completion
    estimate (IBNR) that "shipped so far" reporting understates for
    young cohorts; the same censoring problem B72's Kaplan-Meier
    solves for counts, solved here for VALUE.

    Exactness: triangle cells are exact BIGINT cents; cumulation is
    a window per cohort; factors are ratios of exact sums; the
    factor-product tail is exp(sum ln f) — identical shapes both
    engines, COALESCE(..., 1) for fully-developed cohorts.

    Scale shape: one fact-fact key join, one aggregate to the
    <=12 x {CL_MAX_LAG + 1}-cell triangle; factors, latest
    diagonal and projection all run at triangle grain.
    """
    oi = F.year(F.col("od")) * 12 + F.month(F.col("od"))
    si = F.year(F.col("ship")) * 12 + F.month(F.col("ship"))
    cells = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_shipdate").alias("ship"),
            F.round(F.col("l_extendedprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("cents"),
        )
        .join(
            load_table(spark, sf_dir, "orders")
            .where(F.year("o_orderdate") == CL_COHORT_YEAR)
            .select(
                F.col("o_orderkey").alias("ok"),
                F.col("o_orderdate").alias("od"),
            ),
            "ok",
        )
        .where(si <= CL_VAL_IDX)
        .groupBy(
            oi.alias("im"),
            F.least(si - oi, F.lit(CL_MAX_LAG)).alias("j"),
        )
        .agg(F.sum("cents").cast("bigint").alias("x"))
    )
    w_cum = (
        Window.partitionBy("im")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.select(
        "im", "j", F.sum("x").over(w_cum).cast("bigint").alias("c")
    )
    cum = cum.persist()
    a = cum.select(
        F.col("im").alias("ima"), F.col("j").alias("ja"), F.col("c").alias("ca")
    )
    b = cum.select(
        F.col("im").alias("ima"),
        (F.col("j") - 1).alias("ja"),
        F.col("c").alias("cb"),
    )
    factors = (
        a.join(b, ["ima", "ja"])
        .groupBy(F.col("ja").alias("from_lag"))
        .agg((F.sum("cb") * 1.0 / F.sum("ca")).alias("f"))
    )
    latest = (
        cum.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("im").orderBy(F.col("j").desc())
            ),
        )
        .where(F.col("rk") == 1)
        .select("im", "c", "j")
    )
    projected = (
        latest.join(
            F.broadcast(factors), F.col("from_lag") >= F.col("j"), "left"
        )
        .groupBy("im", "c")
        .agg(
            (
                F.col("c")
                * F.coalesce(F.exp(F.sum(F.log(F.col("f")))), F.lit(1.0))
            ).alias("ultimate")
        )
    )
    return projected.select(
        F.col("im").alias("cohort_month"),
        round_eps(F.col("c") / 100.0, 2).alias("observed_value"),
        round_eps(F.col("ultimate") / 100.0, 2).alias("ultimate_value"),
        round_eps((F.col("ultimate") - F.col("c")) / 100.0, 2).alias(
            "ibnr_value"
        ),
    ).orderBy("cohort_month")


# ---------------------------------------------------------------- C171

PUNCT_CLASS_C171 = r"[.,;:!?]"

_C171_ORACLE = f"""
WITH t AS (
  SELECT source, text, {sql_tokens('text')} AS toks FROM documents
),
m AS (
  SELECT source,
         ln(len(toks) * 1.0) AS x,
         0.4 * ({sql_stopword_hits('toks')} * 1.0 / len(toks))
           + 0.3 * least((list_sum(list_transform(toks, s -> length(s)))
                          * 1.0 / len(toks)) / 10.0, 1.0)
           + 0.3 * (1.0 - len(regexp_extract_all(text,
                                                 '{PUNCT_CLASS_C171}'))
                          * 1.0 / length(text)) AS q
  FROM t
),
grp AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(q) AS sq,
         SUM(x * x) AS sxx, SUM(x * q) AS sxq, SUM(q * q) AS sqq
  FROM m GROUP BY source
)
SELECT source, n AS n_docs,
       {sql_round(
           '(n * sxq - sx * sq)'
           ' / sqrt((n * sxx - sx * sx) * (n * sqq - sq * sq))', 6)}
         AS r_quality_length
FROM grp ORDER BY source
"""


@register("quality_length_confound", oracle=_C171_ORACLE)
def quality_length_confound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-validity audit of C2's quality score: the per-source
    Pearson correlation between the score and log document length.
    A strongly positive r means score-gated filtering (C17/C30's
    consumers) is mostly a LENGTH filter in disguise — the confound
    the Gopher/RefinedWeb rule papers warn about — and any
    "quality improved" claim needs length-stratified evidence.
    Recomputes C2's exact score formula inline so the audit tracks
    the scorer verbatim.

    Scale shape: the score and log-length are map-side per-doc
    expressions; one aggregate to per-source sufficient statistics;
    r is O(1) per source. The float sums run per source with
    identical IEEE shapes.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    mean_word_len = (
        F.aggregate(
            F.transform(toks, lambda s: F.length(s)),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        * 1.0
        / F.size(toks)
    )
    stop_ratio = stopword_hits(toks, STOPWORDS) * 1.0 / F.size(toks)
    punct_ratio = (
        F.size(F.expr(f"regexp_extract_all(text, '{PUNCT_CLASS_C171}', 0)"))
        * 1.0
        / F.length(F.col("text"))
    )
    q = (
        0.4 * stop_ratio
        + 0.3 * F.least(mean_word_len / 10.0, F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
    )
    m = docs.select(
        "source",
        F.log(F.size(toks) * 1.0).alias("x"),
        q.alias("q"),
    )
    grp = m.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("q").alias("sq"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("q")).alias("sxq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    n = F.col("n")
    r = (n * F.col("sxq") - F.col("sx") * F.col("sq")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("sqq") - F.col("sq") * F.col("sq"))
    )
    return grp.select(
        "source",
        n.alias("n_docs"),
        round_eps(r, 6).alias("r_quality_length"),
    ).orderBy("source")
