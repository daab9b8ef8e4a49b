"""Eighty-second sweep (SURVEY.md §2 B150-B151, C157).

Grubbs' maximum-outlier test (WHICH day is the single most extreme,
and is it statistically extreme — the one-point follow-up to B110's
threshold flags), the Hill tail-index estimator (the order-statistics
power-law exponent that B126's Zipf log-log regression approximates
from binned counts), and the prompt-prefix cache-hit-rate audit (what
fraction of documents repeat another document's opening tokens — the
serving-side prefix-cache economics of a corpus, and the head-anchored
complement of C155's anywhere-chunk dedup rate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B150

_B150_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY o_orderdate
),
suff AS (
  SELECT d, v,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(CAST(v AS HUGEINT)) OVER () AS HUGEINT) AS s1,
         CAST(SUM(CAST(v AS HUGEINT) * v) OVER () AS HUGEINT) AS s2
  FROM daily
),
dev AS (
  SELECT d, v, n,
         ABS(v - CAST(s1 AS DOUBLE) / n) AS adev,
         sqrt((n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
              / ((n * 1.0) * (n - 1))) AS sd,
         CAST(s1 AS DOUBLE) / n AS mu
  FROM suff
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY adev DESC, d) AS rk FROM dev
)
SELECT n AS n_days,
       strftime(d, '%Y-%m-%d') AS peak_day,
       {sql_round('v / 100.0', 2)} AS peak_revenue,
       {sql_round('mu / 100.0', 4)} AS mean_revenue,
       {sql_round('sd / 100.0', 4)} AS sd_revenue,
       {sql_round('adev / sd', 6)} AS g_stat
FROM ranked WHERE rk = 1
"""


@register("grubbs_test", oracle=_B150_ORACLE)
def grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' test statistic G = max|x - mean| / s over the daily
    revenue series, reporting the single most extreme day — the
    point-identification follow-up to B110's weekly anomaly FLAGS
    (which day, exactly how many sigmas) and the formal version of
    "is this spike real".

    Exactness: the |days|-frame sufficient statistics accumulate as
    128-bit integers (cents and cents-squared — decimal(38,0) /
    HUGEINT, llm_plans70's recipe); per-day deviations and G are
    identical IEEE shapes; the argmax day uses a deterministic
    (deviation desc, day) tiebreak.

    Scale shape: fact collapses to the bounded |days| frame once;
    window sums and the top-1 rank all run at dimension scale.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("v")
        )
    )
    w_all = Window.partitionBy()
    suff = daily.select(
        "d",
        "v",
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)"))
        .over(w_all)
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v"))
        .over(w_all)
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    sd = F.sqrt(
        (
            n * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
        )
        / ((n * 1.0) * (n - 1))
    )
    dev = suff.select(
        "d",
        "v",
        "n",
        F.abs(F.col("v") - mu).alias("adev"),
        sd.alias("sd"),
        mu.alias("mu"),
    )
    ranked = dev.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("adev").desc(), F.col("d"))),
    ).where(F.col("rk") == 1)
    return ranked.select(
        F.col("n").alias("n_days"),
        F.date_format(F.col("d"), "yyyy-MM-dd").alias("peak_day"),
        round_eps(F.col("v") / 100.0, 2).alias("peak_revenue"),
        round_eps(F.col("mu") / 100.0, 4).alias("mean_revenue"),
        round_eps(F.col("sd") / 100.0, 4).alias("sd_revenue"),
        round_eps(F.col("adev") / F.col("sd"), 6).alias("g_stat"),
    )


# ---------------------------------------------------------------- B151

HILL_K = 100

_B151_ORACLE = f"""
WITH vals AS (
  SELECT CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
),
ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC) AS rk FROM vals
),
red AS (
  SELECT SUM(CASE WHEN rk <= {HILL_K} THEN ln(x * 1.0) ELSE 0.0 END)
           AS sum_ln_top,
         MAX(CASE WHEN rk = {HILL_K} + 1 THEN x END) AS x_k1
  FROM ranked WHERE rk <= {HILL_K} + 1
)
SELECT {HILL_K} AS k,
       {sql_round('x_k1 / 100.0', 2)} AS threshold_value,
       {sql_round(
           f'{HILL_K} / (sum_ln_top - {HILL_K} * ln(x_k1 * 1.0))', 6)}
         AS hill_alpha,
       {sql_round(
           f'1.0 + {HILL_K} / (sum_ln_top - {HILL_K} * ln(x_k1 * 1.0))',
           6)} AS implied_zipf_exponent
FROM red
"""


@register("hill_tail_index", oracle=_B151_ORACLE)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the upper-tail power-law index over order
    values: alpha = k / sum(ln(x_i / x_(k+1))) on the top-k order
    statistics — the maximum-likelihood tail exponent that B126's
    Zipf log-log regression only approximates from binned ranks, and
    the number that says whether revenue concentration (B81's Gini)
    comes from a genuinely heavy tail.

    Exactness: order statistics on exact cent integers with a global
    descending rank (ties share the same value so the k-boundary is
    value-stable); the log-sum runs over exactly k rows in both
    engines with identical IEEE shapes.

    Scale shape: the global rank is top-(k+1) selection —
    TakeOrdered at scale, not a full sort (only k+1 rows survive
    the filter); the reduction is one row.
    """
    vals = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint").alias("x")
    )
    ranked = vals.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("x").desc()))
    ).where(F.col("rk") <= HILL_K + 1)
    red = ranked.agg(
        F.sum(
            F.when(F.col("rk") <= HILL_K, F.log(F.col("x") * 1.0)).otherwise(
                0.0
            )
        ).alias("sum_ln_top"),
        F.max(F.when(F.col("rk") == HILL_K + 1, F.col("x"))).alias("x_k1"),
    )
    alpha = HILL_K / (
        F.col("sum_ln_top") - HILL_K * F.log(F.col("x_k1") * 1.0)
    )
    return red.select(
        F.lit(HILL_K).cast("int").alias("k"),
        round_eps(F.col("x_k1") / 100.0, 2).alias("threshold_value"),
        round_eps(alpha, 6).alias("hill_alpha"),
        round_eps(1.0 + alpha, 6).alias("implied_zipf_exponent"),
    )


# ---------------------------------------------------------------- C157

PREFIX_K = 64

_C157_ORACLE = f"""
WITH pre AS (
  SELECT source,
         {sql_hash64(
             "array_to_string(t[1:" + str(PREFIX_K) + "], ' ')")} AS ph
  FROM (SELECT source, string_split_regex(lower(text), '\\s+') AS t
        FROM documents)
),
grp AS (
  SELECT source, ph, CAST(COUNT(*) AS BIGINT) AS c
  FROM pre GROUP BY source, ph
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS distinct_prefixes,
       CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
         AS docs_in_shared_prefix,
       {sql_round('(SUM(c) - COUNT(*)) * 1.0 / SUM(c)', 6)}
         AS cache_hit_rate
FROM grp GROUP BY source ORDER BY source
"""


@register("prefix_cache_hit_rate", oracle=_C157_ORACLE)
def prefix_cache_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt-prefix cache economics per source: hash each document's
    first {PREFIX_K} tokens (shorter docs use their full text) and
    report how many documents repeat another's opening — distinct
    prefixes, documents inside shared-prefix groups, and the implied
    cache hit rate (1 - distinct/docs: every repeat after a group's
    first is a hit). The head-anchored complement of C155's
    anywhere-chunk dedup: serving caches and template detectors both
    key on OPENINGS, which whole-doc and sliding dedup dilute.
    Grouping is within-source (the per-tenant cache model).

    Scale shape: the prefix hash is one map-side slice + hash (no
    explode — document grain in, document grain out); one shuffle to
    (source, prefix) grain; the report is a |sources|-row second
    aggregate.
    """
    pre = load_table(spark, sf_dir, "documents").select(
        "source",
        hash64(
            F.array_join(
                F.slice(F.split(F.lower(F.col("text")), r"\s+"), 1, PREFIX_K),
                " ",
            )
        ).alias("ph"),
    )
    grp = pre.groupBy("source", "ph").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        grp.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_prefixes"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("docs_in_shared_prefix"),
            round_eps(
                (F.sum("c") - F.count(F.lit(1))) * 1.0 / F.sum("c"), 6
            ).alias("cache_hit_rate"),
        )
        .orderBy("source")
    )
