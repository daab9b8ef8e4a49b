"""Twenty-seventh sweep (SURVEY.md §2 B60–B62).

Experimentation analytics: A/B two-proportion z-test, conversion
latency percentiles, and the period-over-period change table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.snapshot import monday_of
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- B60

_B60_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         CASE WHEN {sql_hash64("user_id::VARCHAR || ':ab'")} % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conversions,
         SUM(converted) * 1.0 / COUNT(*) AS rate
  FROM users GROUP BY variant
),
wide AS (
  SELECT
    MAX(CASE WHEN variant = 'A' THEN n END) AS na,
    MAX(CASE WHEN variant = 'A' THEN conversions END) AS ca,
    MAX(CASE WHEN variant = 'A' THEN rate END) AS ra,
    MAX(CASE WHEN variant = 'B' THEN n END) AS nb,
    MAX(CASE WHEN variant = 'B' THEN conversions END) AS cb,
    MAX(CASE WHEN variant = 'B' THEN rate END) AS rb
  FROM arms
),
stat AS (
  SELECT *,
         CASE WHEN (ca + cb) * 1.0 / (na + nb) IN (0.0, 1.0) THEN 0.0
              ELSE (rb - ra) / sqrt((ca + cb) * 1.0 / (na + nb)
                          * (1 - (ca + cb) * 1.0 / (na + nb))
                          * (1.0 / na + 1.0 / nb)) END AS z
  FROM wide
)
SELECT na, ca, {sql_round('ra', 6)} AS rate_a,
       nb, cb, {sql_round('rb', 6)} AS rate_b,
       {sql_round('rb - ra', 6)} AS lift,
       {sql_round('z', 4)} AS z_stat,
       ABS(z) > 1.96 AS significant_95
FROM stat
"""


@register("ab_test_analysis", oracle=_B60_ORACLE)
def ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between deterministically assigned A/B
    arms (md5 of user_id — the reshard-stable bucketing every
    experimentation platform uses): per-arm user counts, conversion
    (any purchase), pooled z statistic and the 95% significance flag.

    Users reduce to one row each in ONE aggregate (assignment is a map
    expression), arms to 2 rows in a second; the z statistic is pure
    scalar arithmetic on the 1-row pivoted frame. Nothing fact-sized
    shuffles twice.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    variant = F.when(
        hash64(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))) % 2 == 0,
        "A",
    ).otherwise("B")
    users = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "converted"
            )
        )
        .select(variant.alias("variant"), "converted")
    )
    arms = users.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conversions")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("conversions"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("conversions"))).alias("cb"),
    )
    ra = F.col("ca") / F.col("na")
    rb = F.col("cb") / F.col("nb")
    pooled = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    # degenerate arms (everyone or no one converts) have zero pooled
    # variance — define z = 0 rather than divide by zero (ANSI mode)
    z = F.when(pooled.isin(0.0, 1.0), F.lit(0.0)).otherwise(
        (rb - ra)
        / F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    )
    return wide.select(
        "na",
        "ca",
        round_eps(ra, 6).alias("rate_a"),
        "nb",
        "cb",
        round_eps(rb, 6).alias("rate_b"),
        round_eps(rb - ra, 6).alias("lift"),
        round_eps(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


# ---------------------------------------------------------------- B61

_B61_ORACLE = f"""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
  FROM events GROUP BY user_id
),
lat AS (
  SELECT (epoch_us(first_buy) - epoch_us(first_click)) / 3600e6 AS hours
  FROM firsts
  WHERE first_click IS NOT NULL AND first_buy IS NOT NULL
    AND first_buy >= first_click
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       {sql_round('quantile_cont(hours, 0.25)', 4)} AS p25_hours,
       {sql_round('quantile_cont(hours, 0.50)', 4)} AS p50_hours,
       {sql_round('quantile_cont(hours, 0.75)', 4)} AS p75_hours,
       {sql_round('quantile_cont(hours, 0.95)', 4)} AS p95_hours
FROM lat
"""


@register("conversion_latency_quantiles", oracle=_B61_ORACLE)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-click → first-purchase latency distribution (p25/50/75/95
    hours) — the time-to-convert report that complements B21's ordered
    funnel. Users collapse to (first_click, first_buy) in ONE
    conditional-MIN aggregate; the percentile battery is a second
    1-row aggregate over the converted subset (approx_percentile is
    the documented 100 TB swap — executable via
    SPARK_GRAFT_SCALE_MODE=approx, scale_mode.py).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("fc"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fb"),
    )
    lat = firsts.where(
        F.col("fc").isNotNull() & F.col("fb").isNotNull() & (F.col("fb") >= F.col("fc"))
    ).select(
        ((F.unix_micros("fb") - F.unix_micros("fc")) / 3600e6).alias("hours")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        round_eps(sm.percentile("hours", 0.25), 4).alias("p25_hours"),
        round_eps(sm.percentile("hours", 0.50), 4).alias("p50_hours"),
        round_eps(sm.percentile("hours", 0.75), 4).alias("p75_hours"),
        round_eps(sm.percentile("hours", 0.95), 4).alias("p95_hours"),
    )


# ---------------------------------------------------------------- B62

_B62_ORACLE = f"""
WITH weekly AS (
  SELECT date_trunc('week', o_orderdate)::DATE AS week, COUNT(*) AS n
  FROM orders GROUP BY 1
)
SELECT strftime(week, '%Y-%m-%d') AS week, CAST(n AS BIGINT) AS n_orders,
       CAST(COALESCE(lag(n) OVER (ORDER BY week), -1) AS BIGINT) AS prev_week,
       {sql_round(
           'COALESCE((n - lag(n) OVER (ORDER BY week)) * 100.0'
           ' / NULLIF(lag(n) OVER (ORDER BY week), 0), 0.0)', 4)} AS wow_pct
FROM weekly ORDER BY week
"""


@register("period_over_period", oracle=_B62_ORACLE)
def period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week % change of order volume — the dashboard
    headline number. Corpus → |weeks| rows in one aggregate; LAG and
    the change ratio are dimension-scale windows. First week pins to
    0.0 (NULL doubles break cross-engine value comparison).
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(monday_of(F.col("o_orderdate")).alias("week"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("week")
    prev = F.lag("n").over(w)
    return (
        weekly.select(
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            F.col("n").cast("bigint").alias("n_orders"),
            F.coalesce(prev, F.lit(-1)).cast("bigint").alias("prev_week"),
            round_eps(
                F.coalesce(
                    (F.col("n") - prev) * 100.0 / F.nullif(prev, F.lit(0)),
                    F.lit(0.0),
                ),
                4,
            ).alias("wow_pct"),
        )
        .orderBy("week")
    )
