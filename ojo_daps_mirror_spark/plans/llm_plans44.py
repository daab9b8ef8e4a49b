"""Forty-fourth sweep (SURVEY.md §2 B91-B93).

Nonparametric statistics block completing B80's KS test: the
Mann-Whitney U rank-sum test (tie-corrected), the Theil-Sen robust
trend estimator (median-of-pairwise-slopes), and the lag correlogram
(per-lag Pearson autocorrelation) of the weekly order series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.snapshot import monday_of
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B91

MWU_ARM_A = "click"
MWU_ARM_B = "purchase"

_B91_ORACLE = f"""
WITH samp AS (
  SELECT event_type AS arm,
         CAST(ROUND(value * 10000) AS BIGINT) AS v4
  FROM events WHERE event_type IN ('{MWU_ARM_A}', '{MWU_ARM_B}')
),
vals AS (
  SELECT v4,
         CAST(SUM(CASE WHEN arm = '{MWU_ARM_A}' THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_a,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM samp GROUP BY v4
),
ranked AS (
  SELECT v4, cnt_a, cnt,
         2 * SUM(cnt) OVER (ORDER BY v4
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + 1 AS rank2,
         cnt * cnt * cnt - cnt AS tie_term
  FROM vals
),
stats AS (
  SELECT CAST(SUM(cnt_a) AS BIGINT) AS n1,
         CAST(SUM(cnt - cnt_a) AS BIGINT) AS n2,
         CAST(SUM(cnt_a * rank2) AS BIGINT) AS r1_2,
         CAST(SUM(tie_term) AS BIGINT) AS ties
  FROM ranked
)
SELECT n1, n2,
       ROUND((r1_2 - n1 * (n1 + 1)) / 2.0, 1) AS u1,
       ROUND(((r1_2 - n1 * (n1 + 1)) / 2.0 - n1 * n2 / 2.0)
         / sqrt((n1 * n2 / 12.0)
             * ((n1 + n2 + 1) - ties * 1.0
                / ((n1 + n2) * (n1 + n2 - 1.0)))), 6) AS z,
       CASE WHEN abs(((r1_2 - n1 * (n1 + 1)) / 2.0 - n1 * n2 / 2.0)
         / sqrt((n1 * n2 / 12.0)
             * ((n1 + n2 + 1) - ties * 1.0
                / ((n1 + n2) * (n1 + n2 - 1.0))))) > 1.96
            THEN 1 ELSE 0 END AS significant
FROM stats
"""


@register("mann_whitney_u", oracle=_B91_ORACLE)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U test between two event arms —
    the nonparametric location test next to B60's z-test (means) and
    B80's KS test (whole distribution): rank-sum on 1e-4-quantised
    values, average ranks for ties, the classic tie-corrected normal
    approximation, no continuity correction.

    Scale shape: the stream collapses to DISTINCT-VALUE grain in one
    map-side-combined aggregate (bounded by the quantised value range,
    independent of corpus size); ranks come from one ordered cumulative
    window over that bounded frame (range-partitioned two-pass cumsum
    is the 100 TB swap, as in B80). Doubled ranks (rank2) and doubled
    rank-sums stay exact BIGINTs until the final z arithmetic, which
    both engines evaluate over identical integers.
    """
    samp = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(MWU_ARM_A, MWU_ARM_B))
        .select(
            F.col("event_type").alias("arm"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v4"),
        )
    )
    vals = samp.groupBy("v4").agg(
        F.sum(F.when(F.col("arm") == MWU_ARM_A, 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_a"),
        F.count(F.lit(1)).alias("cnt"),
    )
    w_cum = Window.orderBy("v4").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = vals.select(
        "cnt_a",
        "cnt",
        (2 * F.sum("cnt").over(w_cum) - F.col("cnt") + 1).alias("rank2"),
        (F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias(
            "tie_term"
        ),
    )
    stats = ranked.agg(
        F.sum("cnt_a").cast("bigint").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("bigint").alias("n2"),
        F.sum(F.col("cnt_a") * F.col("rank2")).cast("bigint").alias("r1_2"),
        F.sum("tie_term").cast("bigint").alias("ties"),
    )
    n1, n2, r1_2, ties = (F.col(c) for c in ("n1", "n2", "r1_2", "ties"))
    u1 = (r1_2 - n1 * (n1 + 1)) / 2.0
    z = (u1 - n1 * n2 / 2.0) / F.sqrt(
        (n1 * n2 / 12.0)
        * ((n1 + n2 + 1) - ties * 1.0 / ((n1 + n2) * (n1 + n2 - 1.0)))
    )
    return stats.select(
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        F.round(z, 6).alias("z"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).alias("significant"),
    )


# ---------------------------------------------------------------- B92

_WEEKLY_SQL = """
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7 AS BIGINT)
           AS x,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
"""

_B92_ORACLE = f"""
WITH weekly AS ({_WEEKLY_SQL}),
pairs AS (
  SELECT (b.n - a.n) * 1.0 / (b.x - a.x) AS slope
  FROM weekly a JOIN weekly b ON a.x < b.x
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         quantile_cont(slope, 0.5) AS slope
  FROM pairs
),
icpt AS (
  SELECT quantile_cont(w.n - m.slope * w.x, 0.5) AS intercept
  FROM weekly w CROSS JOIN m
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM weekly) AS n_weeks,
       m.n_pairs,
       ROUND(m.slope, 6) AS slope,
       ROUND(icpt.intercept, 6) AS intercept
FROM m CROSS JOIN icpt
"""


@register("theil_sen_trend", oracle=_B92_ORACLE)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of weekly order volume: the median of
    all pairwise slopes (and the median-residual intercept) — the
    outlier-resistant complement of B57's least-squares regr_* fit
    (one corrupted week moves OLS, not the pairwise-slope median).

    Scale shape: the fact table reduces to |weeks| integer rows in ONE
    aggregate; the O(|weeks|^2) pair expansion, both exact medians and
    the broadcast of the 1-row slope frame all run at dimension scale
    (a few thousand pairs for decades of weeks). Slopes are ratios of
    exact integers, so both engines interpolate the median over
    identical doubles.
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(monday_of(F.col("o_orderdate")).alias("week"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            (F.datediff("week", F.lit("1970-01-05")) / 7)
            .cast("bigint")
            .alias("x"),
            "n",
        )
    )
    a, b = weekly.alias("a"), weekly.alias("b")
    pairs = a.join(b, F.col("a.x") < F.col("b.x")).select(
        (
            (F.col("b.n") - F.col("a.n")) * 1.0 / (F.col("b.x") - F.col("a.x"))
        ).alias("slope")
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("slope"),
    )
    icpt = (
        weekly.transform(scalars(m))
        .select((F.col("n") - F.col("slope") * F.col("x")).alias("resid"))
        .agg(F.expr("percentile(resid, 0.5)").alias("intercept"))
    )
    n_weeks = weekly.agg(F.count(F.lit(1)).alias("n_weeks"))
    return (
        n_weeks.transform(scalars(m))
        .transform(scalars(icpt))
        .select(
            "n_weeks",
            "n_pairs",
            F.round("slope", 6).alias("slope"),
            F.round("intercept", 6).alias("intercept"),
        )
    )


# ---------------------------------------------------------------- B93

ACF_MAX_LAG = 8

_B93_ORACLE = f"""
WITH weekly AS ({_WEEKLY_SQL}),
pairs AS (
  SELECT b.x - a.x AS lag, a.n AS na, b.n AS nb
  FROM weekly a JOIN weekly b
    ON b.x - a.x BETWEEN 1 AND {ACF_MAX_LAG}
),
suff AS (
  SELECT lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(na) AS BIGINT) AS sa, CAST(SUM(nb) AS BIGINT) AS sb,
         CAST(SUM(na * na) AS BIGINT) AS saa,
         CAST(SUM(nb * nb) AS BIGINT) AS sbb,
         CAST(SUM(na * nb) AS BIGINT) AS sab
  FROM pairs GROUP BY lag
)
SELECT lag, n_pairs,
       ROUND((n_pairs * sab - sa * sb)
         / (sqrt(n_pairs * saa - sa * sa * 1.0)
            * sqrt(n_pairs * sbb - sb * sb * 1.0)), 6) AS acf
FROM suff ORDER BY lag
"""


@register("acf_weekly_volume", oracle=_B93_ORACLE)
def acf_weekly_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag correlogram of weekly order volume: Pearson r between the
    series and its lag-L shift for L=1..{ACF_MAX_LAG}, computed on
    overlapping pairs (the sample cross-correlation variant) — the
    seasonality detector that says WHICH lag B49's decomposition
    should use.

    Scale shape: fact -> |weeks| integer rows in one aggregate; the
    banded self-join fans each week into <= {ACF_MAX_LAG} pairs and
    every per-lag Pearson reduces over EXACT integer sufficient
    statistics (cnt, sums, squares, cross-products) in one combined
    aggregate — both engines then evaluate r from identical integers.
    Nothing beyond the first groupBy touches corpus volume.
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(monday_of(F.col("o_orderdate")).alias("week"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            (F.datediff("week", F.lit("1970-01-05")) / 7)
            .cast("bigint")
            .alias("x"),
            "n",
        )
    )
    a, b = weekly.alias("a"), weekly.alias("b")
    lag = F.col("b.x") - F.col("a.x")
    pairs = a.join(b, (lag >= 1) & (lag <= ACF_MAX_LAG)).select(
        lag.alias("lag"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
    )
    suff = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("na").cast("bigint").alias("sa"),
        F.sum("nb").cast("bigint").alias("sb"),
        F.sum(F.col("na") * F.col("na")).cast("bigint").alias("saa"),
        F.sum(F.col("nb") * F.col("nb")).cast("bigint").alias("sbb"),
        F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("sab"),
    )
    np_, sa, sb, saa, sbb, sab = (
        F.col(c) for c in ("n_pairs", "sa", "sb", "saa", "sbb", "sab")
    )
    r = (np_ * sab - sa * sb) / (
        F.sqrt(np_ * saa - sa * sa * 1.0) * F.sqrt(np_ * sbb - sb * sb * 1.0)
    )
    return suff.select(
        "lag", "n_pairs", F.round(r, 6).alias("acf")
    ).orderBy("lag")
