"""Twenty-second sweep (SURVEY.md §2 B55–B57).

The regression/statistics aggregate surface: per-group OLS fits, a
numeric correlation matrix, and a linear trend forecast — all built-in
JVM aggregates (regr_*/corr), no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..operators.snapshot import monday_of
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B55

_B55_ORACLE = f"""
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_round('regr_slope(l_extendedprice, l_quantity)', 4)} AS slope,
       {sql_round('regr_intercept(l_extendedprice, l_quantity)', 4)}
         AS intercept,
       {sql_round('regr_r2(l_extendedprice, l_quantity)', 6)} AS r2
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


@register("per_group_regression", oracle=_B55_ORACLE)
def per_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One OLS fit PER GROUP (price ~ quantity within each brand) — the
    fit-a-model-per-segment pattern, expressed entirely with the
    built-in regr_slope / regr_intercept / regr_r2 aggregates: the
    sufficient statistics (Σx, Σy, Σxy, Σx², n) are map-side-combined
    like any sum, so a million-group fit is ONE shuffle of 5 doubles
    per group — no applyInPandas, no per-group pandas fit, no Python.
    (applyInPandas remains the escape hatch for models OLS can't
    express; for linear fits the aggregate form beats it outright.)
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_eps(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
                "slope"
            ),
            round_eps(
                F.regr_intercept("l_extendedprice", "l_quantity"), 4
            ).alias("intercept"),
            round_eps(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------- B56

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    cells = []
    for a in _CORR_COLS:
        for b in _CORR_COLS:
            if a < b:
                cells.append(
                    f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                    f"{sql_round(f'corr({a}, {b})', 6)} AS pearson FROM lineitem"
                )
    return " UNION ALL ".join(cells) + " ORDER BY col_a, col_b"


@register("correlation_matrix", oracle=_corr_oracle())
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over the numeric lineitem columns —
    the EDA staple. All C(4,2) coefficients come from ONE aggregation
    pass (each corr is a mergeable 5-number sketch; Catalyst evaluates
    them side by side in a single map-side-combined aggregate), then
    the 6 cells unpivot map-side. The oracle's UNION ALL of per-pair
    aggregates is the semantic spec; the Spark plan must still scan
    lineitem exactly once.
    """
    li = load_table(spark, sf_dir, "lineitem").select(*_CORR_COLS)
    aggs = []
    names = []
    for a in _CORR_COLS:
        for b in _CORR_COLS:
            if a < b:
                names.append((a, b))
                aggs.append(round_eps(F.corr(a, b), 6).alias(f"c_{a}_{b}"))
    wide = li.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"c_{a}_{b}").alias("pearson"),
            )
            for a, b in names
        ]
    )
    return (
        wide.select(F.explode(cells).alias("x"))
        .select("x.col_a", "x.col_b", "x.pearson")
        .orderBy("col_a", "col_b")
    )


# ---------------------------------------------------------------- B57

FORECAST_WEEKS = 4

_B57_ORACLE = f"""
WITH weekly AS (
  SELECT date_trunc('week', o_orderdate)::DATE AS week, COUNT(*) AS n
  FROM orders GROUP BY 1
),
indexed AS (
  SELECT week, n,
         CAST(row_number() OVER (ORDER BY week) AS DOUBLE) AS wx
  FROM weekly
),
fit AS (
  SELECT regr_slope(n, wx) AS slope, regr_intercept(n, wx) AS icept,
         MAX(wx) AS last_wx, MAX(week) AS last_week
  FROM indexed
)
SELECT CAST(h AS BIGINT) AS horizon,
       strftime(last_week + to_days((7 * h)::INT), '%Y-%m-%d') AS week,
       {sql_round('icept + slope * (last_wx + h)', 4)} AS forecast
FROM fit, unnest(generate_series(1, {FORECAST_WEEKS})) AS t(h)
ORDER BY horizon
"""


@register("linear_trend_forecast", oracle=_B57_ORACLE)
def linear_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{FORECAST_WEEKS}-week linear extrapolation of the weekly order
    series: fit volume ~ week_index with the regr_* aggregates, then
    project the next {FORECAST_WEEKS} Mondays — the capacity-planning
    baseline every monitoring stack wants next to its anomaly flags.

    The corpus reduces to |weeks| rows in one aggregate; the fit is a
    second 1-row aggregate; the horizon table explodes map-side from
    that single row. Nothing re-scans the fact side.
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(monday_of(F.col("o_orderdate")).alias("week"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql.window import Window

    indexed = weekly.withColumn(
        "wx", F.row_number().over(Window.orderBy("week")).cast("double")
    )
    fit = indexed.agg(
        F.regr_slope("n", "wx").alias("slope"),
        F.regr_intercept("n", "wx").alias("icept"),
        F.max("wx").alias("last_wx"),
        F.max("week").alias("last_week"),
    )
    horizons = F.sequence(F.lit(1), F.lit(FORECAST_WEEKS))
    return (
        fit.select(
            F.explode(horizons).alias("h"), "slope", "icept", "last_wx", "last_week"
        )
        .select(
            F.col("h").cast("bigint").alias("horizon"),
            F.date_format(
                F.date_add(F.col("last_week"), F.col("h") * 7), "yyyy-MM-dd"
            ).alias("week"),
            round_eps(
                F.col("icept") + F.col("slope") * (F.col("last_wx") + F.col("h")),
                4,
            ).alias("forecast"),
        )
        .orderBy("horizon")
    )
