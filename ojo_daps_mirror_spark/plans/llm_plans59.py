"""Fifty-ninth sweep (SURVEY.md §2 B112-B113, C126).

ROC curve + exact tie-corrected AUC for the propensity stub (the
ranking-quality eval that completes the B110 calibration / B64 lift /
B91 rank-test family), rolling-origin forecast backtesting (the eval
harness for B49/B57/B96's forecasters), and a Zipf rank-frequency
power-law fit (the corpus-statistics twin of C106's Heaps' law).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B112

ROC_STEP = 5000  # cent-score thresholds at 0, 5000, ..., 45000

_B112_ORACLE = f"""
WITH scored AS (
  SELECT CAST(ROUND(value * 100 + 1e-9) AS BIGINT) AS s5,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS BIGINT) AS y
  FROM events
),
by_score AS (
  SELECT s5, CAST(SUM(y) AS BIGINT) AS pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
  FROM scored GROUP BY s5
),
ranked AS (
  SELECT s5, pos, neg,
         2 * COALESCE(SUM(pos + neg) OVER (ORDER BY s5
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (pos + neg) + 1 AS rank2
  FROM by_score
),
tot AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(neg) AS BIGINT) AS n_neg,
         CAST(SUM(pos * rank2) AS BIGINT) AS pos_rank2
  FROM ranked
),
bins AS (
  SELECT LEAST(s5 // {ROC_STEP}, 9) AS k, CAST(SUM(pos) AS BIGINT) AS pos,
         CAST(SUM(neg) AS BIGINT) AS neg
  FROM by_score GROUP BY 1
),
pts AS (
  SELECT k, CAST(k * {ROC_STEP} AS BIGINT) AS threshold,
         CAST(SUM(pos) OVER (ORDER BY k DESC) AS BIGINT) AS tp,
         CAST(SUM(neg) OVER (ORDER BY k DESC) AS BIGINT) AS fp
  FROM bins
)
SELECT pts.k, pts.threshold,
       {sql_round('pts.tp * 1.0 / tot.n_pos', 6)} AS tpr,
       {sql_round('pts.fp * 1.0 / tot.n_neg', 6)} AS fpr,
       {sql_round(
           '(tot.pos_rank2 - tot.n_pos * (tot.n_pos + 1))'
           ' * 1.0 / (2.0 * tot.n_pos * tot.n_neg)', 6)} AS auc
FROM pts CROSS JOIN tot ORDER BY pts.k
"""


@register("roc_auc_points", oracle=_B112_ORACLE)
def roc_auc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC curve (TPR/FPR at 10 score thresholds) plus the EXACT
    tie-corrected AUC via the rank-sum identity
    AUC = (Σ_pos rank − n₊(n₊+1)/2)/(n₊·n₋) — completing the
    model-eval family: B64 ranks (lift), B110 calibrates, B91 tests;
    this is the threshold-free discrimination number plus the curve
    you pick an operating point from. Scored at event grain (score =
    value in exact cents, label = purchase); the testdata's value is
    independent of type, so the CORRECT output is a near-diagonal
    curve and AUC ≈ 0.5 — the harness must report uninformative
    scores as uninformative.

    Scale shape: events collapse to DISTINCT-SCORE grain in one
    aggregate (bounded by cent quantisation, not corpus size):
    average ranks as integer rank2 = 2·cum_before + count + 1 via one
    ordered window, AUC from exact BIGINT sufficient statistics, the
    10 ROC points by a descending cumulative over score bins. The
    1-row totals attach as a broadcast scalar.
    """
    scored = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100 + 1e-9).cast("bigint").alias("s5"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .cast("bigint")
        .alias("y"),
    )
    by_score = scored.groupBy("s5").agg(
        F.sum("y").cast("bigint").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("neg"),
    )
    by_score = by_score.persist()
    w = (
        Window.orderBy("s5")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = by_score.withColumn(
        "rank2",
        2 * F.coalesce(F.sum(F.col("pos") + F.col("neg")).over(w), F.lit(0))
        + (F.col("pos") + F.col("neg"))
        + 1,
    )
    tot = ranked.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        F.sum(F.col("pos") * F.col("rank2")).cast("bigint").alias("pos_rank2"),
    )
    bins = by_score.groupBy(
        F.least(F.floor(F.col("s5") / ROC_STEP).cast("bigint"), F.lit(9)).alias(
            "k"
        )
    ).agg(
        F.sum("pos").cast("bigint").alias("pos"),
        F.sum("neg").cast("bigint").alias("neg"),
    )
    wd = Window.orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    pts = bins.select(
        "k",
        (F.col("k") * ROC_STEP).cast("bigint").alias("threshold"),
        F.sum("pos").over(wd).cast("bigint").alias("tp"),
        F.sum("neg").over(wd).cast("bigint").alias("fp"),
    )
    return (
        pts.transform(scalars(tot))
        .select(
            "k",
            "threshold",
            round_eps(F.col("tp") * 1.0 / F.col("n_pos"), 6).alias("tpr"),
            round_eps(F.col("fp") * 1.0 / F.col("n_neg"), 6).alias("fpr"),
            round_eps(
                (F.col("pos_rank2") - F.col("n_pos") * (F.col("n_pos") + 1))
                * 1.0
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                6,
            ).alias("auc"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------- B113

BT_ORIGINS = 8  # evaluate the last 8 weeks as forecast origins
BT_HORIZON = 2

_B113_ORACLE = f"""
WITH weekly AS (
  SELECT DATE_TRUNC('week', o_orderdate) AS wk,
         CAST(COUNT(*) AS BIGINT) AS vol
  FROM orders GROUP BY 1
),
idx AS (
  SELECT wk, vol, ROW_NUMBER() OVER (ORDER BY wk) AS i,
         COUNT(*) OVER () AS n
  FROM weekly
),
origins AS (
  SELECT i AS o, vol AS last_vol,
         vol + (vol - FIRST_VALUE(vol) OVER (ORDER BY i)) * 1.0 / (i - 1)
           AS drift1,
         n
  FROM idx
  WHERE i >= n - {BT_ORIGINS + BT_HORIZON - 1} AND i <= n - 1
),
evals AS (
  SELECT h.h, a.vol AS actual, og.last_vol AS naive_pred,
         og.last_vol + (og.drift1 - og.last_vol) * h.h AS drift_pred
  FROM origins og
  CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, {BT_HORIZON})) AS h) h
  JOIN idx a ON a.i = og.o + h.h
)
SELECT h AS horizon,
       CAST(COUNT(*) AS BIGINT) AS n_evals,
       {sql_round('AVG(ABS(actual - naive_pred))', 6)} AS naive_mae,
       {sql_round('AVG(ABS(actual - drift_pred))', 6)} AS drift_mae,
       {sql_round('AVG(ABS(actual - naive_pred) * 1.0 / actual)', 6)}
         AS naive_mape,
       {sql_round('AVG(ABS(actual - drift_pred) * 1.0 / actual)', 6)}
         AS drift_mape
FROM evals GROUP BY h ORDER BY h
"""


@register("rolling_origin_backtest", oracle=_B113_ORACLE)
def rolling_origin_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (walk-forward) backtest of two baseline
    forecasters on weekly order volume: from each of the last 8
    origin weeks, forecast 1..2 weeks ahead with naive (last value)
    and drift (last + h·mean historical increment), then score MAE
    and MAPE per horizon against actuals. The evaluation harness the
    B49/B57/B96 forecasters plug into — a forecaster claim without a
    walk-forward backtest is untestable.

    Scale shape: the fact table collapses to |weeks| rows in ONE
    aggregate; origins, horizons and error scoring are all
    dimension-scale window/join work on that tiny frame (horizon
    fan-out is a 2-element explode). At 100 TB only the first
    aggregate touches data volume.
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("wk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("vol"))
    )
    wi = Window.orderBy("wk")
    idx = weekly.select(
        "wk",
        "vol",
        F.row_number().over(wi).alias("i"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    idx = idx.persist()
    origins = idx.where(
        (F.col("i") >= F.col("n") - (BT_ORIGINS + BT_HORIZON - 1))
        & (F.col("i") <= F.col("n") - 1)
    ).select(
        F.col("i").alias("o"),
        F.col("vol").alias("last_vol"),
        (
            F.col("vol")
            + (F.col("vol") - F.first("vol").over(wi))
            * 1.0
            / (F.col("i") - 1)
        ).alias("drift1"),
    )
    horizons = F.explode(
        F.sequence(F.lit(1), F.lit(BT_HORIZON))
    ).alias("h")
    evals = (
        origins.select("o", "last_vol", "drift1", horizons)
        .join(
            idx.select(F.col("i").alias("ai"), F.col("vol").alias("actual")),
            F.col("ai") == F.col("o") + F.col("h"),
        )
        .select(
            "h",
            "actual",
            F.col("last_vol").alias("naive_pred"),
            (
                F.col("last_vol")
                + (F.col("drift1") - F.col("last_vol")) * F.col("h")
            ).alias("drift_pred"),
        )
    )
    return (
        evals.groupBy(F.col("h").alias("horizon"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_evals"),
            round_eps(
                F.avg(F.abs(F.col("actual") - F.col("naive_pred"))), 6
            ).alias("naive_mae"),
            round_eps(
                F.avg(F.abs(F.col("actual") - F.col("drift_pred"))), 6
            ).alias("drift_mae"),
            round_eps(
                F.avg(
                    F.abs(F.col("actual") - F.col("naive_pred"))
                    * 1.0
                    / F.col("actual")
                ),
                6,
            ).alias("naive_mape"),
            round_eps(
                F.avg(
                    F.abs(F.col("actual") - F.col("drift_pred"))
                    * 1.0
                    / F.col("actual")
                ),
                6,
            ).alias("drift_mape"),
        )
        .orderBy("horizon")
    )


# ---------------------------------------------------------------- C126

ZIPF_TOP = 100

_C126_ORACLE = f"""
WITH toks AS (
  SELECT UNNEST(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE tok <> '' GROUP BY tok
),
ranked AS (
  SELECT ln(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok)) AS x,
         ln(cnt) AS y
  FROM freq
  QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) <= {ZIPF_TOP}
),
suff AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_tokens,
       {sql_round('(n * sxy - sx * sy) / (n * sxx - sx * sx)', 6)} AS slope,
       {sql_round('(sy - sx * (n * sxy - sx * sy) / (n * sxx - sx * sx)) / n',
                  6)} AS intercept,
       {sql_round(
           '(n * sxy - sx * sy) * (n * sxy - sx * sy)'
           ' / ((n * sxx - sx * sx) * (n * syy - sy * sy))', 6)} AS r2
FROM suff
"""


@register("zipf_slope_fit", oracle=_C126_ORACLE)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit over the corpus token distribution: OLS of
    ln(freq) on ln(rank) for the top-100 tokens (deterministic
    count-then-token tie-break), reporting slope (Zipf exponent ≈ −1
    for natural language), intercept and R². The rank-frequency twin
    of C106's Heaps' law — together they characterise whether a
    corpus (or a filtered subset) still looks like natural language,
    a standard data-quality signal for training corpora.

    Scale shape: one token-grain aggregate is the only
    volume-bound shuffle; the ranked top-100 and the 6-number OLS
    sufficient-statistics fold are dimension-scale. The global
    ORDER BY lives on the |vocab| frame, not the token stream.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
        )
        .where(F.col("tok") != "")
    )
    freq = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wr = Window.orderBy(F.col("cnt").desc(), F.col("tok"))
    ranked = (
        freq.withColumn("r", F.row_number().over(wr))
        .where(F.col("r") <= ZIPF_TOP)
        .select(
            F.log(F.col("r")).alias("x"), F.log(F.col("cnt")).alias("y")
        )
    )
    suff = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return suff.select(
        F.col("n").cast("bigint").alias("n_tokens"),
        round_eps(slope, 6).alias("slope"),
        round_eps((F.col("sy") - F.col("sx") * slope) / F.col("n"), 6).alias(
            "intercept"
        ),
        round_eps(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
    )
