"""Thirtieth sweep (SURVEY.md §2 B63–B65).

Experimentation depth (CUPED variance reduction, model lift/gains
table) and robust-statistics outlier detection — the remaining
analytics shapes an experimentation/ML-eval platform runs daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.attach import scalars
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- B63

CUPED_CUTOFF = "2024-01-16"  # pre-period = first half of the event span

_B63_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         CASE WHEN {sql_hash64("user_id::VARCHAR || ':ab'")} % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         SUM(CASE WHEN ts <  TIMESTAMP '{CUPED_CUTOFF}' THEN value ELSE 0 END) AS x,
         SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_CUTOFF}' THEN value ELSE 0 END) AS y
  FROM events GROUP BY user_id
),
gl AS (
  SELECT COVAR_POP(x, y) / VAR_POP(x) AS theta, AVG(x) AS xbar FROM users
),
adj AS (
  SELECT variant, y, y - gl.theta * (x - gl.xbar) AS y_cuped
  FROM users CROSS JOIN gl
)
SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
       {sql_round('AVG(y)', 4)} AS mean_post,
       {sql_round('AVG(y_cuped)', 4)} AS mean_cuped,
       {sql_round('(SELECT theta FROM gl)', 6)} AS theta
FROM adj GROUP BY variant
ORDER BY variant
"""


@register("cuped_adjusted_ab", oracle=_B63_ORACLE)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13): per-user
    pre-period covariate X (spend before the cutoff) adjusts the
    post-period metric Y by theta = cov(X,Y)/var(X), shrinking arm
    variance without biasing the delta — the standard trick for
    making A/B tests converge faster.

    One user-grain aggregate builds (X, Y); theta/x̄ reduce to a
    1-row frame (Spark's covar_pop/var_pop partial-aggregate
    map-side) that joins back by broadcast — the user frame shuffles
    exactly once at 100 TB, and arms reduce from user grain, not
    event grain.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    cut = F.lit(CUPED_CUTOFF).cast("timestamp")
    variant = F.when(
        hash64(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))) % 2 == 0,
        "A",
    ).otherwise("B")
    users = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias("x"),
            F.sum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)).alias("y"),
        )
        .select(variant.alias("variant"), "x", "y")
    )
    glob = users.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("theta"),
        F.avg("x").alias("xbar"),
    )
    adj = users.transform(scalars(glob)).select(
        "variant",
        "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))).alias("y_cuped"),
        "theta",
    )
    return (
        adj.groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_eps(F.avg("y"), 4).alias("mean_post"),
            round_eps(F.avg("y_cuped"), 4).alias("mean_cuped"),
            round_eps(F.first("theta"), 6).alias("theta"),
        )
    )


# ---------------------------------------------------------------- B64

LIFT_DECILES = 10

_B64_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         ({sql_hash64("user_id::VARCHAR || ':score'")} % 100000) / 100000.0 AS score,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT converted,
         NTILE({LIFT_DECILES}) OVER (ORDER BY score DESC, user_id) AS decile
  FROM users
),
per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conversions
  FROM ranked GROUP BY decile
),
tot AS (SELECT SUM(conversions) AS tc FROM per)
SELECT decile, n, conversions,
       {sql_round('conversions * 1.0 / n', 6)} AS rate,
       {sql_round('SUM(conversions) OVER (ORDER BY decile) * 1.0 '
                  '/ (SELECT tc FROM tot)', 6)} AS cum_capture
FROM per
ORDER BY decile
"""


@register("lift_table", oracle=_B64_ORACLE)
def lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model lift / gains table: users bucketed into score deciles
    (highest first), per-decile conversion rate and cumulative
    capture — the standard offline eval for a propensity model. The
    score is the deterministic md5 stand-in the engine uses for every
    external-model stub.

    NTILE needs a total order; at test SFs that is one sort of the
    user-grain frame. At 100 TB the decile boundaries come from
    approx quantiles of the score and bucketing becomes a map
    expression (executable via SPARK_GRAFT_SCALE_MODE=approx,
    scale_mode.bucket_by_cuts) — the same swap documented for
    weekly_salary_spread.
    The decile frame itself is {LIFT_DECILES} rows, so the cumulative
    window is trivially single-partition.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    score = (
        hash64(F.concat(F.col("user_id").cast("string"), F.lit(":score"))) % 100000
    ) / 100000.0
    users = (
        ev.groupBy("user_id")
        .agg(F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"))
        .select("user_id", score.alias("score"), "converted")
    )
    if sm.is_approx():
        # decile boundaries from one percentile_approx sketch, bucket
        # assignment map-side — no global sort
        ranked = sm.bucket_by_cuts(
            users, "score", LIFT_DECILES, "decile", descending=True
        ).select("converted", "decile")
    else:
        ranked = users.select(
            "converted",
            F.ntile(LIFT_DECILES)
            .over(Window.orderBy(F.col("score").desc(), F.col("user_id")))
            .alias("decile"),
        )
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("bigint").alias("conversions"),
    )
    tot = per.agg(F.sum("conversions").alias("tc"))
    cum = F.sum("conversions").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per.transform(scalars(tot))
        .select(
            "decile",
            "n",
            "conversions",
            round_eps(F.col("conversions") / F.col("n"), 6).alias("rate"),
            round_eps(cum / F.col("tc"), 6).alias("cum_capture"),
        )
    )


# ---------------------------------------------------------------- B65

MAD_K = 1.4826  # consistency constant for normal data
MAD_SIGMA = 3.0

_B65_ORACLE = f"""
WITH med AS (
  SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, QUANTILE_CONT(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {sql_round('ANY_VALUE(d.med)', 6)} AS median_value,
       {sql_round('ANY_VALUE(m.mad)', 6)} AS mad,
       CAST(SUM(CASE WHEN ABS(d.value - d.med)
                          > {MAD_SIGMA!r} * {MAD_K!r} * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


@register("mad_outliers", oracle=_B65_ORACLE)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection per event type —
    the robust alternative to z-scores when the metric is
    heavy-tailed (weekly_anomaly_flags' rolling z-score cousin).

    Two grouped exact-percentile aggregates (group count is tiny: one
    row per event type) with the per-group medians broadcast back
    onto the fact — the fact scans twice but never shuffles at fact
    grain. At 100 TB both medians swap to approx_percentile (executable
    via SPARK_GRAFT_SCALE_MODE=approx, scale_mode.py) and the second
    scan folds into the first via a two-pass-free sketch; exact
    percentile is the default for oracle parity, as documented for
    weekly_salary_spread.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        sm.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        sm.percentile("adev", 0.5).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_eps(F.any_value("med"), 6).alias("median_value"),
            round_eps(F.any_value("mad"), 6).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > MAD_SIGMA * MAD_K * F.col("mad")
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )
