"""Thirty-seventh sweep (SURVEY.md §2 B72–B75).

Survival analysis (Kaplan–Meier product-limit with censoring),
position-based multi-touch attribution, difference-in-differences,
and Neyman optimal stratified-sample allocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B72

KM_HORIZON_D = 30  # censoring horizon (days)

_B72_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
         MAX(ts) AS last_seen
  FROM events GROUP BY user_id
),
with_event AS (
  SELECT u.user_id, u.t0,
         MIN(e.ts) AS t_purchase
  FROM per_user u
  LEFT JOIN events e
    ON e.user_id = u.user_id AND e.event_type = 'purchase' AND e.ts >= u.t0
  WHERE u.t0 IS NOT NULL
  GROUP BY u.user_id, u.t0
),
gmax AS (SELECT MAX(last_seen) AS gm FROM per_user),
obs AS (
  SELECT user_id,
         CASE WHEN t_purchase IS NOT NULL
              THEN CAST(floor(epoch(t_purchase - t0) / 86400) AS BIGINT)
              ELSE least(CAST(floor(epoch((SELECT gm FROM gmax) - t0) / 86400)
                              AS BIGINT), {KM_HORIZON_D}) END AS t,
         CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM with_event
),
daily AS (
  SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
         CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, d, c,
         CAST((SELECT COUNT(*) FROM obs)
           - COALESCE(SUM(d + c) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS n_risk
  FROM daily
),
surv AS (
  SELECT t, n_risk, d, c,
         exp(SUM(ln(CASE WHEN d >= n_risk THEN 1.0
                         ELSE 1.0 - d * 1.0 / n_risk END)) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )) AS s,
         SUM(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS dead
  FROM risk
)
SELECT t, n_risk, d, c,
       CASE WHEN dead > 0 THEN 0.0 ELSE {sql_round('s', 6)} END AS survival
FROM surv ORDER BY t
"""


@register("kaplan_meier_retention", oracle=_B72_ORACLE)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier product-limit survival curve for time from signup
    to first purchase, right-censored at the observation edge (or
    {KM_HORIZON_D} days) — THE time-to-event estimator for activation
    / churn analyses, done with proper censoring instead of the
    biased "drop users who never converted".

    Scale shape: the event stream collapses to user grain in one
    conditional-min aggregate (+ one purchase-side semi-aggregate);
    everything after — daily (d, c) counts, the at-risk ladder, the
    product-limit — lives on a ≤{KM_HORIZON_D}-row frame via ordered
    cumulative windows. The survival product is exp(Σ ln(1−d/n))
    folded in identical day order both engines, so the doubles agree.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t0"),
        F.max("ts").alias("last_seen"),
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.collect_list("ts").alias("pts"))
    )
    w_all = Window.partitionBy()
    # first purchase AT/after t0 via a per-user array min (no second
    # fact shuffle at user grain beyond the one aggregate above)
    joined = (
        per_user.where(F.col("t0").isNotNull())
        .join(purch, "user_id", "left")
        .select(
            "user_id",
            "t0",
            F.array_min(
                F.filter(
                    F.coalesce("pts", F.array()), lambda p: p >= F.col("t0")
                )
            ).alias("t_purchase"),
            F.max("last_seen").over(w_all).alias("gm"),
        )
    )
    days = lambda a, b: F.floor(  # noqa: E731
        (F.unix_timestamp(a) - F.unix_timestamp(b)) / 86400
    ).cast("bigint")
    obs = joined.select(
        F.when(
            F.col("t_purchase").isNotNull(), days("t_purchase", "t0")
        )
        .otherwise(F.least(days("gm", "t0"), F.lit(KM_HORIZON_D)))
        .alias("t"),
        F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    daily = obs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("bigint").alias("c"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk = daily.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    # d == n_risk (everyone remaining converts) would be ln(0): guard
    # the hazard term to 0 and pin survival to exactly 0.0 from that
    # day on — identical CASE in the oracle, no engine-specific ln(0).
    term = F.log(
        F.when(F.col("d") >= F.col("n_risk"), 1.0).otherwise(
            1.0 - F.col("d") * 1.0 / F.col("n_risk")
        )
    )
    dead = F.sum(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_cum)
    return risk.select(
        "t",
        "n_risk",
        "d",
        "c",
        F.when(dead > 0, 0.0)
        .otherwise(round_eps(F.exp(F.sum(term).over(w_cum)), 6))
        .alias("survival"),
    ).orderBy("t")


# ---------------------------------------------------------------- B73

ATTR_WINDOW_H = 168  # touch lookback (hours) before a conversion
ATTR_FIRST, ATTR_LAST = 0.4, 0.4  # U-shaped split; middles share 0.2

_B73_ORACLE = f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS cts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT event_id AS touch_id, user_id, event_type, ts
  FROM events WHERE event_type IN ('view', 'click')
),
pairs AS (
  SELECT c.conv_id, t.touch_id, t.event_type, t.ts
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id
   AND t.ts < c.cts
   AND t.ts >= c.cts - INTERVAL {ATTR_WINDOW_H} HOUR
),
ranked AS (
  SELECT conv_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, touch_id) AS rn,
         COUNT(*) OVER (PARTITION BY conv_id) AS k
  FROM pairs
),
credited AS (
  SELECT event_type,
         CAST(ROUND(1e6 * CASE
           WHEN k = 1 THEN 1.0
           WHEN k = 2 THEN 0.5
           WHEN rn = 1 THEN {ATTR_FIRST!r}
           WHEN rn = k THEN {ATTR_LAST!r}
           ELSE {(1 - ATTR_FIRST - ATTR_LAST)!r} / (k - 2)
         END) AS BIGINT) AS cr
  FROM ranked
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       {sql_round('SUM(cr) / 1e6', 4)} AS credit
FROM credited GROUP BY event_type ORDER BY event_type
"""


@register("position_attribution", oracle=_B73_ORACLE)
def position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: every
    purchase distributes credit over its preceding {ATTR_WINDOW_H}h
    view/click path — 40% first touch, 40% last, 20% spread over the
    middle — completing the attribution family (B47 last-touch is the
    degenerate case).

    Scale shape: touches join conversions on the USER equi-key (the
    time window is a residual predicate, not a join explosion beyond
    per-user path × conversion density); per-conversion rank/count
    windows partition by conversion id — no global sort. Credits are
    quantised to integer micro-units (the CASE arithmetic is identical
    both engines) so channel sums are exact in any order.
    """
    ev = load_table(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"), "user_id", "event_type", "ts"
    )
    pairs = touch.join(
        conv,
        (F.col("user_id") == F.col("cu"))
        & (F.col("ts") < F.col("cts"))
        & (F.col("ts") >= F.col("cts") - F.expr(f"INTERVAL {ATTR_WINDOW_H} HOURS")),
    ).select("conv_id", "touch_id", "event_type", "ts")
    w_rank = Window.partitionBy("conv_id").orderBy("ts", "touch_id")
    w_k = Window.partitionBy("conv_id")
    ranked = pairs.select(
        "event_type",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_k).alias("k"),
    )
    credit = F.round(
        1e6
        * F.when(F.col("k") == 1, 1.0)
        .when(F.col("k") == 2, 0.5)
        .when(F.col("rn") == 1, F.lit(ATTR_FIRST))
        .when(F.col("rn") == F.col("k"), F.lit(ATTR_LAST))
        .otherwise(F.lit(1 - ATTR_FIRST - ATTR_LAST) / (F.col("k") - 2))
    ).cast("bigint")
    return (
        ranked.select("event_type", credit.alias("cr"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            round_eps(F.sum("cr") / 1e6, 4).alias("credit"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- B74

DID_CUTOFF = "2024-01-16"  # pre/post boundary (mid-observation)

_B74_ORACLE = f"""
WITH cells AS (
  SELECT (user_id % 2 = 1) AS treated,
         (ts >= TIMESTAMP '{DID_CUTOFF}') AS post,
         CAST(ROUND(value * 10000) AS BIGINT) AS v4
  FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT treated, post, SUM(v4) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM cells GROUP BY 1, 2
),
wide AS (
  SELECT
    MAX(CASE WHEN treated AND post THEN s * 1.0 / n / 1e4 END) AS t_post,
    MAX(CASE WHEN treated AND NOT post THEN s * 1.0 / n / 1e4 END) AS t_pre,
    MAX(CASE WHEN NOT treated AND post THEN s * 1.0 / n / 1e4 END) AS c_post,
    MAX(CASE WHEN NOT treated AND NOT post THEN s * 1.0 / n / 1e4 END) AS c_pre
  FROM agg
)
SELECT {sql_round('t_pre', 4)} AS treat_pre, {sql_round('t_post', 4)} AS treat_post,
       {sql_round('c_pre', 4)} AS ctrl_pre, {sql_round('c_post', 4)} AS ctrl_post,
       {sql_round('(t_post - t_pre) - (c_post - c_pre)', 4)} AS did
FROM wide
"""


@register("diff_in_diff", oracle=_B74_ORACLE)
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of purchase value:
    (treated_post − treated_pre) − (control_post − control_pre), with
    the deterministic user-parity treatment stub and a fixed pre/post
    boundary — the quasi-experimental complement of the randomised
    A/B z-test (B61) and CUPED (B63).

    Scale shape: ONE conditional aggregate to 4 cells (map-side
    combined), then pure arithmetic on the 4-row frame. Cell sums in
    exact 1e-4 integer units; the only doubles are 4 divisions and 3
    subtractions on identical inputs.
    """
    cells = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2 == 1).alias("treated"),
            (F.col("ts") >= F.lit(DID_CUTOFF).cast("timestamp")).alias("post"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v4"),
        )
    )
    agg = cells.groupBy("treated", "post").agg(
        F.sum("v4").alias("s"), F.count(F.lit(1)).alias("n")
    )
    mean = F.col("s") * 1.0 / F.col("n") / 1e4

    def cell(tr: bool, po: bool):
        return F.max(
            F.when((F.col("treated") == tr) & (F.col("post") == po), mean)
        )

    wide = agg.agg(
        cell(True, True).alias("t_post"),
        cell(True, False).alias("t_pre"),
        cell(False, True).alias("c_post"),
        cell(False, False).alias("c_pre"),
    )
    return wide.select(
        round_eps(F.col("t_pre"), 4).alias("treat_pre"),
        round_eps(F.col("t_post"), 4).alias("treat_post"),
        round_eps(F.col("c_pre"), 4).alias("ctrl_pre"),
        round_eps(F.col("c_post"), 4).alias("ctrl_post"),
        round_eps(
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre")), 4
        ).alias("did"),
    )


# ---------------------------------------------------------------- B75

NEYMAN_N = 1000  # total sample budget to allocate

_B75_ORACLE = f"""
WITH strata AS (
  SELECT o_orderpriority AS stratum,
         CAST(COUNT(*) AS BIGINT) AS n_h,
         STDDEV_SAMP(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS s_h
  FROM orders GROUP BY 1
),
tot AS (
  SELECT stratum, n_h, s_h,
         SUM(n_h * s_h) OVER () AS denom
  FROM strata
)
SELECT stratum, n_h, {sql_round('s_h', 4)} AS s_h,
       CAST(ROUND({NEYMAN_N} * n_h * s_h / denom) AS BIGINT) AS n_alloc
FROM tot ORDER BY stratum
"""


@register("neyman_allocation", oracle=_B75_ORACLE)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation of a {NEYMAN_N}-unit sample across
    order-priority strata: n_h ∝ N_h·S_h — the variance-minimising
    design behind C19/C38's stratified samplers (those take rates as
    given; this computes the rates a survey statistician would).

    Scale shape: one grouped aggregate to |strata| rows (count +
    stddev partials map-side combined over exact integer cents), the
    normalising total an unbounded window on that tiny frame.
    """
    strata = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            (
                F.stddev_samp(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                / 100.0
            ).alias("s_h"),
        )
    )
    w_all = Window.partitionBy()
    return (
        strata.withColumn("denom", F.sum(F.col("n_h") * F.col("s_h")).over(w_all))
        .select(
            "stratum",
            "n_h",
            round_eps(F.col("s_h"), 4).alias("s_h"),
            F.round(F.lit(NEYMAN_N) * F.col("n_h") * F.col("s_h") / F.col("denom"))
            .cast("bigint")
            .alias("n_alloc"),
        )
        .orderBy("stratum")
    )
