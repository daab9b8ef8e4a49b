"""Hundred-thirteenth sweep (SURVEY.md §2 B209-B210, C191).

Nelson-Aalen cumulative hazard beside the KM curve it bounds (the
additive hazard view of B72's survival, with the Peterson gap
exp(-H) >= S made visible per day), the newsvendor critical-fractile
stocking rule (the quantile-not-mean inventory decision that prices
B177's backlog risk asymmetrically), and Yule's characteristic K
(the length-invariant lexical-repetitiveness constant the Heaps/
hapax/MATTR family circles without computing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B209

NA_HORIZON_D = 30  # censoring horizon (days), mirrors B72

_B209_ORACLE = f"""
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
                              AS BIGINT), {NA_HORIZON_D}) END AS t,
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
curves AS (
  SELECT t, n_risk, d,
         SUM(d * 1.0 / n_risk) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS h,
         exp(SUM(ln(CASE WHEN d >= n_risk THEN 1.0
                         ELSE 1.0 - d * 1.0 / n_risk END)) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )) AS s,
         SUM(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS dead
  FROM risk
)
SELECT t, n_risk, d,
       {sql_round('h', 6)} AS cum_hazard,
       {sql_round('exp(-h)', 6)} AS na_survival,
       CASE WHEN dead > 0 THEN 0.0 ELSE {sql_round('s', 6)} END
         AS km_survival,
       {sql_round(
           'exp(-h) - (CASE WHEN dead > 0 THEN 0.0 ELSE s END)', 6)}
         AS na_minus_km
FROM curves ORDER BY t
"""


@register("nelson_aalen_hazard", oracle=_B209_ORACLE)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = sum d/n for time from
    signup to first purchase on EXACTLY B72's censoring setup, with
    exp(-H) laid beside the KM product-limit: exp(-H) >= S always
    (1-x <= e^-x termwise), and the per-day gap is largest exactly
    where risk sets are thin — the additive view that sums cleanly
    across strata (the property log-rank exploits) where KM's
    product does not.

    Exactness: d and n_risk are exact BIGINTs off one cumulative
    ladder; H and ln S are folded in identical day order in both
    engines, so the doubles agree to the 6-dp round.

    Scale shape: identical to B72 — one user-grain collapse of the
    event stream, then ordered windows over a <={NA_HORIZON_D}-row
    daily frame.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("t0"),
        F.max("ts").alias("last_seen"),
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.collect_list("ts").alias("pts"))
    )
    w_all = Window.partitionBy()
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
        F.when(F.col("t_purchase").isNotNull(), days("t_purchase", "t0"))
        .otherwise(F.least(days("gm", "t0"), F.lit(NA_HORIZON_D)))
        .alias("t"),
        F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    daily = obs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("bigint").alias("c"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = daily.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    term = F.log(
        F.when(F.col("d") >= F.col("n_risk"), 1.0).otherwise(
            1.0 - F.col("d") * 1.0 / F.col("n_risk")
        )
    )
    curves = risk.select(
        "t",
        "n_risk",
        "d",
        F.sum(F.col("d") * 1.0 / F.col("n_risk")).over(w_cum).alias("h"),
        F.exp(F.sum(term).over(w_cum)).alias("s"),
        F.sum(F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0))
        .over(w_cum)
        .alias("dead"),
    )
    km = F.when(F.col("dead") > 0, 0.0).otherwise(F.col("s"))
    return curves.select(
        "t",
        "n_risk",
        "d",
        round_eps(F.col("h"), 6).alias("cum_hazard"),
        round_eps(F.exp(-F.col("h")), 6).alias("na_survival"),
        F.when(F.col("dead") > 0, 0.0)
        .otherwise(round_eps(F.col("s"), 6))
        .alias("km_survival"),
        round_eps(F.exp(-F.col("h")) - km, 6).alias("na_minus_km"),
    ).orderBy("t")


# ---------------------------------------------------------------- B210

NV_CU = 3  # underage (lost-margin) cost per unit short
NV_CO = 1  # overage (holding) cost per unit over
# critical fractile = CU / (CU + CO) = 3/4

_B210_ORACLE = f"""
WITH weekly AS (
  SELECT p.p_brand AS brand,
         CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', l.l_shipdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(ROUND(SUM(l.l_quantity)) AS BIGINT) AS dem
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT brand, w, dem,
         ROW_NUMBER() OVER (PARTITION BY brand ORDER BY dem, w) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY brand) AS BIGINT) AS n,
         CAST(SUM(dem) OVER (PARTITION BY brand) AS BIGINT) AS tot
  FROM weekly
),
stocks AS (
  SELECT brand, n,
         MAX(CASE WHEN rn = CAST(ceil({NV_CU}.0 * n / {NV_CU + NV_CO})
                                 AS BIGINT)
                  THEN dem END) AS s_opt,
         CAST(floor(tot * 1.0 / n + 0.5) AS BIGINT) AS s_mean
  FROM ranked GROUP BY brand, n, tot
),
costs AS (
  SELECT r.brand, s.n, s.s_opt, s.s_mean,
         SUM({NV_CO} * greatest(s.s_opt - r.dem, 0)
             + {NV_CU} * greatest(r.dem - s.s_opt, 0)) * 1.0 / s.n
           AS c_opt,
         SUM({NV_CO} * greatest(s.s_mean - r.dem, 0)
             + {NV_CU} * greatest(r.dem - s.s_mean, 0)) * 1.0 / s.n
           AS c_mean
  FROM ranked r JOIN stocks s ON r.brand = s.brand
  GROUP BY r.brand, s.n, s.s_opt, s.s_mean
)
SELECT brand, n AS n_weeks, s_opt AS optimal_stock, s_mean AS mean_stock,
       {sql_round('c_opt', 4)} AS cost_optimal,
       {sql_round('c_mean', 4)} AS cost_mean,
       CASE WHEN c_mean <= 0 THEN 0.0
            ELSE {sql_round('(c_mean - c_opt) * 100.0 / c_mean', 4)} END
         AS saving_pct
FROM costs ORDER BY brand
"""


@register("newsvendor_stocking", oracle=_B210_ORACLE)
def newsvendor_stocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor critical-fractile stocking per brand: with underage
    cost {NV_CU} and overage cost {NV_CO}, the optimal stock is the
    empirical {NV_CU}/{NV_CU + NV_CO} demand quantile of weekly
    demand — NOT the mean — and the table prices the difference:
    expected cost per week at the quantile rule vs the
    stock-the-average rule. When shortage costs dominate, averaging
    under-stocks every heavy week; saving_pct is what the quantile
    rule buys (0 when demand is flat and the rules coincide).

    Exactness: weekly demands are exact BIGINTs; the quantile is
    rank-selected (smallest demand with rank >= ceil(r*n), ties
    broken by week for a deterministic pick in both engines); costs
    are integer sums with one double division.

    Scale shape: one fact-dim join collapses lineitem to the
    |brands| x |weeks| frame; ranks, stocks, and costs all live on
    that bounded frame (two small self-joins at brand grain).
    """
    ratio_den = NV_CU + NV_CO
    weekly = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("pk"),
            F.col("l_shipdate").alias("sd"),
            F.col("l_quantity").alias("qty"),
        )
        .join(
            load_table(spark, sf_dir, "part").select(
                F.col("p_partkey").alias("pk"),
                F.col("p_brand").alias("brand"),
            ),
            "pk",
        )
        .groupBy(
            "brand",
            (
                F.datediff(
                    F.date_trunc("week", F.col("sd")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w"),
        )
        .agg(F.round(F.sum("qty")).cast("bigint").alias("dem"))
    )
    w_brand = Window.partitionBy("brand")
    ranked = weekly.select(
        "brand",
        "w",
        "dem",
        F.row_number()
        .over(Window.partitionBy("brand").orderBy("dem", "w"))
        .alias("rn"),
        F.count(F.lit(1)).over(w_brand).cast("bigint").alias("n"),
        F.sum("dem").over(w_brand).cast("bigint").alias("tot"),
    )
    idx = F.ceil(F.lit(float(NV_CU)) * F.col("n") / ratio_den).cast("bigint")
    stocks = ranked.groupBy("brand", "tot").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("rn") == idx, F.col("dem"))).alias("s_opt"),
    ).select(
        "brand",
        "n",
        "s_opt",
        F.floor(F.col("tot") * 1.0 / F.col("n") + 0.5)
        .cast("bigint")
        .alias("s_mean"),
    )
    costs = (
        ranked.select("brand", "dem")
        .join(stocks, "brand")
        .groupBy("brand", "n", "s_opt", "s_mean")
        .agg(
            (
                F.sum(
                    NV_CO * F.greatest(F.col("s_opt") - F.col("dem"), F.lit(0))
                    + NV_CU
                    * F.greatest(F.col("dem") - F.col("s_opt"), F.lit(0))
                )
                * 1.0
                / F.max("n")
            ).alias("c_opt"),
            (
                F.sum(
                    NV_CO
                    * F.greatest(F.col("s_mean") - F.col("dem"), F.lit(0))
                    + NV_CU
                    * F.greatest(F.col("dem") - F.col("s_mean"), F.lit(0))
                )
                * 1.0
                / F.max("n")
            ).alias("c_mean"),
        )
    )
    return costs.select(
        "brand",
        F.col("n").alias("n_weeks"),
        F.col("s_opt").alias("optimal_stock"),
        F.col("s_mean").alias("mean_stock"),
        round_eps(F.col("c_opt"), 4).alias("cost_optimal"),
        round_eps(F.col("c_mean"), 4).alias("cost_mean"),
        F.when(F.col("c_mean") <= 0, 0.0)
        .otherwise(
            round_eps(
                (F.col("c_mean") - F.col("c_opt")) * 100.0 / F.col("c_mean"),
                4,
            )
        )
        .alias("saving_pct"),
    ).orderBy("brand")


# ---------------------------------------------------------------- C191

_C191_ORACLE = f"""
WITH toks AS (
  SELECT d.source, unnest(string_split_regex(lower(d.text), '\\s+')) AS tok
  FROM documents d
),
freqs AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS m
  FROM toks GROUP BY source, tok
),
spectrum AS (
  SELECT source, m, CAST(COUNT(*) AS BIGINT) AS vm
  FROM freqs GROUP BY source, m
),
stats AS (
  SELECT source,
         CAST(SUM(m * vm) AS BIGINT) AS n_tokens,
         CAST(SUM(vm) AS BIGINT) AS n_types,
         CAST(SUM(m * m * vm) AS BIGINT) AS s2
  FROM spectrum GROUP BY source
)
SELECT source, n_tokens, n_types,
       {sql_round('(1.0 - n_types * 1.0 / n_tokens) * 100.0', 4)}
         AS repeat_rate_pct,
       {sql_round('1e4 * (s2 - n_tokens) * 1.0 / (n_tokens * 1.0 '
                  '* n_tokens)', 4)} AS yules_k
FROM stats ORDER BY source
"""


@register("yules_k_lexical", oracle=_C191_ORACLE)
def yules_k_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source: K = 1e4 * (sum m^2 V_m - N)
    / N^2 over the frequency-of-frequencies spectrum — the classic
    length-invariant repetitiveness constant (the chance two random
    tokens are the same word, scaled), which is the sample-size-free
    comparison the raw type/token ratio, C48's hapax share, and
    C135's MATTR all fail to be. High K = formulaic/boilerplate
    vocabulary use; a source whose K is an outlier is template text
    the dedup family should be pointed at.

    Exactness: the spectrum and all three sufficient statistics are
    exact BIGINTs; one double expression per source at the end.

    Scale shape: tokenise map-side, two partial-agg shuffles
    (term counts at (source, token) grain, then the tiny
    (source, m) spectrum), final |sources|-row aggregate.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    )
    freqs = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    spectrum = freqs.groupBy("source", "m").agg(
        F.count(F.lit(1)).cast("bigint").alias("vm")
    )
    stats = spectrum.groupBy("source").agg(
        F.sum(F.col("m") * F.col("vm")).cast("bigint").alias("n_tokens"),
        F.sum("vm").cast("bigint").alias("n_types"),
        F.sum(F.col("m") * F.col("m") * F.col("vm"))
        .cast("bigint")
        .alias("s2"),
    )
    return stats.select(
        "source",
        "n_tokens",
        "n_types",
        round_eps(
            (1.0 - F.col("n_types") * 1.0 / F.col("n_tokens")) * 100.0, 4
        ).alias("repeat_rate_pct"),
        round_eps(
            1e4
            * (F.col("s2") - F.col("n_tokens"))
            * 1.0
            / (F.col("n_tokens") * 1.0 * F.col("n_tokens")),
            4,
        ).alias("yules_k"),
    ).orderBy("source")
