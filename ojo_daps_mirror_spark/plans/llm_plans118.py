"""Hundred-eighteenth sweep (SURVEY.md §2 B220-B223).

The time-series inference block closing over the B-track's trend
family: KPSS level-stationarity (the null-reversed complement of
drift detectors — here STATIONARITY is the null), the Lo-MacKinlay
variance-ratio random-walk test (mean-reversion vs trending in one
number), Cornish-Fisher moment-adjusted VaR laid against the exact
empirical quantile (when does the parametric shortcut lie), and
STL-style seasonal/trend strength from a classical 7-day
decomposition on the DENSE calendar grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.stats import normal_sf_abs, sql_normal_sf_abs
from ..operators.attach import attach_scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B220

# KPSS level-stationarity critical values (Kwiatkowski et al. 1992,
# Table 1, public): 10% / 5% / 1%.
KPSS_CRIT = (0.347, 0.463, 0.739)

_B220_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
scaled AS (
  SELECT w, y,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(y) OVER () AS BIGINT) AS s1
  FROM weekly
),
resid AS (
  SELECT w, n,
         CAST(n * y - s1 AS BIGINT) AS e,
         CAST(SUM(CAST(n AS HUGEINT) * y - s1) OVER (
           ORDER BY w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS HUGEINT) AS s_t
  FROM scaled
),
stat AS (
  SELECT MAX(n) AS n,
         CAST(SUM(s_t * s_t) AS DOUBLE) AS num,
         CAST(SUM(CAST(e AS HUGEINT) * e) AS DOUBLE) AS den
  FROM resid
)
SELECT n AS n_weeks,
       {sql_round('num / (n * den)', 6)} AS kpss_eta,
       {KPSS_CRIT[0]!r} AS crit_10pct,
       {KPSS_CRIT[1]!r} AS crit_5pct,
       {KPSS_CRIT[2]!r} AS crit_1pct,
       CASE WHEN num / (n * den) > {KPSS_CRIT[1]!r}
            THEN 1 ELSE 0 END AS reject_stationarity_5pct
FROM stat
"""


@register("kpss_stationarity", oracle=_B220_ORACLE)
def kpss_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test (lag-0 variant) on the weekly
    order series: eta = sum_t S_t^2 / (n * sum_t e_t^2) over the
    partial sums of mean-residuals, against the published 1992
    critical values. The null here is STATIONARY — the reverse of
    every drift detector in the B-track (B67 CUSUM alarms on change;
    KPSS certifies its absence), which is exactly what you want
    before trusting a stationary-mean capacity plan. Pairs with
    B-track Hurst/Pettitt: KPSS rejecting while Pettitt localises is
    the full story.

    Exactness: residuals are scaled by n map-side (E_t = n*y_t - S1)
    so partial sums, their squares, and the denominator are ALL
    exact 128-bit integers — the n-scaling cancels to
    eta = sum S'^2 / (n * sum E^2) with a single final division.

    Scale shape: one fact aggregate to |weeks| rows; the cumulative
    ladder is one ordered window over that dimension-scale frame.
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
    w_cum = Window.orderBy("w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scaled = weekly.select(
        "w",
        "y",
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.sum("y").over(w_all).cast("bigint").alias("s1"),
    )
    dec = "decimal(38,0)"
    e = (F.col("n") * F.col("y") - F.col("s1")).cast("bigint")
    resid = scaled.select(
        "w",
        "n",
        e.alias("e"),
        F.sum(e.cast(dec)).over(w_cum).alias("s_t"),
    )
    stat = resid.agg(
        F.max("n").alias("n"),
        F.sum(F.col("s_t") * F.col("s_t")).cast("double").alias("num"),
        F.sum(F.col("e").cast(dec) * F.col("e")).cast("double").alias("den"),
    )
    eta = F.col("num") / (F.col("n") * F.col("den"))
    return stat.select(
        F.col("n").alias("n_weeks"),
        round_eps(eta, 6).alias("kpss_eta"),
        F.lit(KPSS_CRIT[0]).alias("crit_10pct"),
        F.lit(KPSS_CRIT[1]).alias("crit_5pct"),
        F.lit(KPSS_CRIT[2]).alias("crit_1pct"),
        (eta > KPSS_CRIT[1]).cast("int").alias("reject_stationarity_5pct"),
    )


# ---------------------------------------------------------------- B221

VR_Q = 4  # aggregation horizon (weeks)

_B221_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
scaled AS (
  SELECT w, y,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(y) OVER () AS BIGINT) AS s1,
         ROW_NUMBER() OVER (ORDER BY w) AS rn,
         CAST(SUM(y) OVER (
           ORDER BY w ROWS BETWEEN CURRENT ROW AND {VR_Q - 1} FOLLOWING
         ) AS BIGINT) AS sq
  FROM weekly
),
sums AS (
  SELECT MAX(n) AS n,
         CAST(COUNT(CASE WHEN rn <= n - {VR_Q - 1} THEN 1 END)
              AS BIGINT) AS m,
         CAST(SUM((CAST(n AS HUGEINT) * y - s1)
                  * (CAST(n AS HUGEINT) * y - s1)) AS DOUBLE) AS se2,
         CAST(SUM(CASE WHEN rn <= n - {VR_Q - 1}
                       THEN (CAST(n AS HUGEINT) * sq - {VR_Q} * s1)
                            * (CAST(n AS HUGEINT) * sq - {VR_Q} * s1)
                       ELSE CAST(0 AS HUGEINT) END) AS DOUBLE) AS sq2
  FROM scaled
),
vr AS (
  SELECT n, m,
         (n * sq2) / ({VR_Q}.0 * m * se2) AS ratio
  FROM sums
)
SELECT n AS n_weeks, m AS n_windows,
       {sql_round('ratio', 6)} AS variance_ratio,
       {sql_round(
           '(ratio - 1.0) / sqrt(2.0 * (2 * {q} - 1) * ({q} - 1)'
           ' / (3.0 * {q} * n))'.format(q=VR_Q), 4)} AS z_score,
       {sql_round('2.0 * ' + sql_normal_sf_abs(
           '(ratio - 1.0) / sqrt(2.0 * (2 * {q} - 1) * ({q} - 1)'
           ' / (3.0 * {q} * n))'.format(q=VR_Q)), 6)} AS p_value
FROM vr
"""


@register("variance_ratio_test", oracle=_B221_ORACLE)
def variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test at horizon q={VR_Q} on weekly
    order counts: VR = Var({VR_Q}-week overlapping sums) /
    ({VR_Q} x Var(weekly)), 1 under iid increments. VR > 1 means
    positive serial dependence (shocks trend — a busy week predicts
    a busy month, so capacity must be sized on the AGGREGATED
    variance, which is what naive sqrt-of-time scaling under-calls);
    VR < 1 means mean reversion. The homoscedastic z uses the
    published asymptotic variance 2(2q-1)(q-1)/(3qn).

    Exactness: the n-scaling trick (E = n*y - S1, Q = n*sq - q*S1)
    keeps every centered square an exact 128-bit integer; VR is one
    final double expression (n * sumQ^2)/(q * m * sumE^2).

    Scale shape: one fact aggregate to |weeks| rows, one ordered
    sliding window for the overlapping q-sums, one reduction.
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
    w_ord = Window.orderBy("w")
    scaled = weekly.select(
        "w",
        "y",
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.sum("y").over(w_all).cast("bigint").alias("s1"),
        F.row_number().over(w_ord).alias("rn"),
        F.sum("y")
        .over(w_ord.rowsBetween(Window.currentRow, VR_Q - 1))
        .cast("bigint")
        .alias("sq"),
    )
    dec = "decimal(38,0)"
    e = F.col("n").cast(dec) * F.col("y") - F.col("s1")
    q_dev = F.col("n").cast(dec) * F.col("sq") - VR_Q * F.col("s1")
    zero = F.lit(0).cast(dec)
    in_win = F.col("rn") <= F.col("n") - (VR_Q - 1)
    sums = scaled.agg(
        F.max("n").alias("n"),
        F.sum(F.when(in_win, 1).otherwise(0)).cast("bigint").alias("m"),
        F.sum(e * e).cast("double").alias("se2"),
        F.sum(F.when(in_win, q_dev * q_dev).otherwise(zero))
        .cast("double")
        .alias("sq2"),
    )
    nd = F.col("n").cast("double")
    ratio = (nd * F.col("sq2")) / (
        float(VR_Q) * F.col("m") * F.col("se2")
    )
    z = (ratio - 1.0) / F.sqrt(
        2.0 * (2 * VR_Q - 1) * (VR_Q - 1) / (3.0 * VR_Q * nd)
    )
    return sums.select(
        F.col("n").alias("n_weeks"),
        F.col("m").alias("n_windows"),
        round_eps(ratio, 6).alias("variance_ratio"),
        round_eps(z, 4).alias("z_score"),
        round_eps(2.0 * normal_sf_abs(z), 6).alias("p_value"),
    )


# ---------------------------------------------------------------- B222

CF_Z95 = 1.6448536269514722  # Phi^-1(0.95)
# z-polynomial constants precomputed in Python so BOTH engines see one
# double literal each (DuckDB parses long numeric literals as DECIMAL;
# cubing one overflows decimal scale).
CF_A = CF_Z95 * CF_Z95 - 1.0
CF_B = CF_Z95 * CF_Z95 * CF_Z95 - 3.0 * CF_Z95
CF_C = 2.0 * CF_Z95 * CF_Z95 * CF_Z95 - 5.0 * CF_Z95

_B222_ORACLE = f"""
WITH cents AS (
  SELECT c.c_mktsegment AS segment,
         CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
moments AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2,
         CAST(SUM(CAST(x AS HUGEINT) * x * x) AS DOUBLE) AS s3,
         CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS DOUBLE) AS s4
  FROM cents GROUP BY segment
),
emp AS (
  SELECT segment, MIN(x) AS q95
  FROM (
    SELECT segment, x,
           ROW_NUMBER() OVER (PARTITION BY segment ORDER BY x) AS rn,
           COUNT(*) OVER (PARTITION BY segment) AS n
    FROM cents
  ) WHERE rn = CAST(ceil(0.95 * n) AS BIGINT)
  GROUP BY segment
),
fitted AS (
  SELECT m.segment, m.n,
         s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3.0 * (s1 / n) * (s2 / n)
           + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4.0 * (s1 / n) * (s3 / n)
           + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4,
         e.q95
  FROM moments m JOIN emp e ON m.segment = e.segment
),
parms AS (
  SELECT segment, n, mu, q95, sqrt(m2) AS sd,
         m3 / (m2 * sqrt(m2)) AS g1,
         m4 / (m2 * m2) - 3.0 AS g2
  FROM fitted
),
vars AS (
  SELECT segment, n, mu, sd, g1, g2, q95,
         {CF_Z95!r}
           + {CF_A!r} * g1 / 6.0
           + {CF_B!r} * g2 / 24.0
           - {CF_C!r} * g1 * g1 / 36.0 AS z_cf
  FROM parms
)
SELECT segment, n AS n_orders,
       {sql_round('g1', 6)} AS skewness,
       {sql_round('g2', 6)} AS excess_kurtosis,
       {sql_round('(mu + {z!r} * sd) / 100.0'.format(z=CF_Z95), 4)}
         AS var95_normal,
       {sql_round('(mu + z_cf * sd) / 100.0', 4)} AS var95_cf,
       {sql_round('q95 / 100.0', 4)} AS var95_empirical,
       {sql_round('abs((mu + {z!r} * sd) - q95) / 100.0'
                  .format(z=CF_Z95), 4)} AS normal_abs_err,
       {sql_round('abs((mu + z_cf * sd) - q95) / 100.0', 4)}
         AS cf_abs_err
FROM vars ORDER BY segment
"""


@register("cornish_fisher_var", oracle=_B222_ORACLE)
def cornish_fisher_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cornish-Fisher moment-adjusted 95% VaR of order values per
    segment, judged against the exact empirical quantile: the CF
    expansion bends the normal z with the observed skewness and
    excess kurtosis (third/fourth exact moments), and the two
    absolute-error columns show whether the adjustment actually buys
    accuracy over the plain mu + z*sigma — on heavy-tailed value
    distributions normal VaR under-reserves and CF closes most of
    the gap without storing the empirical distribution (the
    practical point at 100 TB: moments stream in one pass,
    percentiles need a shuffle-heavy rank).

    Exactness: four power sums in 128-bit integers off one pass
    (cents^4 stays inside decimal38); the empirical q95 is an exact
    rank-selected order statistic; all expansion algebra is one
    identical double tree.

    Scale shape: one broadcast dim join; moments are one fact-grain
    aggregate; the empirical quantile is the only rank pass and
    exists purely to audit the moment path.
    """
    cents = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            F.round(F.col("o_totalprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("x"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    F.col("c_custkey").alias("ck"),
                    F.col("c_mktsegment").alias("segment"),
                )
            ),
            "ck",
        )
        .select("segment", "x")
    )
    cents = cents.persist()
    dec = "decimal(38,0)"
    xd = F.col("x").cast(dec)
    moments = cents.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xd).cast("double").alias("s1"),
        F.sum(xd * F.col("x")).cast("double").alias("s2"),
        F.sum(xd * F.col("x") * F.col("x")).cast("double").alias("s3"),
        F.sum(xd * F.col("x") * F.col("x") * F.col("x"))
        .cast("double")
        .alias("s4"),
    )
    w_seg = Window.partitionBy("segment")
    ranked = cents.select(
        "segment",
        "x",
        F.row_number().over(w_seg.orderBy("x")).alias("rn"),
        F.count(F.lit(1)).over(w_seg).alias("cnt"),
    )
    emp = (
        ranked.where(
            F.col("rn") == F.ceil(0.95 * F.col("cnt")).cast("bigint")
        )
        .groupBy("segment")
        .agg(F.min("x").alias("q95"))
    )
    a1 = F.col("s1") / F.col("n")
    a2 = F.col("s2") / F.col("n")
    a3 = F.col("s3") / F.col("n")
    a4 = F.col("s4") / F.col("n")
    m2 = a2 - a1 * a1
    m3 = a3 - 3.0 * a1 * a2 + 2.0 * a1 * a1 * a1
    m4 = a4 - 4.0 * a1 * a3 + 6.0 * a1 * a1 * a2 - 3.0 * a1 * a1 * a1 * a1
    fitted = moments.join(emp, "segment").select(
        "segment",
        "n",
        a1.alias("mu"),
        F.sqrt(m2).alias("sd"),
        (m3 / (m2 * F.sqrt(m2))).alias("g1"),
        (m4 / (m2 * m2) - 3.0).alias("g2"),
        "q95",
    )
    z = CF_Z95
    z_cf = (
        F.lit(z)
        + CF_A * F.col("g1") / 6.0
        + CF_B * F.col("g2") / 24.0
        - CF_C * F.col("g1") * F.col("g1") / 36.0
    )
    vars_ = fitted.withColumn("z_cf", z_cf)
    v_norm = F.col("mu") + z * F.col("sd")
    v_cf = F.col("mu") + F.col("z_cf") * F.col("sd")
    return vars_.select(
        "segment",
        F.col("n").alias("n_orders"),
        round_eps(F.col("g1"), 6).alias("skewness"),
        round_eps(F.col("g2"), 6).alias("excess_kurtosis"),
        round_eps(v_norm / 100.0, 4).alias("var95_normal"),
        round_eps(v_cf / 100.0, 4).alias("var95_cf"),
        round_eps(F.col("q95") / 100.0, 4).alias("var95_empirical"),
        round_eps(F.abs(v_norm - F.col("q95")) / 100.0, 4).alias(
            "normal_abs_err"
        ),
        round_eps(F.abs(v_cf - F.col("q95")) / 100.0, 4).alias("cf_abs_err"),
    ).orderBy("segment")


# ---------------------------------------------------------------- B223

_B223_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
dense AS (
  SELECT g.d,
         CAST(datediff('day', DATE '1970-01-05', g.d) % 7 AS BIGINT) AS dow,
         COALESCE(daily.y, 0) AS y
  FROM (
    SELECT unnest(generate_series(
      (SELECT MIN(d) FROM daily), (SELECT MAX(d) FROM daily),
      INTERVAL 1 DAY))::DATE AS d
  ) g LEFT JOIN daily ON daily.d = g.d
),
ma AS (
  SELECT d, dow, y,
         CAST(SUM(y) OVER (
           ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
         ) AS BIGINT) AS s7,
         CAST(COUNT(*) OVER (
           ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
         ) AS BIGINT) AS c7
  FROM dense
),
interior AS (
  SELECT d, dow, CAST(7 * y - s7 AS BIGINT) AS det
  FROM ma WHERE c7 = 7
),
seas AS (
  SELECT dow, AVG(det * 1.0) AS s_eff,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM interior GROUP BY dow
),
joined AS (
  SELECT i.d, i.dow, i.det * 1.0 AS det, s.s_eff,
         i.det * 1.0 - s.s_eff AS rem
  FROM interior i JOIN seas s ON i.dow = s.dow
),
vars AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(det * det) / COUNT(*)
           - (SUM(det) / COUNT(*)) * (SUM(det) / COUNT(*)) AS v_det,
         SUM(rem * rem) / COUNT(*)
           - (SUM(rem) / COUNT(*)) * (SUM(rem) / COUNT(*)) AS v_rem
  FROM joined
),
peaks AS (
  SELECT
    (SELECT dow FROM seas ORDER BY s_eff DESC, dow LIMIT 1) AS peak_dow,
    (SELECT dow FROM seas ORDER BY s_eff ASC, dow LIMIT 1) AS trough_dow,
    (SELECT s_eff FROM seas ORDER BY s_eff DESC, dow LIMIT 1) AS peak_eff,
    (SELECT s_eff FROM seas ORDER BY s_eff ASC, dow LIMIT 1) AS trough_eff
)
SELECT v.n AS n_days,
       {sql_round('greatest(1.0 - v.v_rem / v.v_det, 0.0)', 6)}
         AS seasonal_strength,
       p.peak_dow, p.trough_dow,
       {sql_round('p.peak_eff / 7.0', 4)} AS peak_daily_effect,
       {sql_round('p.trough_eff / 7.0', 4)} AS trough_daily_effect
FROM vars v CROSS JOIN peaks p
"""


@register("seasonal_strength_dow", oracle=_B223_ORACLE)
def seasonal_strength_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal strength of daily order volume via
    classical decomposition on the DENSE calendar grid: detrend with
    a centred 7-day moving average, average the detrended series by
    weekday for the seasonal effects, and report Hyndman's
    F_s = max(0, 1 - Var(remainder)/Var(detrended)) — the fraction
    of non-trend variance the weekly cycle explains. Near-1 means
    staffing should be a weekday grid (and B-track daily anomaly
    thresholds must be per-weekday or they alarm every Monday);
    near-0 means the apparent cycle is noise. Peak/trough weekday
    effects are in orders/day.

    Exactness: the dense grid, the 7-day sums, and the 7x-scaled
    detrended values (det = 7y - S7) are exact integers; weekday is
    exact integer day arithmetic from a Monday epoch (no engine
    dow() convention involved); variances and effects are identical
    double trees over the interior days.

    Scale shape: one fact aggregate to |days| rows, dense grid from
    the 1-row min/max attach, one ordered +-3 window, one 7-row
    weekday aggregate — nothing after the first shuffle sees volume.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    span = daily.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    dense = (
        span.select(
            F.explode(
                F.sequence("dmin", "dmax", F.expr("interval 1 day"))
            ).alias("d")
        )
        .join(daily, "d", "left")
        .select(
            "d",
            (
                F.datediff("d", F.lit("1970-01-05").cast("date")) % 7
            )
            .cast("bigint")
            .alias("dow"),
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        )
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    ma = dense.select(
        "d",
        "dow",
        "y",
        F.sum("y").over(w7).cast("bigint").alias("s7"),
        F.count(F.lit(1)).over(w7).cast("bigint").alias("c7"),
    )
    interior = ma.where(F.col("c7") == 7).select(
        "d", "dow", (7 * F.col("y") - F.col("s7")).cast("bigint").alias("det")
    )
    seas = interior.groupBy("dow").agg(
        F.avg(F.col("det") * 1.0).alias("s_eff"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    joined = interior.join(F.broadcast(seas), "dow").select(
        "d",
        "dow",
        (F.col("det") * 1.0).alias("det"),
        (F.col("det") * 1.0 - F.col("s_eff")).alias("rem"),
    )
    n = F.count(F.lit(1))
    vars_ = joined.agg(
        n.cast("bigint").alias("n"),
        (
            F.sum(F.col("det") * F.col("det")) / n
            - (F.sum("det") / n) * (F.sum("det") / n)
        ).alias("v_det"),
        (
            F.sum(F.col("rem") * F.col("rem")) / n
            - (F.sum("rem") / n) * (F.sum("rem") / n)
        ).alias("v_rem"),
    )
    w_desc = Window.orderBy(F.col("s_eff").desc(), "dow")
    w_asc = Window.orderBy(F.col("s_eff").asc(), "dow")
    peaks = (
        seas.select(
            F.row_number().over(w_desc).alias("rd"),
            F.row_number().over(w_asc).alias("ra"),
            "dow",
            "s_eff",
        )
        .agg(
            F.max(F.when(F.col("rd") == 1, F.col("dow"))).alias("peak_dow"),
            F.max(F.when(F.col("ra") == 1, F.col("dow"))).alias(
                "trough_dow"
            ),
            F.max(F.when(F.col("rd") == 1, F.col("s_eff"))).alias(
                "peak_eff"
            ),
            F.max(F.when(F.col("ra") == 1, F.col("s_eff"))).alias(
                "trough_eff"
            ),
        )
    )
    return attach_scalars(vars_, peaks).select(
        F.col("n").alias("n_days"),
        round_eps(
            F.greatest(
                1.0 - F.col("v_rem") / F.col("v_det"), F.lit(0.0)
            ),
            6,
        ).alias("seasonal_strength"),
        "peak_dow",
        "trough_dow",
        round_eps(F.col("peak_eff") / 7.0, 4).alias("peak_daily_effect"),
        round_eps(F.col("trough_eff") / 7.0, 4).alias("trough_daily_effect"),
    )
