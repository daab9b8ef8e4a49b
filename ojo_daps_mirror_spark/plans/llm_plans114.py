"""Hundred-fourteenth sweep (SURVEY.md §2 B211-B212, C192).

Weibull median-rank regression on fulfilment lead times (the shape/
scale fit behind every reliability view the survival family — B72/
B209 — draws nonparametrically), the safety-stock/reorder-point rule
with its own empirical service-level audit (the normal-theory
complement of B210's distribution-free newsvendor), and a lognormal
fit of document lengths with an exact KS goodness distance (the
length PRIOR packing/sampling planners assume; the KS column says
whether this corpus honours it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.stats import normal_cdf, sql_normal_cdf
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B211

# Micro-unit quantisation: ln values are floored to exact integer
# 1e-6 units map-side (floor, NOT round — floor has no half-way
# rounding-mode ambiguity between engines), so every OLS sufficient
# statistic is exact 128-bit integer arithmetic.
_Q = "1000000"

_B211_ORACLE = f"""
WITH lead_t AS (
  SELECT o.o_orderpriority AS priority,
         datediff('day', o.o_orderdate, MIN(l.l_shipdate)) AS t
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
),
pos AS (
  SELECT priority, t,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY t) AS i,
         CAST(COUNT(*) OVER (PARTITION BY priority) AS BIGINT) AS n
  FROM lead_t WHERE t >= 1
),
quant AS (
  SELECT priority, n,
         CAST(floor({_Q} * ln(CAST(t AS DOUBLE))) AS BIGINT) AS xq,
         CAST(floor({_Q} * ln(-ln(1.0 - (i - 0.3) / (n + 0.4))))
              AS BIGINT) AS yq
  FROM pos
),
sums AS (
  SELECT priority, MAX(n) AS n,
         SUM(CAST(xq AS HUGEINT)) AS sx,
         SUM(CAST(yq AS HUGEINT)) AS sy,
         SUM(CAST(xq AS HUGEINT) * xq) AS sxx,
         SUM(CAST(yq AS HUGEINT) * yq) AS syy,
         SUM(CAST(xq AS HUGEINT) * yq) AS sxy
  FROM quant GROUP BY priority
),
fit AS (
  SELECT priority, n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS num,
         (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS denx,
         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS deny,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM sums
),
params AS (
  SELECT priority, n,
         num / denx AS k,
         exp(-(((syd - (num / denx) * sxd) / n) / {_Q}.0)
             / (num / denx)) AS lam,
         num * num / (denx * deny) AS r2
  FROM fit WHERE denx > 0
)
SELECT priority, n AS n_orders,
       {sql_round('k', 6)} AS shape_k,
       {sql_round('lam', 4)} AS scale_days,
       {sql_round('lam * exp(ln(ln(2.0)) / k)', 4)} AS median_days,
       {sql_round('r2', 6)} AS r_squared
FROM params ORDER BY priority
"""


@register("weibull_leadtime_fit", oracle=_B211_ORACLE)
def weibull_leadtime_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull shape/scale fit of order->first-ship lead time per
    order priority, by median-rank regression (Bernard's
    F_i = (i-0.3)/(n+0.4), then OLS of ln(-ln(1-F)) on ln t): the
    parametric view of the survival family — shape k < 1 means
    infant-mortality fulfilment (fast orders ship immediately,
    stragglers worsen), k > 1 means wear-out (the longer an order
    waits the more certain shipment becomes), k = 1 collapses to
    exponential memorylessness. scale_days is the 63.2th-percentile
    life; r_squared says whether Weibull is even the right family.

    Exactness: both ln transforms are floored map-side to exact
    integer 1e-6 units (floor, not round — no half-way rounding-mode
    ambiguity), so every OLS sufficient statistic is exact 128-bit
    integer; the closed-form slope/intercept/r2 algebra is the same
    double expression tree in both engines.

    Scale shape: lineitem collapses to order grain in one aggregate,
    ranks are windows partitioned by the 5 priorities, and the
    regression consumes 5 rows of sufficient statistics — nothing
    after the first shuffle sees data volume.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("od"),
    )
    lead_t = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_shipdate").alias("sd"))
        .join(orders, "ok")
        .groupBy("ok", "priority", "od")
        .agg(F.min("sd").alias("ms"))
        .select("priority", F.datediff("ms", "od").alias("t"))
        .where(F.col("t") >= 1)
    )
    w_p = Window.partitionBy("priority")
    pos = lead_t.select(
        "priority",
        "t",
        F.row_number().over(w_p.orderBy("t")).alias("i"),
        F.count(F.lit(1)).over(w_p).cast("bigint").alias("n"),
    )
    q = float(_Q)
    quant = pos.select(
        "priority",
        "n",
        F.floor(q * F.log(F.col("t").cast("double"))).alias("xq"),
        F.floor(
            q
            * F.log(
                -F.log(1.0 - (F.col("i") - 0.3) / (F.col("n") + 0.4))
            )
        ).alias("yq"),
    )
    dec = "decimal(38,0)"
    sums = quant.groupBy("priority").agg(
        F.max("n").alias("n"),
        F.sum(F.col("xq").cast(dec)).alias("sx"),
        F.sum(F.col("yq").cast(dec)).alias("sy"),
        F.sum(F.col("xq").cast(dec) * F.col("xq")).alias("sxx"),
        F.sum(F.col("yq").cast(dec) * F.col("yq")).alias("syy"),
        F.sum(F.col("xq").cast(dec) * F.col("yq")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    fit = sums.select(
        "priority",
        "n",
        (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")).alias("num"),
        (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")).alias("denx"),
        (nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")).alias("deny"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
    ).where(F.col("denx") > 0)
    k = F.col("num") / F.col("denx")
    lam = F.exp(
        -(((F.col("syd") - k * F.col("sxd")) / F.col("n")) / q) / k
    )
    params = fit.select(
        "priority",
        "n",
        k.alias("k"),
        lam.alias("lam"),
        (F.col("num") * F.col("num") / (F.col("denx") * F.col("deny"))).alias(
            "r2"
        ),
    )
    return params.select(
        "priority",
        F.col("n").alias("n_orders"),
        round_eps(F.col("k"), 6).alias("shape_k"),
        round_eps(F.col("lam"), 4).alias("scale_days"),
        round_eps(
            F.col("lam") * F.exp(F.log(F.log(F.lit(2.0))) / F.col("k")), 4
        ).alias("median_days"),
        round_eps(F.col("r2"), 6).alias("r_squared"),
    ).orderBy("priority")


# ---------------------------------------------------------------- B212

SS_LEAD_WEEKS = 2  # replenishment lead time, in weeks
SS_Z95 = 1.6448536269514722  # Phi^-1(0.95), shared literal

_B212_ORACLE = f"""
WITH weekly AS (
  SELECT p.p_brand AS brand,
         CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', l.l_shipdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(ROUND(SUM(l.l_quantity)) AS BIGINT) AS dem
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
stats AS (
  SELECT brand, w, dem,
         CAST(COUNT(*) OVER (PARTITION BY brand) AS BIGINT) AS n,
         CAST(SUM(CAST(dem AS HUGEINT)) OVER (PARTITION BY brand)
              AS DOUBLE) AS s1,
         CAST(SUM(CAST(dem AS HUGEINT) * dem) OVER (PARTITION BY brand)
              AS DOUBLE) AS s2,
         LEAD(dem) OVER (PARTITION BY brand ORDER BY w) AS dem_next,
         LEAD(w) OVER (PARTITION BY brand ORDER BY w) AS w_next
  FROM weekly
),
priced AS (
  SELECT brand, n, s1 / n AS mu,
         sqrt(greatest((n * s2 - s1 * s1) / (n * (n - 1.0)), 0.0)) AS sigma,
         CASE WHEN w_next = w + 1 THEN dem + dem_next END AS d2
  FROM stats
),
rules AS (
  SELECT brand, n, mu, sigma,
         {SS_Z95!r} * sigma * sqrt({SS_LEAD_WEEKS}.0) AS safety,
         {SS_LEAD_WEEKS}.0 * mu
           + {SS_Z95!r} * sigma * sqrt({SS_LEAD_WEEKS}.0) AS rop,
         d2
  FROM priced
),
audit AS (
  SELECT brand, MAX(n) AS n_weeks, MAX(mu) AS mu, MAX(sigma) AS sigma,
         MAX(safety) AS safety, MAX(rop) AS rop,
         CAST(COUNT(d2) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN d2 <= rop THEN 1 ELSE 0 END) AS BIGINT)
           AS served
  FROM rules GROUP BY brand
)
SELECT brand, n_weeks,
       {sql_round('mu', 4)} AS mu_weekly,
       {sql_round('sigma', 4)} AS sigma_weekly,
       {sql_round('safety', 4)} AS safety_stock,
       {sql_round('rop', 4)} AS reorder_point,
       n_pairs,
       CASE WHEN n_pairs = 0 THEN NULL
            ELSE {sql_round('served * 100.0 / n_pairs', 4)} END
         AS svc_level_pct,
       CASE WHEN n_pairs = 0 THEN NULL
            ELSE {sql_round('served * 100.0 / n_pairs - 95.0', 4)} END
         AS svc_gap_pp
FROM audit ORDER BY brand
"""


@register("safety_stock_service", oracle=_B212_ORACLE)
def safety_stock_service(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normal-theory safety stock and reorder point per brand
    (ROP = L*mu + z95*sigma*sqrt(L) over a {SS_LEAD_WEEKS}-week
    replenishment lead), then the rule AUDITED against its own
    history: svc_level_pct is the share of observed consecutive
    {SS_LEAD_WEEKS}-week demand windows the ROP would actually have
    covered. The gap column is the point: demand that is skewed or
    autocorrelated (B48/B67's territory) breaks the iid-normal
    assumption, and the nominal 95% silently degrades — the
    distribution-free B210 newsvendor quantile is the repair.

    Exactness: weekly demands and both moment sums are exact 128-bit
    integers; mu/sigma/ROP are one identical double expression tree;
    the coverage comparison d2 <= rop happens on identical doubles.

    Scale shape: one fact-dim join to the |brands| x |weeks| frame;
    everything after — moments, the lag-1 pairing, the audit — is
    windows and one aggregate on that dimension-scale frame.
    """
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
    w_b = Window.partitionBy("brand")
    w_ord = w_b.orderBy("w")
    dec = "decimal(38,0)"
    stats = weekly.select(
        "brand",
        "w",
        "dem",
        F.count(F.lit(1)).over(w_b).cast("bigint").alias("n"),
        F.sum(F.col("dem").cast(dec)).over(w_b).cast("double").alias("s1"),
        F.sum(F.col("dem").cast(dec) * F.col("dem"))
        .over(w_b)
        .cast("double")
        .alias("s2"),
        F.lead("dem").over(w_ord).alias("dem_next"),
        F.lead("w").over(w_ord).alias("w_next"),
    )
    nd = F.col("n").cast("double")
    priced = stats.select(
        "brand",
        "n",
        (F.col("s1") / F.col("n")).alias("mu"),
        F.sqrt(
            F.greatest(
                (nd * F.col("s2") - F.col("s1") * F.col("s1"))
                / (nd * (nd - 1.0)),
                F.lit(0.0),
            )
        ).alias("sigma"),
        F.when(
            F.col("w_next") == F.col("w") + 1, F.col("dem") + F.col("dem_next")
        ).alias("d2"),
    )
    safety = SS_Z95 * F.col("sigma") * F.sqrt(F.lit(float(SS_LEAD_WEEKS)))
    rules = priced.select(
        "brand",
        "n",
        "mu",
        "sigma",
        safety.alias("safety"),
        (float(SS_LEAD_WEEKS) * F.col("mu") + safety).alias("rop"),
        "d2",
    )
    audit = rules.groupBy("brand").agg(
        F.max("n").alias("n_weeks"),
        F.max("mu").alias("mu"),
        F.max("sigma").alias("sigma"),
        F.max("safety").alias("safety"),
        F.max("rop").alias("rop"),
        F.count("d2").cast("bigint").alias("n_pairs"),
        F.sum(
            F.when(F.col("d2") <= F.col("rop"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("served"),
    )
    svc = F.col("served") * 100.0 / F.col("n_pairs")
    return audit.select(
        "brand",
        "n_weeks",
        round_eps(F.col("mu"), 4).alias("mu_weekly"),
        round_eps(F.col("sigma"), 4).alias("sigma_weekly"),
        round_eps(F.col("safety"), 4).alias("safety_stock"),
        round_eps(F.col("rop"), 4).alias("reorder_point"),
        "n_pairs",
        F.when(F.col("n_pairs") == 0, F.lit(None).cast("double"))
        .otherwise(round_eps(svc, 4))
        .alias("svc_level_pct"),
        F.when(F.col("n_pairs") == 0, F.lit(None).cast("double"))
        .otherwise(round_eps(svc - 95.0, 4))
        .alias("svc_gap_pp"),
    ).orderBy("brand")


# ---------------------------------------------------------------- C192

_C192_ORACLE = f"""
WITH lens AS (
  SELECT source,
         CAST(length(string_split_regex(text, '\\s+')) AS BIGINT) AS len
  FROM documents
),
grid AS (
  SELECT source, len, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lens GROUP BY source, len
),
quant AS (
  SELECT source, len, cnt,
         CAST(floor({_Q} * ln(CAST(len AS DOUBLE))) AS BIGINT) AS lx
  FROM grid
),
stats AS (
  SELECT source, len, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n,
         CAST(SUM(CAST(cnt AS HUGEINT) * lx) OVER (PARTITION BY source)
              AS DOUBLE) AS s1,
         CAST(SUM(CAST(cnt AS HUGEINT) * lx * lx)
                OVER (PARTITION BY source) AS DOUBLE) AS s2,
         CAST(SUM(cnt) OVER (
           PARTITION BY source ORDER BY len
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum
  FROM quant
),
fitted AS (
  SELECT source, len, cnt, n, cum,
         (s1 / n) / {_Q}.0 AS mu,
         sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) / {_Q}.0 AS sigma
  FROM stats
),
dists AS (
  SELECT source, n, mu, sigma,
         greatest(
           abs(cum * 1.0 / n
               - {sql_normal_cdf('(ln(CAST(len AS DOUBLE)) - mu) / sigma')}),
           abs((cum - cnt) * 1.0 / n
               - {sql_normal_cdf('(ln(CAST(len AS DOUBLE)) - mu) / sigma')})
         ) AS d_t
  FROM fitted WHERE sigma > 0
)
SELECT source, MAX(n) AS n_docs,
       {sql_round('MAX(mu)', 6)} AS mu_log,
       {sql_round('MAX(sigma)', 6)} AS sigma_log,
       {sql_round('exp(MAX(mu))', 4)} AS median_len,
       {sql_round('exp(MAX(mu) + MAX(sigma) * MAX(sigma) / 2.0)', 4)}
         AS mean_len,
       {sql_round('MAX(d_t)', 6)} AS ks_distance
FROM dists GROUP BY source ORDER BY source
"""


@register("doc_length_lognormal", oracle=_C192_ORACLE)
def doc_length_lognormal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal fit of per-document token counts per source (MLE
    mu/sigma on ln length) with the exact Kolmogorov-Smirnov distance
    between the empirical length CDF and the fitted curve, evaluated
    at both step limits of every distinct length. Document lengths
    are the canonical lognormal; packing efficiency, truncation loss
    (C-track sequence planners) and stratified sampling all assume
    it. A source whose ks_distance is an outlier has a length mixture
    (template short-docs + scraped long-docs) that per-source
    mean/median summaries hide.

    Exactness: ln lengths are floored map-side to exact integer 1e-6
    units so both moment sums are 128-bit-integer exact; the KS grid
    compares exact cum/n rationals against the shared A&S erf
    polynomial (functions/stats.py) — the same double expression
    tree in both engines.

    Scale shape: one corpus scan collapses to the (source, distinct
    length) grid; moments, the CDF ladder, and the KS max are
    windows and one aggregate on that bounded frame. The global max
    length grid per source is |distinct lengths| <= a few thousand
    rows regardless of corpus size.
    """
    lens = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("len"),
    )
    grid = lens.groupBy("source", "len").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    q = float(_Q)
    quant = grid.select(
        "source",
        "len",
        "cnt",
        F.floor(q * F.log(F.col("len").cast("double"))).alias("lx"),
    )
    w_s = Window.partitionBy("source")
    w_cum = w_s.orderBy("len").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = "decimal(38,0)"
    stats = quant.select(
        "source",
        "len",
        "cnt",
        F.sum("cnt").over(w_s).cast("bigint").alias("n"),
        F.sum(F.col("cnt").cast(dec) * F.col("lx"))
        .over(w_s)
        .cast("double")
        .alias("s1"),
        F.sum(F.col("cnt").cast(dec) * F.col("lx") * F.col("lx"))
        .over(w_s)
        .cast("double")
        .alias("s2"),
        F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
    )
    nd = F.col("n").cast("double")
    fitted = stats.select(
        "source",
        "len",
        "cnt",
        "n",
        "cum",
        ((F.col("s1") / F.col("n")) / q).alias("mu"),
        (
            F.sqrt(
                F.greatest(
                    F.col("s2") / nd
                    - (F.col("s1") / nd) * (F.col("s1") / nd),
                    F.lit(0.0),
                )
            )
            / q
        ).alias("sigma"),
    )
    phi = normal_cdf(
        (F.log(F.col("len").cast("double")) - F.col("mu")) / F.col("sigma")
    )
    dists = fitted.where(F.col("sigma") > 0).select(
        "source",
        "n",
        "mu",
        "sigma",
        F.greatest(
            F.abs(F.col("cum") * 1.0 / F.col("n") - phi),
            F.abs((F.col("cum") - F.col("cnt")) * 1.0 / F.col("n") - phi),
        ).alias("d_t"),
    )
    return (
        dists.groupBy("source")
        .agg(
            F.max("n").alias("n_docs"),
            F.max("mu").alias("mu"),
            F.max("sigma").alias("sigma"),
            F.max("d_t").alias("d_max"),
        )
        .select(
            "source",
            "n_docs",
            round_eps(F.col("mu"), 6).alias("mu_log"),
            round_eps(F.col("sigma"), 6).alias("sigma_log"),
            round_eps(F.exp(F.col("mu")), 4).alias("median_len"),
            round_eps(
                F.exp(F.col("mu") + F.col("sigma") * F.col("sigma") / 2.0), 4
            ).alias("mean_len"),
            round_eps(F.col("d_max"), 6).alias("ks_distance"),
        )
        .orderBy("source")
    )
