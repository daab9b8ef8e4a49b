"""Hundred-sixteenth sweep (SURVEY.md §2 B215-B217, C195).

Empirical-Bayes beta-binomial shrinkage of per-nation rates (the
small-sample league-table repair ranking raw rates gets wrong),
negative-binomial overdispersion with the zero-inflation check on the
DENSE week grid (Poisson assumptions size every buffer in the B-track;
this says whether they hold and whether zeros exceed even NB), gamma
method-of-moments on order values with the implied-vs-observed
skewness gap (is the two-parameter family even adequate), and an
ingest-order autocorrelation audit (sorted/clustered writes break the
IID-batch assumption every sampler and splitter in the C-track makes).
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

# ---------------------------------------------------------------- B215

_B215_ORACLE = f"""
WITH raw AS (
  SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                       THEN 1 ELSE 0 END) AS BIGINT) AS x_i
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
prior AS (
  SELECT nation, n_i, x_i, x_i * 1.0 / n_i AS p_i,
         CAST(COUNT(*) OVER () AS BIGINT) AS g,
         SUM(x_i * 1.0 / n_i) OVER () AS sp,
         SUM((x_i * 1.0 / n_i) * (x_i * 1.0 / n_i)) OVER () AS sp2
  FROM raw
),
fitted AS (
  SELECT nation, n_i, x_i, p_i,
         sp / g AS m,
         greatest(
           (sp / g) * (1.0 - sp / g)
             / ((g * sp2 - sp * sp) / (g * (g - 1.0))) - 1.0,
           0.0) AS kk
  FROM prior
),
shrunk AS (
  SELECT nation, n_i, x_i, p_i, m, kk,
         (x_i + m * kk) / (n_i + kk) AS p_eb,
         n_i / (n_i + kk) AS w_data
  FROM fitted
)
SELECT nation, n_i AS n_orders, x_i AS n_urgent,
       {sql_round('p_i * 100.0', 4)} AS raw_rate_pct,
       {sql_round('p_eb * 100.0', 4)} AS eb_rate_pct,
       {sql_round('w_data', 4)} AS data_weight,
       CAST(ROW_NUMBER() OVER (ORDER BY p_i DESC, nation) AS BIGINT)
         AS rank_raw,
       CAST(ROW_NUMBER() OVER (ORDER BY p_eb DESC, nation) AS BIGINT)
         AS rank_eb
FROM shrunk ORDER BY nation
"""


@register("eb_shrinkage_rates", oracle=_B215_ORACLE)
def eb_shrinkage_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-nation urgent-
    order rates: a method-of-moments beta prior (alpha+beta = K from
    the across-nation rate variance, floored at 0) pulls each raw
    rate toward the grand mean with weight K/(n_i+K) — the classic
    league-table repair: small-sample nations dominate the extremes
    of the RAW ranking by noise alone, and rank_raw vs rank_eb shows
    exactly which positions were luck. data_weight ~ 1 means the
    nation earned its rank with volume.

    Exactness: counts are exact integers; the prior's moment fit and
    every shrunken rate are one identical double expression tree
    over the 25-row frame (variance from sums-of-squares, not an
    engine variance builtin, so fold algebra matches).

    Scale shape: two broadcast dim joins, one fact-grain aggregate
    to |nations| sufficient-statistic rows; the prior fit and both
    rankings are windows on that 25-row frame.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("urgent"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation")
    )
    raw = (
        orders.join(F.broadcast(cust), "ck")
        .join(F.broadcast(nat), "nk")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum("urgent").cast("bigint").alias("x_i"),
        )
    )
    w_all = Window.partitionBy()
    p_i = F.col("x_i") * 1.0 / F.col("n_i")
    prior = raw.select(
        "nation",
        "n_i",
        "x_i",
        p_i.alias("p_i"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("g"),
        F.sum(p_i).over(w_all).alias("sp"),
        F.sum(p_i * p_i).over(w_all).alias("sp2"),
    )
    g, sp, sp2 = F.col("g"), F.col("sp"), F.col("sp2")
    m = sp / g
    var = (g * sp2 - sp * sp) / (g * (g - 1.0))
    kk = F.greatest(m * (1.0 - m) / var - 1.0, F.lit(0.0))
    shrunk = prior.select(
        "nation",
        "n_i",
        "x_i",
        "p_i",
        m.alias("m"),
        kk.alias("kk"),
        ((F.col("x_i") + m * kk) / (F.col("n_i") + kk)).alias("p_eb"),
        (F.col("n_i") / (F.col("n_i") + kk)).alias("w_data"),
    )
    return shrunk.select(
        "nation",
        F.col("n_i").alias("n_orders"),
        F.col("x_i").alias("n_urgent"),
        round_eps(F.col("p_i") * 100.0, 4).alias("raw_rate_pct"),
        round_eps(F.col("p_eb") * 100.0, 4).alias("eb_rate_pct"),
        round_eps(F.col("w_data"), 4).alias("data_weight"),
        F.row_number()
        .over(Window.orderBy(F.col("p_i").desc(), "nation"))
        .cast("bigint")
        .alias("rank_raw"),
        F.row_number()
        .over(Window.orderBy(F.col("p_eb").desc(), "nation"))
        .cast("bigint")
        .alias("rank_eb"),
    ).orderBy("nation")


# ---------------------------------------------------------------- B216

_B216_ORACLE = f"""
WITH weekly AS (
  SELECT p.p_brand AS brand,
         CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', l.l_shipdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
grid AS (
  SELECT b.brand, wk.w, COALESCE(weekly.c, 0) AS c
  FROM (SELECT DISTINCT brand FROM weekly) b
  CROSS JOIN (SELECT DISTINCT w FROM weekly) wk
  LEFT JOIN weekly ON weekly.brand = b.brand AND weekly.w = wk.w
),
moments AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS s2,
         CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
  FROM grid GROUP BY brand
),
fitted AS (
  SELECT brand, n, zeros, s1 / n AS mu,
         (n * s2 - s1 * s1) / (n * (n - 1.0)) AS v
  FROM moments
)
SELECT brand, n AS n_weeks, zeros AS zero_weeks,
       {sql_round('mu', 4)} AS mu_weekly,
       {sql_round('v', 4)} AS var_weekly,
       {sql_round('v / mu', 4)} AS dispersion_index,
       {sql_round('exp(-mu)', 6)} AS p0_poisson,
       {sql_round(
           'CASE WHEN v > mu THEN'
           ' exp((mu * mu / (v - mu))'
           '     * ln((mu * mu / (v - mu)) / ((mu * mu / (v - mu)) + mu)))'
           ' ELSE exp(-mu) END', 6)} AS p0_nbinom,
       {sql_round('zeros * 1.0 / n', 6)} AS p0_observed,
       {sql_round(
           'zeros * 1.0 / n'
           ' - CASE WHEN v > mu THEN'
           ' exp((mu * mu / (v - mu))'
           '     * ln((mu * mu / (v - mu)) / ((mu * mu / (v - mu)) + mu)))'
           ' ELSE exp(-mu) END', 6)} AS excess_zeros_vs_nb
FROM fitted ORDER BY brand
"""


@register("nbinom_zero_inflation", oracle=_B216_ORACLE)
def nbinom_zero_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial overdispersion fit of weekly order-line
    counts per brand on the DENSE week grid (missing weeks ARE
    zeros — skipping them is how zero-inflation goes unnoticed):
    dispersion index var/mean, the method-of-moments NB size
    r = mu^2/(var-mu), and three P(zero-week) columns — Poisson,
    NB, observed. Poisson P(0) collapses for any real demand series
    (dispersion > 1); excess_zeros_vs_nb > 0 says even NB can't
    explain the dry weeks and a zero-inflated/hurdle model (or a
    structural cause: listing gaps, stockouts) is indicated. When
    var <= mu the NB column degrades to its Poisson limit rather
    than a NULL.

    Exactness: the dense grid and both moment sums are exact
    integers (128-bit squares); every fitted quantity including the
    exp/ln NB zero mass is one identical double tree.

    Scale shape: one fact-dim join to (brand, week) counts; the
    dense grid is |brands| x |weeks| built from two DISTINCT frames
    of that aggregate (no second fact scan); moments are one
    aggregate over the grid.
    """
    weekly = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("pk"), F.col("l_shipdate").alias("sd")
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
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    weekly = weekly.persist()
    brands = weekly.select("brand").distinct()
    weeks = weekly.select("w").distinct()
    grid = (
        attach_scalars(brands, weeks)
        .join(weekly, ["brand", "w"], "left")
        .select("brand", "w", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    dec = "decimal(38,0)"
    moments = grid.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("c").cast(dec)).cast("double").alias("s1"),
        F.sum(F.col("c").cast(dec) * F.col("c")).cast("double").alias("s2"),
        F.sum(F.when(F.col("c") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("zeros"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s1") / F.col("n")
    v = (nd * F.col("s2") - F.col("s1") * F.col("s1")) / (nd * (nd - 1.0))
    fitted = moments.select(
        "brand", "n", "zeros", mu.alias("mu"), v.alias("v")
    )
    r = F.col("mu") * F.col("mu") / (F.col("v") - F.col("mu"))
    p0_nb = F.when(
        F.col("v") > F.col("mu"),
        F.exp(r * F.log(r / (r + F.col("mu")))),
    ).otherwise(F.exp(-F.col("mu")))
    return fitted.select(
        "brand",
        F.col("n").alias("n_weeks"),
        F.col("zeros").alias("zero_weeks"),
        round_eps(F.col("mu"), 4).alias("mu_weekly"),
        round_eps(F.col("v"), 4).alias("var_weekly"),
        round_eps(F.col("v") / F.col("mu"), 4).alias("dispersion_index"),
        round_eps(F.exp(-F.col("mu")), 6).alias("p0_poisson"),
        round_eps(p0_nb, 6).alias("p0_nbinom"),
        round_eps(F.col("zeros") * 1.0 / F.col("n"), 6).alias("p0_observed"),
        round_eps(F.col("zeros") * 1.0 / F.col("n") - p0_nb, 6).alias(
            "excess_zeros_vs_nb"
        ),
    ).orderBy("brand")


# ---------------------------------------------------------------- B217

_B217_ORACLE = f"""
WITH cents AS (
  SELECT c.c_mktsegment AS segment,
         CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
moments AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2,
         CAST(SUM(CAST(x AS HUGEINT) * x * x) AS DOUBLE) AS s3
  FROM cents GROUP BY segment
),
fitted AS (
  SELECT segment, n, s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3.0 * (s1 / n) * (s2 / n)
           + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3
  FROM moments
)
SELECT segment, n AS n_orders,
       {sql_round('mu / 100.0', 4)} AS mean_value,
       {sql_round('mu * mu / m2', 4)} AS shape_k,
       {sql_round('(m2 / mu) / 100.0', 4)} AS scale_theta,
       {sql_round('sqrt(m2) / mu', 6)} AS cv,
       {sql_round('m3 / (m2 * sqrt(m2))', 6)} AS skew_observed,
       {sql_round('2.0 / sqrt(mu * mu / m2)', 6)} AS skew_gamma_implied,
       {sql_round('m3 / (m2 * sqrt(m2))'
                  ' - 2.0 / sqrt(mu * mu / m2)', 6)} AS skew_gap
FROM fitted ORDER BY segment
"""


@register("gamma_value_fit", oracle=_B217_ORACLE)
def gamma_value_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma method-of-moments fit of order values per market segment
    (shape k = mu^2/m2, scale theta = m2/mu) with the adequacy check
    the two-parameter fit can't see about itself: a gamma with the
    fitted k implies skewness 2/sqrt(k), and skew_gap lays that
    against the exact observed third moment. Near-zero gap means
    gamma is a faithful value model (pricing/simulation can sample
    from it); a large positive gap means the tail is heavier than
    gamma and percentile-based rules (B-track VaR/ES) must stay
    empirical. The money twin of C192's lognormal-on-lengths.

    Exactness: count/sum/square/cube sufficient statistics are exact
    128-bit integers off one pass (cents cubed stays well inside
    decimal38 headroom at any realistic scale); all fitted algebra
    is one identical double tree.

    Scale shape: one broadcast dim join, one fact-grain aggregate to
    |segments| sufficient-statistic rows, O(1) algebra after.
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
    )
    dec = "decimal(38,0)"
    moments = cents.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("s1"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast("double").alias("s2"),
        F.sum(F.col("x").cast(dec) * F.col("x") * F.col("x"))
        .cast("double")
        .alias("s3"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = (
        F.col("s3") / F.col("n")
        - 3.0 * mu * (F.col("s2") / F.col("n"))
        + 2.0 * mu * mu * mu
    )
    fitted = moments.select(
        "segment", "n", mu.alias("mu"), m2.alias("m2"), m3.alias("m3")
    )
    k = F.col("mu") * F.col("mu") / F.col("m2")
    skew_obs = F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))
    return fitted.select(
        "segment",
        F.col("n").alias("n_orders"),
        round_eps(F.col("mu") / 100.0, 4).alias("mean_value"),
        round_eps(k, 4).alias("shape_k"),
        round_eps((F.col("m2") / F.col("mu")) / 100.0, 4).alias(
            "scale_theta"
        ),
        round_eps(F.sqrt(F.col("m2")) / F.col("mu"), 6).alias("cv"),
        round_eps(skew_obs, 6).alias("skew_observed"),
        round_eps(2.0 / F.sqrt(k), 6).alias("skew_gamma_implied"),
        round_eps(skew_obs - 2.0 / F.sqrt(k), 6).alias("skew_gap"),
    ).orderBy("segment")


# ---------------------------------------------------------------- C195

_C195_ORACLE = f"""
WITH lens AS (
  SELECT source, doc_id,
         CAST(length(string_split_regex(text, '\\s+')) AS BIGINT) AS l
  FROM documents
),
paired AS (
  SELECT source, l,
         LEAD(l) OVER (PARTITION BY source ORDER BY doc_id) AS l_next,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM lens
),
sums AS (
  SELECT source, MAX(n) AS n,
         CAST(SUM(CAST(l AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l AS HUGEINT) * l) AS DOUBLE) AS s2,
         CAST(SUM(CASE WHEN l_next IS NOT NULL
                       THEN CAST(l AS HUGEINT) * l_next
                       ELSE CAST(0 AS HUGEINT) END) AS DOUBLE) AS s11,
         CAST(SUM(CASE WHEN rn = 1 OR l_next IS NULL
                       THEN CAST(l AS HUGEINT)
                       ELSE CAST(0 AS HUGEINT) END) AS DOUBLE) AS ends
  FROM paired GROUP BY source
),
corr AS (
  SELECT source, n,
         s1 / n AS lbar,
         (s11 - (s1 / n) * (2.0 * s1 - ends)
            + (n - 1.0) * (s1 / n) * (s1 / n))
           / (s2 - s1 * s1 / n) AS r1
  FROM sums
)
SELECT source, n AS n_docs,
       {sql_round('lbar', 4)} AS mean_len,
       {sql_round('r1', 6)} AS lag1_autocorr,
       {sql_round('r1 * sqrt(n)', 4)} AS z_score,
       {sql_round('2.0 * ' + sql_normal_sf_abs('r1 * sqrt(n)'), 6)}
         AS p_value
FROM corr ORDER BY source
"""


@register("ingest_order_autocorr", oracle=_C195_ORACLE)
def ingest_order_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of document token length in doc_id
    (ingest) order, per source, with the sqrt(n)-scaled z and
    two-sided p: every sampler, train/val splitter, and streaming
    batcher in the C-track assumes stored order is exchangeable —
    crawls written in site order, sorted compactions, or sharded
    appends leave neighbouring docs correlated, and batches drawn by
    position are then biased (batch-length variance inflates by the
    same factor B201-style CI corrections fight). r1 ~ 0 clears the
    assumption; a significant r1 says shuffle before you sample.

    Exactness: lengths and all cross-products are exact 128-bit
    integers; the end-effect correction (first/last rows enter the
    denominator but only interior pairs the numerator) is carried
    exactly via one flagged sum; one identical double tree after.

    Scale shape: map-side lengths, one window partitioned by source
    in doc_id order (the same sort a range-partitioned write gives
    for free), one aggregate to |sources| rows.
    """
    lens = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("l"),
    )
    w_s = Window.partitionBy("source")
    w_ord = w_s.orderBy("doc_id")
    paired = lens.select(
        "source",
        "l",
        F.lead("l").over(w_ord).alias("l_next"),
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_s).cast("bigint").alias("n"),
    )
    dec = "decimal(38,0)"
    zero = F.lit(0).cast(dec)
    sums = paired.groupBy("source").agg(
        F.max("n").alias("n"),
        F.sum(F.col("l").cast(dec)).cast("double").alias("s1"),
        F.sum(F.col("l").cast(dec) * F.col("l")).cast("double").alias("s2"),
        F.sum(
            F.when(
                F.col("l_next").isNotNull(),
                F.col("l").cast(dec) * F.col("l_next"),
            ).otherwise(zero)
        )
        .cast("double")
        .alias("s11"),
        F.sum(
            F.when(
                (F.col("rn") == 1) | F.col("l_next").isNull(),
                F.col("l").cast(dec),
            ).otherwise(zero)
        )
        .cast("double")
        .alias("ends"),
    )
    nd = F.col("n").cast("double")
    lbar = F.col("s1") / F.col("n")
    r1 = (
        F.col("s11")
        - lbar * (2.0 * F.col("s1") - F.col("ends"))
        + (nd - 1.0) * lbar * lbar
    ) / (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
    corr = sums.select(
        "source", "n", lbar.alias("lbar"), r1.alias("r1")
    )
    z = F.col("r1") * F.sqrt(nd)
    return corr.select(
        "source",
        F.col("n").alias("n_docs"),
        round_eps(F.col("lbar"), 4).alias("mean_len"),
        round_eps(F.col("r1"), 6).alias("lag1_autocorr"),
        round_eps(z, 4).alias("z_score"),
        round_eps(2.0 * normal_sf_abs(z), 6).alias("p_value"),
    ).orderBy("source")
