"""Sixty-third sweep (SURVEY.md §2 B117-B118, C133).

Hodges-Lehmann pseudomedian (the robust location estimator that
completes the B91/B92 nonparametric family — it IS the estimator the
Wilcoxon/Mann-Whitney test inverts), lead-lag cross-correlation
between the order and event weekly series (does activity LEAD
bookings? — the causal-direction screen before B58's diff-in-diff),
and a right-to-be-forgotten cascade-delete audit (the privacy
compliance op next to C124/C129: who is affected, across every table,
with post-delete checksums).
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

# ---------------------------------------------------------------- B117

_B117_ORACLE = f"""
WITH weekly AS (
  SELECT DATE_TRUNC('week', o_orderdate) AS wk,
         CAST(COUNT(*) AS BIGINT) AS vol
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT a.vol + b.vol AS s2
  FROM weekly a JOIN weekly b ON a.wk <= b.wk
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         quantile_cont(s2, 0.5) / 2.0 AS hl
  FROM pairs
),
plain AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
         quantile_cont(vol, 0.5) AS med,
         AVG(vol) AS mn
  FROM weekly
)
SELECT p.n_weeks, s.n_pairs,
       {sql_round('s.hl', 6)} AS hl_estimate,
       {sql_round('p.med', 6)} AS plain_median,
       {sql_round('p.mn', 6)} AS mean
FROM stats s CROSS JOIN plain p
"""


@register("hodges_lehmann", oracle=_B117_ORACLE)
def hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudomedian of weekly order volume: the median
    of all pairwise Walsh averages (v_i+v_j)/2, i ≤ j — the location
    estimator the Wilcoxon signed-rank test inverts, ~95% efficient
    under normality yet 0.29-breakdown robust (the median is only 64%
    efficient; the mean has zero breakdown). Reported next to the
    plain median and mean so the three tell the robustness story.
    Completes the nonparametric family: B91 tests, B92 fits trends,
    this estimates location.

    Scale shape: the fact stream collapses to |weeks| rows in ONE
    aggregate; the O(|weeks|²) Walsh-average expansion and exact
    median are dimension-scale (pair sums stay integer — the /2
    happens once at the end). At daily/user grain you'd swap the
    exact median for approx_percentile over the same pair stream —
    executable via SPARK_GRAFT_SCALE_MODE=approx (scale_mode.py).
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("wk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("vol"))
    )
    weekly = weekly.persist()
    a = weekly.select(F.col("wk").alias("wa"), F.col("vol").alias("va"))
    b = weekly.select(F.col("wk").alias("wb"), F.col("vol").alias("vb"))
    pairs = a.join(b, F.col("wa") <= F.col("wb")).select(
        (F.col("va") + F.col("vb")).alias("s2")
    )
    stats = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (sm.percentile("s2", 0.5) / 2.0).alias("hl"),
    )
    plain = weekly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_weeks"),
        sm.percentile("vol", 0.5).alias("med"),
        F.avg("vol").alias("mn"),
    )
    return stats.transform(scalars(plain)).select(
        "n_weeks",
        "n_pairs",
        round_eps(F.col("hl"), 6).alias("hl_estimate"),
        round_eps(F.col("med"), 6).alias("plain_median"),
        round_eps(F.col("mn"), 6).alias("mean"),
    )


# ---------------------------------------------------------------- B118

XCORR_MAX_LAG = 4

_B118_ORACLE = f"""
WITH ow AS (
  SELECT DATE_TRUNC('day', ts) AS wk,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS o_vol
  FROM events GROUP BY 1
),
ew AS (
  SELECT DATE_TRUNC('day', ts) AS wk,
         CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
           AS e_vol
  FROM events GROUP BY 1
),
oi AS (SELECT ROW_NUMBER() OVER (ORDER BY wk) AS i, wk, o_vol FROM ow),
ei AS (SELECT wk, e_vol FROM ew),
joined AS (
  SELECT o.i, o.o_vol, e.e_vol FROM oi o JOIN ei e USING (wk)
),
lagged AS (
  SELECT l.lag, a.o_vol AS x, b.e_vol AS y
  FROM (SELECT UNNEST(GENERATE_SERIES(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG}))
          AS lag) l
  JOIN joined a ON TRUE
  JOIN joined b ON b.i = a.i + l.lag
),
suff AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM lagged GROUP BY lag
)
SELECT lag, n,
       {sql_round(
           '(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * 1.0'
           ' * (n * syy - sy * sy))', 6)} AS r
FROM suff
WHERE n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY lag
"""


@register("xcorr_lead_lag", oracle=_B118_ORACLE)
def xcorr_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between daily view activity and
    daily purchase volume at lags −4..+4 (r at lag k correlates
    purchases on day i with views on day i+k): the screen for
    whether browsing LEADS buying (peak at positive lag) or trails
    it — run before B58's diff-in-diff or B57's trend regressions
    assume a direction. B93's ACF is this at x=y; the cross-series
    form is the one that answers which-way-does-the-arrow-point.

    Scale shape: the fact stream collapses to |days| rows in ONE
    conditional aggregate (both series in one pass); the 9-lag banded
    self-join and the per-lag Pearson sufficient statistics (exact
    BIGINTs) are dimension-scale, one combined aggregate for all
    lags.
    """
    weekly = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("wk"))
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("o_vol"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("bigint")
            .alias("e_vol"),
        )
    )
    joined = weekly.withColumn(
        "i", F.row_number().over(Window.orderBy("wk"))
    ).select("i", "o_vol", "e_vol")
    joined = joined.persist()
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = joined.select("i", F.col("o_vol").alias("x"))
    b = joined.select(F.col("i").alias("j"), F.col("e_vol").alias("y"))
    lagged = (
        a.transform(scalars(lags))
        .join(b, F.col("j") == F.col("i") + F.col("lag"))
        .select("lag", "x", "y")
    )
    suff = lagged.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * 1.0
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        suff.where(
            (F.col("n") >= 3)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
            & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
        )
        .select("lag", "n", round_eps(r, 6).alias("r"))
        .orderBy("lag")
    )


# ---------------------------------------------------------------- C133

FORGET_MOD = 97  # forget users/customers whose id % 97 == 0

_C133_ORACLE = f"""
WITH ev AS (
  SELECT CAST(COUNT(*) FILTER (WHERE user_id % {FORGET_MOD} = 0) AS BIGINT)
           AS n_forgotten,
         CAST(COUNT(*) FILTER (WHERE user_id % {FORGET_MOD} <> 0) AS BIGINT)
           AS n_remaining,
         CAST(SUM(CASE WHEN user_id % {FORGET_MOD} <> 0 THEN
              {sql_hash64("'ev:' || event_id::VARCHAR")} % 1000000007
              ELSE 0 END) AS BIGINT) AS remaining_checksum
  FROM events
),
cu AS (
  SELECT CAST(COUNT(*) FILTER (WHERE c_custkey % {FORGET_MOD} = 0) AS BIGINT)
           AS n_forgotten,
         CAST(COUNT(*) FILTER (WHERE c_custkey % {FORGET_MOD} <> 0) AS BIGINT)
           AS n_remaining,
         CAST(SUM(CASE WHEN c_custkey % {FORGET_MOD} <> 0 THEN
              {sql_hash64("'cu:' || c_custkey::VARCHAR")} % 1000000007
              ELSE 0 END) AS BIGINT) AS remaining_checksum
  FROM customer
),
od AS (
  SELECT CAST(COUNT(*) FILTER (WHERE o_custkey % {FORGET_MOD} = 0) AS BIGINT)
           AS n_forgotten,
         CAST(COUNT(*) FILTER (WHERE o_custkey % {FORGET_MOD} <> 0) AS BIGINT)
           AS n_remaining,
         CAST(SUM(CASE WHEN o_custkey % {FORGET_MOD} <> 0 THEN
              {sql_hash64("'od:' || o_orderkey::VARCHAR")} % 1000000007
              ELSE 0 END) AS BIGINT) AS remaining_checksum
  FROM orders
),
li AS (
  SELECT CAST(COUNT(*) FILTER (WHERE o.o_custkey % {FORGET_MOD} = 0) AS BIGINT)
           AS n_forgotten,
         CAST(COUNT(*) FILTER (WHERE o.o_custkey % {FORGET_MOD} <> 0) AS BIGINT)
           AS n_remaining,
         CAST(SUM(CASE WHEN o.o_custkey % {FORGET_MOD} <> 0 THEN
              {sql_hash64(
                  "'li:' || l.l_orderkey::VARCHAR || ':' ||"
                  " l.l_linenumber::VARCHAR")} % 1000000007
              ELSE 0 END) AS BIGINT) AS remaining_checksum
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT 'events' AS tbl, * FROM ev
UNION ALL SELECT 'customer', * FROM cu
UNION ALL SELECT 'orders', * FROM od
UNION ALL SELECT 'lineitem', * FROM li
ORDER BY tbl
"""


def _audit(df: DataFrame, forget: F.Column, row_hash: F.Column) -> DataFrame:
    return df.agg(
        F.sum(F.when(forget, 1).otherwise(0)).cast("bigint").alias(
            "n_forgotten"
        ),
        F.sum(F.when(forget, 0).otherwise(1)).cast("bigint").alias(
            "n_remaining"
        ),
        F.sum(F.when(forget, 0).otherwise(row_hash % 1000000007))
        .cast("bigint")
        .alias("remaining_checksum"),
    )


@register("forget_user_cascade", oracle=_C133_ORACLE)
def forget_user_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: for a deterministic
    deletion cohort (ids ≡ 0 mod 97), the per-table impact across the
    whole foreign-key cascade — events by user, customers by key,
    orders by owning customer, lineitems THROUGH their order — with
    rows-forgotten, rows-remaining and an order-independent checksum
    of the surviving rows (the before/after proof a deletion job
    actually converged, B87's checksum applied to the erasure
    workflow). The third leg of the privacy family: C124 audits
    identifiability, C129 releases privately, this erases.

    Scale shape: three of the four audits are single map-side
    conditional aggregates (the forget predicate is a pure projection
    of the row's own key); only lineitem needs its order's customer —
    one equi-join that at 100 TB rides the same orderkey
    co-partitioning every lineitem⋈orders query uses. Checksums are
    additive, so every aggregate map-side combines.
    """
    forget = lambda c: F.col(c) % FORGET_MOD == 0  # noqa: E731
    ev = _audit(
        load_table(spark, sf_dir, "events").select("user_id", "event_id"),
        forget("user_id"),
        hash64(F.concat(F.lit("ev:"), F.col("event_id").cast("string"))),
    ).withColumn("tbl", F.lit("events"))
    cu = _audit(
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        forget("c_custkey"),
        hash64(F.concat(F.lit("cu:"), F.col("c_custkey").cast("string"))),
    ).withColumn("tbl", F.lit("customer"))
    od = _audit(
        load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey"),
        forget("o_custkey"),
        hash64(F.concat(F.lit("od:"), F.col("o_orderkey").cast("string"))),
    ).withColumn("tbl", F.lit("orders"))
    li_rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .join(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    li = _audit(
        li_rows,
        forget("o_custkey"),
        hash64(
            F.concat(
                F.lit("li:"),
                F.col("l_orderkey").cast("string"),
                F.lit(":"),
                F.col("l_linenumber").cast("string"),
            )
        ),
    ).withColumn("tbl", F.lit("lineitem"))
    cols = ["tbl", "n_forgotten", "n_remaining", "remaining_checksum"]
    return (
        ev.select(cols)
        .unionByName(cu.select(cols))
        .unionByName(od.select(cols))
        .unionByName(li.select(cols))
        .orderBy("tbl")
    )
