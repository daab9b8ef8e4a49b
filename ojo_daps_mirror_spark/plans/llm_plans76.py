"""Seventy-sixth sweep (SURVEY.md §2 B138-B139, C151).

Gumbel extreme-value return level over daily block maxima (the
tail-risk number B110's anomaly flags can't give: "what daily max
should we see once per 100 days"), delta-method ratio-metric A/B
inference (the variance correction every per-user ratio metric
needs — naive SE on revenue-per-purchase is simply wrong), and the
cross-language label-noise audit (identical content carrying
different lang labels — the dedup-adjacent label-quality check
C3's classifier output feeds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B138

EULER_GAMMA = 0.5772156649015329
GUMBEL_T = 100  # return period, days

_B138_ORACLE = f"""
WITH daily_max AS (
  SELECT o_orderdate AS d,
         CAST(MAX(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS mx
  FROM orders GROUP BY o_orderdate
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mx) AS BIGINT) AS s1,
         SUM((mx * 1.0) * mx) AS s2
  FROM daily_max
),
fit AS (
  SELECT n,
         s1 * 1.0 / n AS m,
         sqrt((s2 - (s1 * 1.0 / n) * s1) / (n - 1)) AS sd
  FROM sums
),
params AS (
  SELECT n, m, sd,
         sd * sqrt(6.0) / pi() AS beta,
         m - {EULER_GAMMA!r} * (sd * sqrt(6.0) / pi()) AS mu
  FROM fit
)
SELECT n AS n_days,
       {sql_round('m / 100.0', 4)} AS mean_daily_max,
       {sql_round('mu / 100.0', 4)} AS gumbel_mu,
       {sql_round('beta / 100.0', 4)} AS gumbel_beta,
       {sql_round(
           f'(mu - beta * ln(-ln(1.0 - 1.0 / {GUMBEL_T}))) / 100.0', 4)}
         AS return_level_{GUMBEL_T}d
FROM params
"""


@register("gumbel_return_level", oracle=_B138_ORACLE)
def gumbel_return_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel (EV-I) fit over daily block maxima of order value by
    method of moments (β = s√6/π, μ = m − γβ) and the {GUMBEL_T}-day
    return level μ − β·ln(−ln(1−1/T)) — classical extreme-value
    theory's answer to "what peak should capacity planning expect
    once per {GUMBEL_T} days", which mean/quantile monitoring (B110)
    structurally cannot extrapolate.

    Scale shape: one fact-grain MAX aggregate to the daily-maxima
    frame (map-side combined), one reduction to exact-integer moment
    sums, O(1) closed-form algebra. The variance uses the
    Σx²−(Σx)²/n identity on exact cents so both engines fit from
    identical numbers.
    """
    daily_max = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.max(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("mx")
        )
    )
    sums = daily_max.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mx").cast("bigint").alias("s1"),
        F.sum((F.col("mx") * 1.0) * F.col("mx")).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    m = s1 * 1.0 / n
    sd = F.sqrt((s2 - m * s1) / (n - 1))
    beta = sd * F.sqrt(F.lit(6.0)) / F.lit(3.141592653589793)
    mu = m - EULER_GAMMA * beta
    rl = mu - beta * F.log(-F.log(1.0 - 1.0 / F.lit(GUMBEL_T)))
    return sums.select(
        n.alias("n_days"),
        round_eps(m / 100.0, 4).alias("mean_daily_max"),
        round_eps(mu / 100.0, 4).alias("gumbel_mu"),
        round_eps(beta / 100.0, 4).alias("gumbel_beta"),
        round_eps(rl / 100.0, 4).alias(f"return_level_{GUMBEL_T}d"),
    )


# ---------------------------------------------------------------- B139

_B139_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100 + 1e-9) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
arm_stats AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM((x * 1.0) * x) AS sxx,
         SUM((y * 1.0) * y) AS syy,
         SUM((x * 1.0) * y) AS sxy
  FROM per_user GROUP BY arm
),
delta AS (
  SELECT arm, n,
         sx * 1.0 / sy AS r,
         (1.0 / (n * (sy * 1.0 / n) * (sy * 1.0 / n)))
         * ( (sxx - (sx * 1.0) * sx / n) / (n - 1)
             - 2 * (sx * 1.0 / sy)
               * ((sxy - (sx * 1.0) * sy / n) / (n - 1))
             + (sx * 1.0 / sy) * (sx * 1.0 / sy)
               * ((syy - (sy * 1.0) * sy / n) / (n - 1)) ) AS var_r
  FROM arm_stats
),
wide AS (
  SELECT
    MAX(CASE WHEN arm = 0 THEN r END) AS r0,
    MAX(CASE WHEN arm = 1 THEN r END) AS r1,
    MAX(CASE WHEN arm = 0 THEN var_r END) AS v0,
    MAX(CASE WHEN arm = 1 THEN var_r END) AS v1,
    CAST(SUM(n) AS BIGINT) AS n_users
  FROM delta
)
SELECT n_users,
       {sql_round('r0 / 100.0', 4)} AS ratio_arm0,
       {sql_round('r1 / 100.0', 4)} AS ratio_arm1,
       {sql_round('(r1 - r0) / 100.0', 4)} AS diff,
       {sql_round('sqrt(v0 + v1) / 100.0', 4)} AS se_diff,
       {sql_round('(r1 - r0) / sqrt(v0 + v1)', 6)} AS z,
       CASE WHEN abs((r1 - r0) / sqrt(v0 + v1)) > 1.96 THEN 1 ELSE 0 END
         AS significant
FROM wide
"""


@register("delta_method_ratio_ci", oracle=_B139_ORACLE)
def delta_method_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method inference for a RATIO metric (revenue per
    purchase) between two user arms: R = ΣX/ΣY with
    Var(R) ≈ (S_XX − 2R·S_XY + R²·S_YY)/(n·Ȳ²) — the correction
    every per-user ratio metric needs, because users (the
    randomization unit) differ from purchases (the analysis unit)
    and the naive purchase-level SE is simply wrong (B60/B104 cover
    mean metrics; this covers ratios).

    Scale shape: ONE user-grain conditional aggregate (map-side
    combined, exact cents), one |arms|-row moment reduction carrying
    (n, ΣX, ΣY, ΣX², ΣY², ΣXY) — the textbook sufficient-statistics
    pattern; everything after is O(1) algebra on identical numbers
    in both engines.
    """
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100 + 1e-9).cast("bigint"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("y"),
        )
        .select((F.col("user_id") % 2).alias("arm"), "x", "y")
    )
    x, y = F.col("x"), F.col("y")
    arm_stats = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("bigint").alias("sx"),
        F.sum(y).cast("bigint").alias("sy"),
        F.sum((x * 1.0) * x).alias("sxx"),
        F.sum((y * 1.0) * y).alias("syy"),
        F.sum((x * 1.0) * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    r = sx * 1.0 / sy
    var_r = (1.0 / (n * (sy * 1.0 / n) * (sy * 1.0 / n))) * (
        (sxx - (sx * 1.0) * sx / n) / (n - 1)
        - 2 * r * ((sxy - (sx * 1.0) * sy / n) / (n - 1))
        + r * r * ((syy - (sy * 1.0) * sy / n) / (n - 1))
    )
    delta = arm_stats.select("arm", "n", r.alias("r"), var_r.alias("var_r"))
    wide = delta.agg(
        F.max(F.when(F.col("arm") == 0, F.col("r"))).alias("r0"),
        F.max(F.when(F.col("arm") == 1, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("arm") == 0, F.col("var_r"))).alias("v0"),
        F.max(F.when(F.col("arm") == 1, F.col("var_r"))).alias("v1"),
        F.sum("n").cast("bigint").alias("n_users"),
    )
    z = (F.col("r1") - F.col("r0")) / F.sqrt(F.col("v0") + F.col("v1"))
    return wide.select(
        "n_users",
        round_eps(F.col("r0") / 100.0, 4).alias("ratio_arm0"),
        round_eps(F.col("r1") / 100.0, 4).alias("ratio_arm1"),
        round_eps((F.col("r1") - F.col("r0")) / 100.0, 4).alias("diff"),
        round_eps(
            F.sqrt(F.col("v0") + F.col("v1")) / 100.0, 4
        ).alias("se_diff"),
        round_eps(z, 6).alias("z"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).alias("significant"),
    )


# ---------------------------------------------------------------- C151

_C151_ORACLE = f"""
WITH fp AS (
  SELECT doc_id, lang,
         md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS h
  FROM documents
),
groups AS (
  SELECT h,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         list_sort(list(DISTINCT lang)) AS langs
  FROM fp GROUP BY h
  HAVING COUNT(DISTINCT lang) > 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(COALESCE(SUM(n_docs), 0) AS BIGINT) AS n_docs_conflicted
  FROM groups
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_docs FROM fp)
SELECT a.n_groups, a.n_docs_conflicted, t.total_docs,
       {sql_round('a.n_docs_conflicted * 100.0 / t.total_docs', 4)}
         AS pct_conflicted
FROM agg a CROSS JOIN tot t
"""


@register("lang_label_noise", oracle=_C151_ORACLE)
def lang_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language label-noise audit: whitespace-normalized
    content hashes that carry MORE THAN ONE lang label — identical
    text cannot be two languages, so every such group is labelling
    noise that poisons lang-filtered training mixes (C19 stratifies
    on lang; C3 re-derives it — this measures how dirty the stored
    label is). Reports conflicted group/doc counts and the corpus
    percentage.

    Scale shape: A10's exact-dedup collapse (map-side md5, one
    hash-grain aggregate) with a distinct-lang count per group; the
    report is a 1-row reduction. No text re-scan after the single
    hash pass.
    """
    fp = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(
            F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
        ).alias("h"),
    )
    groups = (
        fp.groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.size(F.collect_set("lang")).cast("bigint").alias("n_langs"),
        )
        .where(F.col("n_langs") > 1)
    )
    agg = groups.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.coalesce(F.sum("n_docs"), F.lit(0))
        .cast("bigint")
        .alias("n_docs_conflicted"),
    )
    tot = fp.agg(F.count(F.lit(1)).cast("bigint").alias("total_docs"))
    return agg.transform(scalars(tot)).select(
        "n_groups",
        "n_docs_conflicted",
        "total_docs",
        round_eps(
            F.col("n_docs_conflicted") * 100.0 / F.col("total_docs"), 4
        ).alias("pct_conflicted"),
    )
