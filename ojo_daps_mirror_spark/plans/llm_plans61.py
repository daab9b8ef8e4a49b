"""Sixty-first sweep (SURVEY.md §2 B115, C129-C130).

Benjamini-Hochberg FDR correction over a family of per-nation
proportion tests (the multiple-testing layer every per-segment
test in the B-track statistics family needs before anyone acts on
25 p-values), ε-differentially-private histogram release with
seeded Laplace noise + utility audit, and a Horvitz-Thompson
deterministic-sample count estimator with its error audit (the
estimate-cheaply-then-decide primitive behind B101's probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.stats import normal_sf_abs, sql_normal_sf_abs
from ..functions.text import hash64, sql_hash64
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B115

FDR_Q = 0.10  # target false-discovery rate

_B115_ORACLE = f"""
WITH per_nation AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_all, CAST(SUM(k) AS BIGINT) AS k_all
  FROM per_nation
),
tested AS (
  SELECT p.nationkey, p.n, p.k,
         (p.k * 1.0 / p.n - t.k_all * 1.0 / t.n_all)
           / sqrt((t.k_all * 1.0 / t.n_all)
                  * (1 - t.k_all * 1.0 / t.n_all) / p.n) AS z
  FROM per_nation p CROSS JOIN tot
       t
),
pvals AS (
  SELECT nationkey, n, k, z,
         2.0 * {sql_normal_sf_abs('z')} AS p
  FROM tested
),
ranked AS (
  SELECT nationkey, n, k, z, p,
         ROW_NUMBER() OVER (ORDER BY p, nationkey) AS i,
         COUNT(*) OVER () AS m
  FROM pvals
),
adjusted AS (
  SELECT nationkey, n, k, z, p, i, m,
         MIN(p * m / i) OVER (ORDER BY i DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS padj
  FROM ranked
)
SELECT nationkey, n, k, {sql_round('z', 6)} AS z, {sql_round('p', 6)} AS p,
       CAST(i AS BIGINT) AS rank,
       {sql_round('LEAST(padj, 1.0)', 6)} AS p_adj,
       CAST(CASE WHEN padj <= {FDR_Q} THEN 1 ELSE 0 END AS BIGINT)
         AS rejected
FROM adjusted ORDER BY rank
"""


@register("fdr_bh_correction", oracle=_B115_ORACLE)
def fdr_bh_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR step-up over a 25-hypothesis family:
    per nation, a two-sided one-proportion z-test of the
    urgent/high-priority order share against the global share, then
    BH-adjusted p-values p_adj(i) = min_{j≥i} m·p(j)/j and rejections
    at q=0.10. The multiple-testing control every per-segment scan of
    the B-track (B50 Benford, B60 A/B, B91 rank tests) needs before
    acting on a family of p-values — at 25 segments, 0.05-level tests
    false-alarm constantly. The normal CDF is the shared A&S erf
    polynomial (functions/stats.py) generated into BOTH engines from
    one set of constants, so p-values cannot drift.

    Scale shape: one fact-grain aggregate to nation counts; the
    z/p computation, the p-ordered ranking and the reversed
    running-min (the step-up) are all windows on the |nations| frame.
    The global proportion attaches as a broadcast scalar.
    """
    per_nation = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderpriority")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("k"),
        )
    )
    tot = per_nation.agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("k").cast("bigint").alias("k_all"),
    )
    p0 = F.col("k_all") * 1.0 / F.col("n_all")
    z = (F.col("k") * 1.0 / F.col("n") - p0) / F.sqrt(
        p0 * (1 - p0) / F.col("n")
    )
    pvals = (
        per_nation.transform(scalars(tot))
        .withColumn("z", z)
        .withColumn("p", 2.0 * normal_sf_abs(F.col("z")))
        .select("nationkey", "n", "k", "z", "p")
    )
    wi = Window.orderBy("p", "nationkey")
    wm = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pvals.select(
        "nationkey",
        "n",
        "k",
        "z",
        "p",
        F.row_number().over(wi).alias("i"),
        F.count(F.lit(1)).over(wm).alias("m"),
    )
    wrev = Window.orderBy(F.col("i").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    adjusted = ranked.withColumn(
        "padj", F.min(F.col("p") * F.col("m") / F.col("i")).over(wrev)
    )
    return adjusted.select(
        "nationkey",
        "n",
        "k",
        round_eps(F.col("z"), 6).alias("z"),
        round_eps(F.col("p"), 6).alias("p"),
        F.col("i").cast("bigint").alias("rank"),
        round_eps(F.least(F.col("padj"), F.lit(1.0)), 6).alias("p_adj"),
        F.when(F.col("padj") <= FDR_Q, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("rejected"),
    ).orderBy("rank")


# ---------------------------------------------------------------- C129

DP_EPS = 1.0  # epsilon; count sensitivity 1 -> Laplace scale b = 1/eps

_C129_ORACLE = f"""
WITH hist AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM events GROUP BY 1
),
noised AS (
  SELECT event_type, true_cnt,
         ({sql_hash64("event_type || ':dp'")} % 1000000 + 0.5) / 1000000.0
           AS u
  FROM hist
),
final AS (
  SELECT event_type, true_cnt,
         true_cnt - (1.0 / {DP_EPS!r})
           * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
           * ln(1.0 - 2.0 * ABS(u - 0.5)) AS noisy
  FROM noised
)
SELECT event_type, true_cnt,
       {sql_round('noisy', 4)} AS noisy_cnt,
       {sql_round('ABS(noisy - true_cnt)', 4)} AS abs_err
FROM final ORDER BY event_type
"""


@register("dp_noisy_counts", oracle=_C129_ORACLE)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 differentially-private histogram release of event-type
    counts: Laplace(1/ε) noise via inverse-CDF of a deterministic
    md5-seeded uniform (reproducible releases — reruns publish the
    SAME noise, a real DP-deployment requirement, and the no-RNG rule
    every operator here follows), plus the utility audit (absolute
    error per cell) a data steward reviews before release. The
    privacy sibling of C124: k-anonymity audits the quasi-identifier
    side, this releases the aggregate side.

    Scale shape: one map-side-combined aggregate to |types| cells;
    noise is a pure projection on the tiny histogram. Sensitivity is
    1 because each event contributes to exactly one cell.
    """
    hist = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
    )
    u = (
        (
            hash64(F.concat(F.col("event_type"), F.lit(":dp"))) % 1000000
            + 0.5
        )
        / 1000000.0
    )
    noisy = F.col("true_cnt") - (1.0 / DP_EPS) * F.when(
        F.col("u") >= 0.5, 1.0
    ).otherwise(-1.0) * F.log(1.0 - 2.0 * F.abs(F.col("u") - 0.5))
    return (
        hist.withColumn("u", u)
        .withColumn("noisy", noisy)
        .select(
            "event_type",
            "true_cnt",
            round_eps(F.col("noisy"), 4).alias("noisy_cnt"),
            round_eps(F.abs(F.col("noisy") - F.col("true_cnt")), 4).alias(
                "abs_err"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- C130

HT_MOD = 16  # deterministic 1/16 sample

_C130_ORACLE = f"""
WITH per_type AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS exact_cnt,
         CAST(SUM(CASE WHEN {sql_hash64("event_id::VARCHAR || ':ht'")}
                       % {HT_MOD} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS sampled
  FROM events GROUP BY 1
)
SELECT event_type, exact_cnt, sampled,
       CAST(sampled * {HT_MOD} AS BIGINT) AS ht_estimate,
       {sql_round(
           'ABS(sampled * ' + str(HT_MOD) + ' - exact_cnt)'
           ' * 1.0 / exact_cnt', 6)} AS rel_err
FROM per_type ORDER BY event_type
"""


@register("ht_sample_estimate", oracle=_C130_ORACLE)
def ht_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson count estimation from a deterministic 1/16
    hash sample (inclusion probability 1/16 → weight 16), audited
    against the exact counts: per event type the sampled count, the
    HT estimate and its relative error. The estimate-cheaply pattern
    behind B101's cardinality probe — on 100 TB you scan the 1/16
    hash-bucket partition (or a Bernoulli page sample) instead of the
    corpus, and THIS audit is how you validate the estimator before
    trusting it; the hash sample is also consistent across tables
    (same ids sampled everywhere), which Bernoulli sampling is not.

    Scale shape: the audit form is one conditional aggregate (one
    scan computes exact and sampled side by side); the production
    form scans only the sample. No joins, no extra shuffle.
    """
    per_type = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_cnt"),
            F.sum(
                F.when(
                    hash64(
                        F.concat(
                            F.col("event_id").cast("string"), F.lit(":ht")
                        )
                    )
                    % HT_MOD
                    == 0,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("sampled"),
        )
    )
    return per_type.select(
        "event_type",
        "exact_cnt",
        "sampled",
        (F.col("sampled") * HT_MOD).cast("bigint").alias("ht_estimate"),
        round_eps(
            F.abs(F.col("sampled") * HT_MOD - F.col("exact_cnt"))
            * 1.0
            / F.col("exact_cnt"),
            6,
        ).alias("rel_err"),
    ).orderBy("event_type")
