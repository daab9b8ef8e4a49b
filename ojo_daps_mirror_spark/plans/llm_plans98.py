"""Ninety-eighth sweep (SURVEY.md §2 B182-B183, C173).

Post-stratified survey estimation (re-weight a sample's strata by
KNOWN population shares — the first adjustment survey statistics
teaches, completing B120's Horvitz-Thompson and B119's Neyman
allocation), Holm-Bonferroni step-down (the FWER-controlling
multiple-test correction that is uniformly more powerful than plain
Bonferroni — the family-wise counterpart of B115's FDR), and the
within-document repetition profile (where inside documents does
repetition live — loops and chorus-style boilerplate concentrate
late; the positional view C24's corpus-wide span fraction flattens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.stats import normal_sf_abs, sql_normal_sf_abs
from ..functions.text import hash64, sql_hash64
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B182

PS_MOD = 10  # deterministic ~10% "survey" sample

_B182_ORACLE = f"""
WITH base AS (
  SELECT o_orderpriority AS h,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS y,
         CASE WHEN {sql_hash64("o_orderkey::VARCHAR || ':survey'")}
                   % {PS_MOD} = 0 THEN 1 ELSE 0 END AS s
  FROM orders
),
strata AS (
  SELECT h,
         CAST(COUNT(*) AS BIGINT) AS n_pop,
         CAST(SUM(y) AS BIGINT) AS y_pop,
         CAST(SUM(s) AS BIGINT) AS n_samp,
         CAST(SUM(s * y) AS BIGINT) AS y_samp
  FROM base GROUP BY h
),
red AS (
  SELECT CAST(SUM(n_pop) AS BIGINT) AS nn,
         SUM(y_pop) * 1.0 / SUM(n_pop) AS true_mean,
         SUM(y_samp) * 1.0 / SUM(n_samp) AS raw_mean,
         SUM((n_pop * 1.0 / (SELECT SUM(n_pop) FROM strata))
             * (y_samp * 1.0 / n_samp)) AS ps_mean,
         CAST(SUM(n_samp) AS BIGINT) AS n_samp
  FROM strata
)
SELECT nn AS n_population, n_samp AS n_sample,
       {sql_round('true_mean / 100.0', 4)} AS true_mean,
       {sql_round('raw_mean / 100.0', 4)} AS raw_sample_mean,
       {sql_round('ps_mean / 100.0', 4)} AS post_stratified_mean,
       {sql_round('(raw_mean - true_mean) / 100.0', 4)} AS raw_bias,
       {sql_round('(ps_mean - true_mean) / 100.0', 4)} AS ps_bias
FROM red
"""


@register("post_stratified_mean", oracle=_B182_ORACLE)
def post_stratified_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratification estimator on a deterministic ~{100 // PS_MOD}%
    order "survey": the raw sample mean vs the post-stratified mean
    (per-stratum sample means re-weighted by KNOWN population
    priority shares) vs the true mean — survey statistics' first
    bias correction, here with the truth in hand so both estimators'
    errors are visible. Completes the design-based family: B119
    plans the allocation, B130 weights by inclusion probability,
    this repairs whatever imbalance the realized sample has.

    Exactness: population and sample sufficient statistics come from
    ONE conditional aggregate at stratum grain (the sample indicator
    is a pure hash expression — no second scan, no join); estimator
    algebra is O(1) per stratum.
    """
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("h"),
        F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint").alias("y"),
        F.when(
            hash64(
                F.concat(F.col("o_orderkey").cast("string"), F.lit(":survey"))
            )
            % PS_MOD
            == 0,
            1,
        )
        .otherwise(0)
        .alias("s"),
    )
    strata = base.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum("y").cast("bigint").alias("y_pop"),
        F.sum("s").cast("bigint").alias("n_samp"),
        F.sum(F.col("s") * F.col("y")).cast("bigint").alias("y_samp"),
    )
    w_all = Window.partitionBy()
    enriched = strata.withColumn(
        "nn", F.sum("n_pop").over(w_all).cast("bigint")
    )
    red = enriched.agg(
        F.max("nn").cast("bigint").alias("nn"),
        (F.sum("y_pop") * 1.0 / F.sum("n_pop")).alias("true_mean"),
        (F.sum("y_samp") * 1.0 / F.sum("n_samp")).alias("raw_mean"),
        F.sum(
            (F.col("n_pop") * 1.0 / F.col("nn"))
            * (F.col("y_samp") * 1.0 / F.col("n_samp"))
        ).alias("ps_mean"),
        F.sum("n_samp").cast("bigint").alias("n_samp"),
    )
    return red.select(
        F.col("nn").alias("n_population"),
        F.col("n_samp").alias("n_sample"),
        round_eps(F.col("true_mean") / 100.0, 4).alias("true_mean"),
        round_eps(F.col("raw_mean") / 100.0, 4).alias("raw_sample_mean"),
        round_eps(F.col("ps_mean") / 100.0, 4).alias(
            "post_stratified_mean"
        ),
        round_eps(
            (F.col("raw_mean") - F.col("true_mean")) / 100.0, 4
        ).alias("raw_bias"),
        round_eps(
            (F.col("ps_mean") - F.col("true_mean")) / 100.0, 4
        ).alias("ps_bias"),
    )


# ---------------------------------------------------------------- B183

_B183_ORACLE = f"""
WITH grp AS (
  SELECT o_orderpriority AS g,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(k) AS BIGINT) AS kk,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM grp
),
z AS (
  SELECT g, n, k, m,
         (k * 1.0 / n - (kk - k) * 1.0 / (nn - n))
           / sqrt((kk * 1.0 / nn) * (1.0 - kk * 1.0 / nn)
                  * (1.0 / n + 1.0 / (nn - n))) AS zval
  FROM grp CROSS JOIN tot
),
praw AS (
  SELECT g, n, zval, m,
         2.0 * {sql_normal_sf_abs('zval')} AS p_raw
  FROM z
),
holm AS (
  SELECT g, n, zval, p_raw,
         LEAST(1.0, MAX(p_raw * (m - rk + 1)) OVER (
           ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS p_holm
  FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY p_raw, g) AS rk FROM praw
  )
)
SELECT g AS priority, n,
       {sql_round('zval', 6)} AS z_one_vs_rest,
       {sql_round('p_raw', 6)} AS p_raw,
       {sql_round('p_holm', 6)} AS p_holm,
       CAST(CASE WHEN p_holm < 0.05 THEN 1 ELSE 0 END AS BIGINT)
         AS reject_05
FROM holm ORDER BY priority
"""


@register("holm_bonferroni", oracle=_B183_ORACLE)
def holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm-Bonferroni step-down over the family of one-vs-rest
    fulfilled-share z-tests (each priority against all others):
    p-values sorted ascending, the i-th multiplied by (m - i + 1),
    then monotonised by a running max and capped at 1 — familywise
    error control that is uniformly more powerful than plain
    Bonferroni, and the FWER counterpart of B115's FDR (use Holm
    when ONE false claim is fatal, BH when a small fraction is
    tolerable). P-values via the shared A&S erf polynomial, so both
    engines evaluate identical arithmetic.

    Scale shape: one aggregate to |groups| rows, a 1-row totals
    attach, and the step-down is one ordered cumulative-max window
    over the |groups| frame.
    """
    grp = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("g"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("k"),
        )
    )
    w_all = Window.partitionBy()
    z = grp.select(
        "g",
        "n",
        "k",
        F.sum("n").over(w_all).cast("bigint").alias("nn"),
        F.sum("k").over(w_all).cast("bigint").alias("kk"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("m"),
    )
    n, k, nn, kk = F.col("n"), F.col("k"), F.col("nn"), F.col("kk")
    pp = kk * 1.0 / nn
    zval = (k * 1.0 / n - (kk - k) * 1.0 / (nn - n)) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / n + 1.0 / (nn - n))
    )
    praw = z.select(
        "g",
        "n",
        "m",
        zval.alias("zval"),
        (2.0 * normal_sf_abs(zval)).alias("p_raw"),
    )
    ranked = praw.withColumn(
        "rk", F.row_number().over(Window.orderBy("p_raw", "g"))
    )
    w_run = Window.orderBy("rk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    holm = ranked.withColumn(
        "p_holm",
        F.least(
            F.lit(1.0),
            F.max(
                F.col("p_raw") * (F.col("m") - F.col("rk") + 1)
            ).over(w_run),
        ),
    )
    return holm.select(
        F.col("g").alias("priority"),
        "n",
        round_eps(F.col("zval"), 6).alias("z_one_vs_rest"),
        round_eps(F.col("p_raw"), 6).alias("p_raw"),
        round_eps(F.col("p_holm"), 6).alias("p_holm"),
        F.when(F.col("p_holm") < 0.05, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("reject_05"),
    ).orderBy("priority")


# ---------------------------------------------------------------- C173

_C173_ORACLE = f"""
WITH toks AS (
  SELECT source, string_split_regex(lower(text), '\\s+') AS t
  FROM documents
),
pos AS (
  SELECT source, u.dec AS dec, u.rep AS rep FROM (
    SELECT source, unnest(list_transform(
      generate_series(1, len(t)),
      i -> {{'dec': ((i - 1) * 10) // len(t),
            'rep': CASE WHEN list_position(t, t[i]) < i
                        THEN 1 ELSE 0 END}})) AS u
    FROM toks
  )
)
SELECT source, CAST(dec AS BIGINT) AS position_decile,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(rep) AS BIGINT) AS n_repeated,
       {sql_round('SUM(rep) * 1.0 / COUNT(*)', 6)} AS repeat_share
FROM pos GROUP BY source, dec ORDER BY source, position_decile
"""


@register("doc_repetition_profile", oracle=_C173_ORACLE)
def doc_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition by position decile: for every
    token, is it a repeat of an earlier token in the SAME document
    (first-occurrence test), aggregated per source x relative-
    position decile. Natural text repeats more as context
    accumulates along a gentle curve; template/loop-generated text
    shows a cliff (novel header, repeating body) — the positional
    structure C24's corpus-level span fraction and C1's counts
    flatten, and the cheap tell for C132 before C153 names spans.

    Scale shape: the first-occurrence test is a map-side array
    expression (array_position is the doc-local scan — O(len^2)
    worst case per DOC, independent of corpus size), one explode to
    token grain, one (source, decile) aggregate with exact counts.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.split(F.lower(F.col("text")), r"\s+").alias("t")
    )
    pos = docs.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t)),"
                " i -> struct(((i - 1) * 10) div size(t) AS dec,"
                " CASE WHEN array_position(t, element_at(t, i)) < i"
                " THEN 1 ELSE 0 END AS rep))"
            )
        ).alias("u"),
    ).select(
        "source", F.col("u.dec").alias("dec"), F.col("u.rep").alias("rep")
    )
    return (
        pos.groupBy("source", F.col("dec").cast("bigint").alias("position_decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("rep").cast("bigint").alias("n_repeated"),
            round_eps(F.sum("rep") * 1.0 / F.count(F.lit(1)), 6).alias(
                "repeat_share"
            ),
        )
        .orderBy("source", "position_decile")
    )
