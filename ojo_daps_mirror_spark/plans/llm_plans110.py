"""Hundred-tenth sweep (SURVEY.md §2 B203-B204, C188).

Net revenue retention (the SaaS board decomposition — expansion,
contraction and churned revenue on the SAME customer base, where
B131 splits acquisition from retention), intraclass correlation via
variance components (how much of order-value variance is BETWEEN
customers — the repeatability number that says whether
customer-level personalisation has anything to personalise), and
the dedup method-agreement audit (do MinHash-LSH and SimHash
nominate the same pairs — running two families and reading their
disagreement is the cheapest dedup QA there is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register
from .text_plans import (
    _C5_ORACLE,
    _C6_ORACLE,
    dedup_minhash_lsh,
    dedup_simhash,
)

# ---------------------------------------------------------------- B203

NRR_Y0 = 1996
NRR_Y1 = 1997

_B203_ORACLE = f"""
WITH per_year AS (
  SELECT o_custkey AS c, CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders WHERE year(o_orderdate) IN ({NRR_Y0}, {NRR_Y1})
  GROUP BY 1, 2
),
base AS (
  SELECT a.c, a.rev AS r0, COALESCE(b.rev, 0) AS r1
  FROM (SELECT * FROM per_year WHERE yr = {NRR_Y0}) a
  LEFT JOIN (SELECT * FROM per_year WHERE yr = {NRR_Y1}) b USING (c)
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_base,
         CAST(SUM(r0) AS BIGINT) AS rev0,
         CAST(SUM(r1) AS BIGINT) AS rev1,
         CAST(SUM(CASE WHEN r1 > r0 THEN r1 - r0 ELSE 0 END) AS BIGINT)
           AS expansion,
         CAST(SUM(CASE WHEN r1 > 0 AND r1 < r0 THEN r0 - r1 ELSE 0 END)
              AS BIGINT) AS contraction,
         CAST(SUM(CASE WHEN r1 = 0 THEN r0 ELSE 0 END) AS BIGINT)
           AS churned
  FROM base
)
SELECT n_base AS n_base_customers,
       {sql_round('rev0 / 100.0', 2)} AS base_revenue,
       {sql_round('rev1 * 100.0 / rev0', 4)} AS ndr_pct,
       {sql_round('(rev0 - contraction - churned) * 100.0 / rev0', 4)}
         AS grr_pct,
       {sql_round('expansion / 100.0', 2)} AS expansion_rev,
       {sql_round('contraction / 100.0', 2)} AS contraction_rev,
       {sql_round('churned / 100.0', 2)} AS churned_rev
FROM red
"""


@register("net_revenue_retention", oracle=_B203_ORACLE)
def net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net and gross revenue retention for the {NRR_Y0} customer
    base measured in {NRR_Y1}: NDR = next-year revenue of the SAME
    customers over base revenue (expansion can push it over 100%),
    GRR caps expansion away (only contraction and churn count) —
    the SaaS board pair, with the expansion / contraction / churned
    dollar decomposition that explains the gap between them. B131
    splits acquisition from retention; this decomposes the
    retention side itself.

    Exactness: all components are exact BIGINT cents from one
    customer-grain LEFT join (missing next-year = churn, by
    COALESCE not by filter); identities NDR - GRR = expansion/base
    hold to the cent.

    Scale shape: one fact aggregate to (customer, year), a key
    left-join, one reduction.
    """
    per_year = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(NRR_Y0, NRR_Y1))
        .groupBy(
            F.col("o_custkey").alias("c"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("rev")
        )
    )
    per_year = per_year.persist()
    a = per_year.where(F.col("yr") == NRR_Y0).select(
        "c", F.col("rev").alias("r0")
    )
    b = per_year.where(F.col("yr") == NRR_Y1).select(
        "c", F.col("rev").alias("r1")
    )
    base = a.join(b, "c", "left").select(
        "r0", F.coalesce(F.col("r1"), F.lit(0)).alias("r1")
    )
    r0, r1 = F.col("r0"), F.col("r1")
    red = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_base"),
        F.sum(r0).cast("bigint").alias("rev0"),
        F.sum(r1).cast("bigint").alias("rev1"),
        F.sum(F.when(r1 > r0, r1 - r0).otherwise(0))
        .cast("bigint")
        .alias("expansion"),
        F.sum(F.when((r1 > 0) & (r1 < r0), r0 - r1).otherwise(0))
        .cast("bigint")
        .alias("contraction"),
        F.sum(F.when(r1 == 0, r0).otherwise(0))
        .cast("bigint")
        .alias("churned"),
    )
    return red.select(
        F.col("n_base").alias("n_base_customers"),
        round_eps(F.col("rev0") / 100.0, 2).alias("base_revenue"),
        round_eps(F.col("rev1") * 100.0 / F.col("rev0"), 4).alias(
            "ndr_pct"
        ),
        round_eps(
            (F.col("rev0") - F.col("contraction") - F.col("churned"))
            * 100.0
            / F.col("rev0"),
            4,
        ).alias("grr_pct"),
        round_eps(F.col("expansion") / 100.0, 2).alias("expansion_rev"),
        round_eps(F.col("contraction") / 100.0, 2).alias(
            "contraction_rev"
        ),
        round_eps(F.col("churned") / 100.0, 2).alias("churned_rev"),
    )


# ---------------------------------------------------------------- B204

_B204_ORACLE = f"""
WITH grp AS (
  SELECT o_custkey AS g,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS HUGEINT) AS s1,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS HUGEINT)
                  * CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS HUGEINT) AS s2
  FROM orders GROUP BY o_custkey
  HAVING COUNT(*) >= 2
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(s1) AS HUGEINT) AS st,
         CAST(SUM(s2) AS DOUBLE) AS s2d,
         SUM(CAST(s1 * s1 AS DOUBLE) / n) AS sumt,
         SUM(CAST(n AS DOUBLE) * n) AS sn2
  FROM grp
),
ms AS (
  SELECT k, nn,
         (sumt - CAST(st * st AS DOUBLE) / nn) / (k - 1) AS msb,
         (s2d - sumt) / (nn - k) AS msw,
         (nn - sn2 / nn) / (k - 1.0) AS n0
  FROM red
)
SELECT k AS n_customers, nn AS n_orders,
       {sql_round('n0', 4)} AS n0_effective_group_size,
       {sql_round('(msb - msw) / n0 / 10000.0', 2)} AS var_between,
       {sql_round('msw / 10000.0', 2)} AS var_within,
       {sql_round(
           'GREATEST(0.0, (msb - msw) / n0)'
           ' / (GREATEST(0.0, (msb - msw) / n0) + msw)', 6)} AS icc
FROM ms
"""


@register("icc_variance_components", oracle=_B204_ORACLE)
def icc_variance_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation of order value within customers via
    one-way random-effects variance components (method of moments:
    sigma_b^2 = (MSB - MSW)/n0 with the unbalanced-design n0):
    ICC near 0 means order sizes are noise around a global mean and
    customer-level personalisation has nothing to hold onto; ICC
    high means the customer IS the signal (and B77's mean-reversion
    corrections matter). Repeat-customer groups only (n >= 2).

    Exactness: per-customer sufficient statistics in 128-bit
    integers (B144's recipe at customer grain); the moment algebra
    is O(1); the between-component is floored at 0 as the method
    requires.

    Scale shape: one fact aggregate to customer grain, one
    reduction — variance components at 100 TB cost one scan.
    """
    cents = F.round(F.col("o_totalprice") * 100 + 1e-9)
    grp = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("g"),
            cents.cast("decimal(38,0)").alias("x"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("decimal(38,0)").alias("s1"),
            F.sum(F.col("x") * F.col("x"))
            .cast("decimal(38,0)")
            .alias("s2"),
        )
        .where(F.col("n") >= 2)
    )
    red = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s1").cast("decimal(38,0)").alias("st"),
        F.sum("s2").cast("double").alias("s2d"),
        F.sum(
            (F.col("s1") * F.col("s1")).cast("double") / F.col("n")
        ).alias("sumt"),
        F.sum(F.col("n").cast("double") * F.col("n")).alias("sn2"),
    )
    k, nn = F.col("k"), F.col("nn")
    msb = (
        F.col("sumt") - (F.col("st") * F.col("st")).cast("double") / nn
    ) / (k - 1)
    msw = (F.col("s2d") - F.col("sumt")) / (nn - k)
    n0 = (nn - F.col("sn2") / nn) / (k - 1.0)
    var_b = F.greatest(F.lit(0.0), (msb - msw) / n0)
    return red.select(
        k.alias("n_customers"),
        nn.alias("n_orders"),
        round_eps(n0, 4).alias("n0_effective_group_size"),
        round_eps((msb - msw) / n0 / 10000.0, 2).alias("var_between"),
        round_eps(msw / 10000.0, 2).alias("var_within"),
        round_eps(var_b / (var_b + msw), 6).alias("icc"),
    )


# ---------------------------------------------------------------- C188

_C188_ORACLE = f"""
WITH mh AS (
  SELECT id_a, id_b FROM ( {_C5_ORACLE} )
),
sh AS (
  SELECT id_a, id_b FROM ( {_C6_ORACLE} )
),
merged AS (
  SELECT COALESCE(m.id_a, s.id_a) AS id_a,
         CASE WHEN m.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_mh,
         CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_sh
  FROM mh m FULL OUTER JOIN sh s
    ON m.id_a = s.id_a AND m.id_b = s.id_b
)
SELECT CAST(SUM(in_mh) AS BIGINT) AS n_minhash_pairs,
       CAST(SUM(in_sh) AS BIGINT) AS n_simhash_pairs,
       CAST(SUM(in_mh * in_sh) AS BIGINT) AS n_both,
       {sql_round(
           'SUM(in_mh * in_sh) * 1.0'
           ' / (SUM(in_mh) + SUM(in_sh) - SUM(in_mh * in_sh))', 6)}
         AS pair_jaccard
FROM merged
"""


@register("dedup_method_agreement", oracle=_C188_ORACLE)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-agreement audit between the two signature dedup
    families: MinHash-LSH (C5, Jaccard-verified) vs SimHash (C6,
    hamming-banded) pair sets — counts of each, the overlap, and
    the pair-set Jaccard. High agreement cross-validates both
    pipelines for free; pairs only one method finds are exactly
    where its blocking geometry (bag-of-shingles vs weighted-bit)
    differs — the cheapest dedup QA there is, and the empirical
    answer to "which family should gate the corpus". Both sides are
    the REGISTERED queries, so the audit tracks them verbatim.

    Scale shape: both pipelines' (small) pair frames full-outer
    merge on the pair key; one reduction.
    """
    mh = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    sh = dedup_simhash(spark, sf_dir).select("id_a", "id_b")
    merged = mh.withColumn("in_mh", F.lit(1)).join(
        sh.withColumn("in_sh", F.lit(1)), ["id_a", "id_b"], "full_outer"
    ).select(
        F.coalesce(F.col("in_mh"), F.lit(0)).alias("in_mh"),
        F.coalesce(F.col("in_sh"), F.lit(0)).alias("in_sh"),
    )
    return merged.agg(
        F.sum("in_mh").cast("bigint").alias("n_minhash_pairs"),
        F.sum("in_sh").cast("bigint").alias("n_simhash_pairs"),
        F.sum(F.col("in_mh") * F.col("in_sh"))
        .cast("bigint")
        .alias("n_both"),
        round_eps(
            F.sum(F.col("in_mh") * F.col("in_sh"))
            * 1.0
            / (
                F.sum("in_mh")
                + F.sum("in_sh")
                - F.sum(F.col("in_mh") * F.col("in_sh"))
            ),
            6,
        ).alias("pair_jaccard"),
    )
