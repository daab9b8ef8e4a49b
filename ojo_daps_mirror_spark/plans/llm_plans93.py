"""Ninety-third sweep (SURVEY.md §2 B172-B173, C168).

Newcombe hybrid-Wilson CI for a difference of proportions (the
error bar B156's per-group intervals don't give you — comparing two
rates needs a CI on the DIFFERENCE), the price/volume/mix variance
decomposition (FP&A's standard answer to "why did revenue move" —
exactly additive, unlike eyeballing B75's period-over-period), and
the split-leakage audit (near-duplicate pairs straddling C79's
train/val/test boundary — the eval-integrity hole document-level
splitting leaves open when near-dups exist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.attach import attach_scalars
from ..sources import load_table
from . import register
from .llm_plans20 import SPLIT_TRAIN, SPLIT_VAL
from .text_plans import _C5_ORACLE, dedup_minhash_lsh

# ---------------------------------------------------------------- B172

NC_Z = 1.959963984540054
NC_G1 = "1-URGENT"
NC_G2 = "5-LOW"


def _wilson_sql(p: str, n: str, sign: str) -> str:
    z2 = f"({NC_Z!r} * {NC_Z!r})"
    half = (
        f"{NC_Z!r} * sqrt({p} * (1 - {p}) / {n}"
        f" + {z2} / (4.0 * {n} * {n}))"
    )
    return (
        f"(({p} + {z2} / (2 * {n}) {sign} {half}) / (1 + {z2} / {n}))"
    )


_B172_ORACLE = f"""
WITH grp AS (
  SELECT o_orderpriority AS g,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM orders WHERE o_orderpriority IN ('{NC_G1}', '{NC_G2}')
  GROUP BY 1
),
wide AS (
  SELECT MAX(CASE WHEN g = '{NC_G1}' THEN n END) AS n1,
         MAX(CASE WHEN g = '{NC_G1}' THEN k * 1.0 / n END) AS p1,
         MAX(CASE WHEN g = '{NC_G2}' THEN n END) AS n2,
         MAX(CASE WHEN g = '{NC_G2}' THEN k * 1.0 / n END) AS p2
  FROM grp
),
bounds AS (
  SELECT n1, n2, p1, p2,
         {_wilson_sql('p1', 'n1', '-')} AS l1,
         {_wilson_sql('p1', 'n1', '+')} AS u1,
         {_wilson_sql('p2', 'n2', '-')} AS l2,
         {_wilson_sql('p2', 'n2', '+')} AS u2
  FROM wide
)
SELECT n1, n2,
       {sql_round('p1 - p2', 6)} AS diff,
       {sql_round(
           'p1 - p2 - sqrt((p1 - l1) * (p1 - l1)'
           ' + (u2 - p2) * (u2 - p2))', 6)} AS ci_lo,
       {sql_round(
           'p1 - p2 + sqrt((u1 - p1) * (u1 - p1)'
           ' + (p2 - l2) * (p2 - l2))', 6)} AS ci_hi
FROM bounds
"""


@register("newcombe_diff_ci", oracle=_B172_ORACLE)
def newcombe_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newcombe hybrid-Wilson 95% CI for the DIFFERENCE in fulfilled
    share between '{NC_G1}' and '{NC_G2}' orders: each group gets its
    Wilson interval (B156) and the difference CI combines the inner
    distances — the method that keeps coverage at extreme p where
    the naive Wald difference-CI (d +- z sqrt(p1q1/n1 + p2q2/n2))
    under-covers; the honest error bar for "is priority handled
    differently".

    Exactness: counts are exact BIGINTs from one conditional
    aggregate pivoted wide (no join); the Wilson/Newcombe algebra is
    O(1) with identical IEEE shapes.
    """
    grp = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin(NC_G1, NC_G2))
        .groupBy(F.col("o_orderpriority").alias("g"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("k"),
        )
    )

    def pick(seg, expr):
        return F.max(F.when(F.col("g") == seg, expr))

    wide = grp.agg(
        pick(NC_G1, F.col("n")).alias("n1"),
        pick(NC_G1, F.col("k") * 1.0 / F.col("n")).alias("p1"),
        pick(NC_G2, F.col("n")).alias("n2"),
        pick(NC_G2, F.col("k") * 1.0 / F.col("n")).alias("p2"),
    )
    z2 = NC_Z * NC_Z

    def wilson(p, n, sign):
        half = NC_Z * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
        centre = p + z2 / (2 * n)
        return (centre + sign * half) / (1 + z2 / n)

    p1, n1 = F.col("p1"), F.col("n1")
    p2, n2 = F.col("p2"), F.col("n2")
    l1, u1 = wilson(p1, n1, -1), wilson(p1, n1, 1)
    l2, u2 = wilson(p2, n2, -1), wilson(p2, n2, 1)
    d = p1 - p2
    return wide.select(
        "n1",
        "n2",
        round_eps(d, 6).alias("diff"),
        round_eps(
            d - F.sqrt((p1 - l1) * (p1 - l1) + (u2 - p2) * (u2 - p2)), 6
        ).alias("ci_lo"),
        round_eps(
            d + F.sqrt((u1 - p1) * (u1 - p1) + (p2 - l2) * (p2 - l2)), 6
        ).alias("ci_hi"),
    )


# ---------------------------------------------------------------- B173

PVM_Y0 = 1996
PVM_Y1 = 1997

_B173_ORACLE = f"""
WITH by AS (
  SELECT p.p_brand AS brand, CAST(year(l.l_shipdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS r
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN ({PVM_Y0}, {PVM_Y1})
  GROUP BY 1, 2
),
matched AS (
  SELECT a.brand, a.q AS q0, a.r AS r0, b.q AS q1, b.r AS r1
  FROM (SELECT * FROM by WHERE yr = {PVM_Y0}) a
  JOIN (SELECT * FROM by WHERE yr = {PVM_Y1}) b USING (brand)
),
tot AS (
  SELECT CAST(SUM(q0) AS BIGINT) AS qt0, CAST(SUM(q1) AS BIGINT) AS qt1
  FROM matched
),
effects AS (
  SELECT m.brand,
         m.r1 - m.r0 AS delta,
         (m.r1 * 1.0 / m.q1 - m.r0 * 1.0 / m.q0) * m.q1 AS price_eff,
         (m.r0 * 1.0) * (t.qt1 * 1.0 / t.qt0 - 1.0) AS volume_eff,
         (m.r0 * 1.0 / m.q0)
           * (m.q1 - m.q0 * (t.qt1 * 1.0 / t.qt0)) AS mix_eff
  FROM matched m CROSS JOIN tot t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
       {sql_round('SUM(delta) / 100.0', 2)} AS revenue_delta,
       {sql_round('SUM(price_eff) / 100.0', 2)} AS price_effect,
       {sql_round('SUM(volume_eff) / 100.0', 2)} AS volume_effect,
       {sql_round('SUM(mix_eff) / 100.0', 2)} AS mix_effect,
       {sql_round(
           '(SUM(delta) - SUM(price_eff) - SUM(volume_eff)'
           ' - SUM(mix_eff)) / 100.0', 2)} AS residual
FROM effects
"""


@register("price_volume_mix", oracle=_B173_ORACLE)
def price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price / volume / mix decomposition of the {PVM_Y0} ->
    {PVM_Y1} revenue change over the matched brand basket: price
    effect = (p1-p0) q1, volume effect = r0 (QT1/QT0 - 1), mix
    effect = p0 (q1 - q0 QT1/QT0) — FP&A's standard additive
    answer to "did we sell at higher prices, sell more overall, or
    shift toward pricier brands", with the residual column proving
    the decomposition closes (B132's discipline). B153's indices
    summarise price level; this allocates the actual dollars.

    Exactness: (brand, year) quantities and revenue are exact
    BIGINTs; effects are identical IEEE shapes over the bounded
    brand frame; the grand-total volume ratio attaches as one
    broadcast scalar.

    Scale shape: one fact aggregate, a |brands|-frame year
    self-join, a 1-row totals attach, one reduction.
    """
    by = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate").isin(PVM_Y0, PVM_Y1))
        .select(
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
            F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
            F.round(F.col("l_extendedprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("cents"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("pk"),
                    F.col("p_brand").alias("brand"),
                )
            ),
            "pk",
        )
        .groupBy("brand", "yr")
        .agg(
            F.sum("qty").cast("bigint").alias("q"),
            F.sum("cents").cast("bigint").alias("r"),
        )
    )
    by = by.persist()
    a = by.where(F.col("yr") == PVM_Y0).select(
        "brand", F.col("q").alias("q0"), F.col("r").alias("r0")
    )
    b = by.where(F.col("yr") == PVM_Y1).select(
        "brand", F.col("q").alias("q1"), F.col("r").alias("r1")
    )
    matched = a.join(b, "brand")
    matched = matched.persist()
    tot = matched.agg(
        F.sum("q0").cast("bigint").alias("qt0"),
        F.sum("q1").cast("bigint").alias("qt1"),
    )
    m = attach_scalars(matched, tot)
    ratio = F.col("qt1") * 1.0 / F.col("qt0")
    p0 = F.col("r0") * 1.0 / F.col("q0")
    p1 = F.col("r1") * 1.0 / F.col("q1")
    effects = m.select(
        (F.col("r1") - F.col("r0")).alias("delta"),
        ((p1 - p0) * F.col("q1")).alias("price_eff"),
        ((F.col("r0") * 1.0) * (ratio - 1.0)).alias("volume_eff"),
        (p0 * (F.col("q1") - F.col("q0") * ratio)).alias("mix_eff"),
    )
    return effects.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
        round_eps(F.sum("delta") / 100.0, 2).alias("revenue_delta"),
        round_eps(F.sum("price_eff") / 100.0, 2).alias("price_effect"),
        round_eps(F.sum("volume_eff") / 100.0, 2).alias("volume_effect"),
        round_eps(F.sum("mix_eff") / 100.0, 2).alias("mix_effect"),
        round_eps(
            (
                F.sum("delta")
                - F.sum("price_eff")
                - F.sum("volume_eff")
                - F.sum("mix_eff")
            )
            / 100.0,
            2,
        ).alias("residual"),
    )


# ---------------------------------------------------------------- C168

_C168_ORACLE = f"""
WITH pairs AS (
  SELECT id_a, id_b FROM ( {_C5_ORACLE} )
),
sp AS (
  SELECT doc_id,
         CASE WHEN {sql_hash64("doc_id::VARCHAR || ':split'")} % 100
                   < {SPLIT_TRAIN} THEN 'train'
              WHEN {sql_hash64("doc_id::VARCHAR || ':split'")} % 100
                   < {SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
classed AS (
  SELECT LEAST(sa.split, sb.split) AS split_a,
         GREATEST(sa.split, sb.split) AS split_b
  FROM pairs
  JOIN sp sa ON pairs.id_a = sa.doc_id
  JOIN sp sb ON pairs.id_b = sb.doc_id
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM classed)
SELECT split_a, split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS BIGINT)
         AS is_leak,
       {sql_round('COUNT(*) * 100.0 / MAX(np)', 4)} AS pct_of_pairs
FROM classed CROSS JOIN tot
GROUP BY split_a, split_b ORDER BY split_a, split_b
"""


@register("split_leakage_audit", oracle=_C168_ORACLE)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: C5's confirmed near-duplicate pairs
    classified by which side of C79's train/val/test split each
    member landed on — cross-split rows (is_leak = 1) are eval
    contamination that document-level hash splitting CANNOT prevent
    when near-dups exist (the fix is splitting by dedup CLUSTER,
    i.e. A11's components, not by doc). Reuses C5's pair pipeline
    and C79's exact split rule, so the audit tracks both verbatim.

    Scale shape: C5's candidate path does the heavy lifting; the
    split label is a pure map expression attached to the (small)
    confirmed-pair frame by two id joins; the report is a <=6-row
    aggregate with a broadcast total attach.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    bucket = (
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":split")))
        % 100
    )
    sp = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )
    classed = (
        pairs.join(
            sp.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
            ),
            "id_a",
        )
        .join(
            sp.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
            ),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
    )
    classed = classed.persist()
    w_all = Window.partitionBy()
    return (
        classed.select(
            "split_a",
            "split_b",
            F.count(F.lit(1)).over(w_all).cast("bigint").alias("np"),
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.max(
                F.when(F.col("split_a") != F.col("split_b"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("is_leak"),
            round_eps(
                F.count(F.lit(1)) * 100.0 / F.max("np"), 4
            ).alias("pct_of_pairs"),
        )
        .select(
            "split_a", "split_b", "n_pairs", "is_leak", "pct_of_pairs"
        )
        .orderBy("split_a", "split_b")
    )
