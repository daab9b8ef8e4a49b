"""Sixty-eighth sweep (SURVEY.md §2 B125-B126, C140).

Haar wavelet multi-resolution energy of the weekly volume series (at
which timescale does the variance live — the screen that picks
between B39's weekly and B49's seasonal lenses), the scalar
ECE/MCE calibration summary over B110's reliability bins (the one
number a model gate thresholds on), and Cohen's kappa for the C3
language-ID classifier (chance-corrected agreement — accuracy is
inflated when one class dominates; kappa is the honest number).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_hash64, hash64
from ..operators.attach import scalars
from ..sources import load_table
from . import register
from .llm_plans57 import CAL_BINS
from .text_plans import _C3_ORACLE, lang_id

# ---------------------------------------------------------------- B125

HAAR_N = 128  # zero-padded series length (≥ |weeks|), power of two
HAAR_LEVELS = 7


def _b125_oracle() -> str:
    return f"""
WITH weekly AS (
  SELECT DATE_TRUNC('week', o_orderdate) AS wk,
         CAST(COUNT(*) AS BIGINT) AS vol
  FROM orders GROUP BY 1
),
arr AS (
  SELECT list(vol ORDER BY wk)
         || list_transform(range({HAAR_N}), i -> CAST(0 AS BIGINT)) AS v0
  FROM weekly
),
padded AS (SELECT v0[1:{HAAR_N}] AS v FROM arr),
grid AS (
  SELECT l.lvl, b.blk, v
  FROM padded
  CROSS JOIN (SELECT unnest(generate_series(1, {HAAR_LEVELS})) AS lvl) l
  CROSS JOIN (SELECT unnest(generate_series(0, {HAAR_N // 2 - 1})) AS blk) b
  WHERE b.blk < {HAAR_N} // (1 << l.lvl)
),
details AS (
  SELECT lvl,
         COALESCE(list_sum(v[blk * (1 << lvl) + 1
                             : blk * (1 << lvl) + (1 << (lvl - 1))]), 0)
         - COALESCE(list_sum(v[blk * (1 << lvl) + (1 << (lvl - 1)) + 1
                               : (blk + 1) * (1 << lvl)]), 0) AS d
  FROM grid
)
SELECT CAST(lvl AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_coeffs,
       CAST(SUM(d * d) AS BIGINT) AS energy
FROM details GROUP BY lvl ORDER BY level
"""


@register("haar_energy", oracle=_b125_oracle())
def haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalised Haar wavelet decomposition of the weekly order
    volume series (zero-padded to 128): per level, the detail-energy
    Σ(left-half-sum − right-half-sum)² over blocks of 2^level weeks —
    the multi-resolution screen that says WHERE the variance lives
    (level 1 ≈ week-to-week noise, level 5-6 ≈ quarterly structure)
    and therefore which lens (B39's weekly anomaly flags vs B49's
    seasonal decomposition) fits the series. Unnormalised transform
    keeps every coefficient an exact BIGINT.

    Scale shape: the fact stream collapses to |weeks| rows, then to
    ONE padded array row; each detail coefficient is a direct
    slice-sum of that array (no sequential fold — prefix structure
    makes levels independent), and the (level, block) grid is
    dimension-scale.
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("wk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("vol"))
    )
    arr = weekly.agg(
        F.concat(
            F.transform(
                F.array_sort(F.collect_list(F.struct("wk", "vol"))),
                lambda s: s["vol"],
            ),
            F.array_repeat(F.lit(0).cast("bigint"), HAAR_N),
        ).alias("v0")
    ).select(F.slice("v0", 1, HAAR_N).alias("v"))
    lvls = arr.select(
        "v",
        F.explode(
            F.sequence(F.lit(1), F.lit(HAAR_LEVELS))
        ).alias("lvl"),
    )
    blocks = lvls.select(
        "v",
        "lvl",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(F.lit(HAAR_N) / F.pow(2.0, F.col("lvl"))).cast("int")
                - 1,
            )
        ).alias("blk"),
    )
    half = F.pow(2.0, F.col("lvl") - 1).cast("int")
    full = F.pow(2.0, F.col("lvl")).cast("int")
    left = F.aggregate(
        F.slice(F.col("v"), F.col("blk") * full + 1, half),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )
    right = F.aggregate(
        F.slice(F.col("v"), F.col("blk") * full + half + 1, half),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )
    details = blocks.select(
        "lvl", (left - right).alias("d")
    )
    return (
        details.groupBy(F.col("lvl").cast("bigint").alias("level"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
            F.sum(F.col("d") * F.col("d")).cast("bigint").alias("energy"),
        )
        .orderBy("level")
    )


# ---------------------------------------------------------------- B126

_B126_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         CAST({sql_hash64("user_id::VARCHAR || ':score'")} % 100000
              AS BIGINT) AS s5,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
binned AS (
  SELECT LEAST(s5 * {CAL_BINS} // 100000, {CAL_BINS - 1}) AS bin, s5, y
  FROM users
),
per_bin AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(s5) * 1.0 / COUNT(*) / 100000 - SUM(y) * 1.0 / COUNT(*) AS gap
  FROM binned GROUP BY bin
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(n) AS BIGINT) AS n_users,
       {sql_round('SUM(n * ABS(gap)) / SUM(n)', 6)} AS ece,
       {sql_round('MAX(ABS(gap))', 6)} AS mce
FROM per_bin
"""


@register("ece_summary", oracle=_B126_ORACLE)
def ece_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / Maximum Calibration Error over B110's reliability
    bins: ECE = Σ (n_b/N)·|mean_pred − observed|, MCE = max |gap| —
    the scalar a deployment gate thresholds on (the reliability
    DIAGRAM is for humans; the gate needs one number, and MCE next to
    ECE catches the single badly-miscalibrated bin a small average
    hides). Same bins, same exact k/100000 rational scores as B110,
    so diagram and gate can never disagree.

    Scale shape: users collapse once, bins in one aggregate, the
    summary is a 10-row reduction.
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("y")
        )
        .select(
            (
                hash64(
                    F.concat(F.col("user_id").cast("string"), F.lit(":score"))
                )
                % 100000
            ).alias("s5"),
            "y",
        )
    )
    per_bin = (
        users.groupBy(
            F.least(
                F.floor(F.col("s5") * CAL_BINS / 100000).cast("bigint"),
                F.lit(CAL_BINS - 1),
            ).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.sum("s5") * 1.0 / F.count(F.lit(1)) / 100000
                - F.sum("y") * 1.0 / F.count(F.lit(1))
            ).alias("gap"),
        )
    )
    return per_bin.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("n").cast("bigint").alias("n_users"),
        round_eps(
            F.sum(F.col("n") * F.abs(F.col("gap"))) / F.sum("n"), 6
        ).alias("ece"),
        round_eps(F.max(F.abs(F.col("gap"))), 6).alias("mce"),
    )


# ---------------------------------------------------------------- C140

_C140_ORACLE = f"""
WITH preds AS ({_C3_ORACLE}),
labeled AS (
  SELECT d.lang AS actual, p.pred_lang AS pred
  FROM preds p JOIN documents d USING (doc_id)
),
cells AS (
  SELECT actual, pred, CAST(COUNT(*) AS BIGINT) AS c
  FROM labeled GROUP BY 1, 2
),
marg AS (
  SELECT t.n, t.agree, p.pe_num
  FROM (
    SELECT CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN actual = pred THEN c ELSE 0 END) AS BIGINT)
             AS agree
    FROM cells
  ) t
  CROSS JOIN (
    SELECT CAST(SUM(rm * cm) AS BIGINT) AS pe_num
    FROM (SELECT actual, SUM(c) AS rm FROM cells GROUP BY 1) a
    JOIN (SELECT pred, SUM(c) AS cm FROM cells GROUP BY 1) b
      ON a.actual = b.pred
  ) p
)
SELECT n AS n_docs, agree,
       {sql_round('agree * 1.0 / n', 6)} AS accuracy,
       {sql_round('pe_num * 1.0 / (n * n)', 6)} AS expected_agreement,
       {sql_round('(n * agree - pe_num) * 1.0 / (n * n - pe_num)', 6)}
         AS kappa
FROM marg
"""


@register("cohens_kappa", oracle=_C140_ORACLE)
def cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the C3 language-ID classifier against the
    ground-truth lang column: κ = (pₒ − pₑ)/(1 − pₑ) with pₑ from the
    marginal products — the chance-corrected agreement that deflates
    C3's raw accuracy when one language dominates (a constant-"en"
    classifier scores high accuracy and κ ≈ 0; C63's confusion matrix
    shows WHERE it errs, κ says WHETHER it beats chance at all).
    Everything stays in exact integers (N·agree − Σrm·cm over
    N² − Σrm·cm) until the final division.

    Scale shape: C3's map-side scoring, one (actual, pred) cell
    aggregate (≤16 cells), marginals derived from the cells — the
    kappa arithmetic is a 1-row reduction.
    """
    preds = lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    actual = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    cells = (
        preds.join(actual, "doc_id")
        .groupBy(
            F.col("lang").alias("actual"), F.col("pred_lang").alias("pred")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cells = cells.persist()
    rm = cells.groupBy("actual").agg(F.sum("c").alias("rm"))
    cm = cells.groupBy("pred").agg(F.sum("c").alias("cm"))
    pe = (
        rm.join(cm, F.col("actual") == F.col("pred"))
        .agg(F.sum(F.col("rm") * F.col("cm")).cast("bigint").alias("pe_num"))
    )
    tot = cells.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("actual") == F.col("pred"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    return tot.transform(scalars(pe)).select(
        F.col("n").alias("n_docs"),
        "agree",
        round_eps(F.col("agree") * 1.0 / F.col("n"), 6).alias("accuracy"),
        round_eps(
            F.col("pe_num") * 1.0 / (F.col("n") * F.col("n")), 6
        ).alias("expected_agreement"),
        round_eps(
            (F.col("n") * F.col("agree") - F.col("pe_num"))
            * 1.0
            / (F.col("n") * F.col("n") - F.col("pe_num")),
            6,
        ).alias("kappa"),
    )
