"""Hundred-first sweep (SURVEY.md §2 B187-B188, C177).

Fixed-effect meta-analysis (inverse-variance pooling of a per-
segment effect with Cochran's Q and I² heterogeneity — the formal
version of "does the effect replicate across strata" that B137's CMH
answers only for odds ratios), A/B sample-size planning (the
required-n grid that should run BEFORE B60's test, from observed
variance), and Burrows' Delta (stylometry's classic authorship
distance — z-scored top-term frequencies, so it measures STYLE where
C170's JS measures distribution mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B187

MF_G1 = "1-URGENT"
MF_G2 = "5-LOW"

_B187_ORACLE = f"""
WITH base AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS f
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderpriority IN ('{MF_G1}', '{MF_G2}')
),
strata AS (
  SELECT seg,
         CAST(SUM(CASE WHEN pri = '{MF_G1}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN pri = '{MF_G1}' THEN f ELSE 0 END)
              AS BIGINT) AS k1,
         CAST(SUM(CASE WHEN pri = '{MF_G2}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN pri = '{MF_G2}' THEN f ELSE 0 END)
              AS BIGINT) AS k2
  FROM base GROUP BY seg
),
eff AS (
  SELECT seg,
         k1 * 1.0 / n1 - k2 * 1.0 / n2 AS d,
         1.0 / ((k1 * 1.0 / n1) * (1 - k1 * 1.0 / n1) / n1
                + (k2 * 1.0 / n2) * (1 - k2 * 1.0 / n2) / n2) AS w
  FROM strata
),
pooled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(w * d) / SUM(w) AS dbar,
         1.0 / sqrt(SUM(w)) AS se
  FROM eff
),
het AS (
  SELECT p.k, p.dbar, p.se,
         SUM(e.w * (e.d - p.dbar) * (e.d - p.dbar)) AS q
  FROM eff e CROSS JOIN pooled p
  GROUP BY p.k, p.dbar, p.se
)
SELECT k AS n_strata,
       {sql_round('dbar', 6)} AS pooled_diff,
       {sql_round('se', 6)} AS pooled_se,
       {sql_round('q', 6)} AS cochran_q,
       {sql_round(
           'GREATEST(0.0, (q - (k - 1)) / q) * 100.0', 4)} AS i_squared_pct
FROM het
"""


@register("meta_fixed_effect", oracle=_B187_ORACLE)
def meta_fixed_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-effect meta-analysis of the '{MF_G1}' vs '{MF_G2}'
    fulfilled-share difference across customer segments:
    inverse-variance pooled effect and SE, Cochran's Q and I² —
    I² near 0 licenses the single pooled number, I² high says the
    effect is segment-specific and pooling hides it (the
    heterogeneity question B129's Simpson audit raises and B137's
    CMH answers only for odds ratios).

    Exactness: per-stratum counts from ONE conditional aggregate;
    effects, weights, Q and I² are O(1) algebra with identical IEEE
    shapes; the pooled scalars attach back to the |strata| frame as
    a broadcast 1-row frame for Q.
    """
    base = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin(MF_G1, MF_G2))
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderpriority").alias("pri"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("f"),
        )
        .join(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("ck"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "ck",
        )
    )
    strata = base.groupBy("seg").agg(
        F.sum(F.when(F.col("pri") == MF_G1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("pri") == MF_G1, F.col("f")).otherwise(0))
        .cast("bigint")
        .alias("k1"),
        F.sum(F.when(F.col("pri") == MF_G2, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.when(F.col("pri") == MF_G2, F.col("f")).otherwise(0))
        .cast("bigint")
        .alias("k2"),
    )
    p1 = F.col("k1") * 1.0 / F.col("n1")
    p2 = F.col("k2") * 1.0 / F.col("n2")
    eff = strata.select(
        "seg",
        (p1 - p2).alias("d"),
        (
            1.0
            / (p1 * (1 - p1) / F.col("n1") + p2 * (1 - p2) / F.col("n2"))
        ).alias("w"),
    )
    eff = eff.persist()
    pooled = eff.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (F.sum(F.col("w") * F.col("d")) / F.sum("w")).alias("dbar"),
        (1.0 / F.sqrt(F.sum("w"))).alias("se"),
    )
    het = (
        eff.transform(scalars(pooled))
        .groupBy("k", "dbar", "se")
        .agg(
            F.sum(
                F.col("w")
                * (F.col("d") - F.col("dbar"))
                * (F.col("d") - F.col("dbar"))
            ).alias("q")
        )
    )
    k, q = F.col("k"), F.col("q")
    return het.select(
        k.alias("n_strata"),
        round_eps(F.col("dbar"), 6).alias("pooled_diff"),
        round_eps(F.col("se"), 6).alias("pooled_se"),
        round_eps(q, 6).alias("cochran_q"),
        round_eps(
            F.greatest(F.lit(0.0), (q - (k - 1)) / q) * 100.0, 4
        ).alias("i_squared_pct"),
    )


# ---------------------------------------------------------------- B188

PW_Z_ALPHA = 1.959963984540054  # two-sided 5%
PW_Z_BETA = 0.8416212335729143  # 80% power
PW_LIFTS = (0.01, 0.02, 0.05)


def _b188_lift_cte(lift: float) -> str:
    return f"""
  SELECT {lift!r} AS lift, p0, p0 + {lift!r} AS p1 FROM base"""


_B188_ORACLE = f"""
WITH base AS (
  SELECT SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           * 1.0 / COUNT(*) AS p0
  FROM events
),
grid AS ({" UNION ALL ".join(_b188_lift_cte(x) for x in PW_LIFTS)}),
calc AS (
  SELECT lift, p0, p1,
         (p0 + p1) / 2.0 AS pbar
  FROM grid
)
SELECT lift,
       {sql_round('p0', 6)} AS baseline_rate,
       {sql_round('p1', 6)} AS target_rate,
       CAST(CEIL((({PW_Z_ALPHA!r} * sqrt(2.0 * pbar * (1 - pbar))
                   + {PW_Z_BETA!r} * sqrt(p0 * (1 - p0) + p1 * (1 - p1)))
                  * ({PW_Z_ALPHA!r} * sqrt(2.0 * pbar * (1 - pbar))
                     + {PW_Z_BETA!r} * sqrt(p0 * (1 - p0)
                                            + p1 * (1 - p1))))
                 / (lift * lift) - 1e-9) AS BIGINT) AS n_per_arm
FROM calc ORDER BY lift
"""


@register("ab_power_planning", oracle=_B188_ORACLE)
def ab_power_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size planning from the OBSERVED baseline
    per-event purchase rate: for absolute lifts of {PW_LIFTS}, the
    exposures per arm needed at alpha = 5% (two-sided) / 80% power
    by the standard
    two-proportion formula — the experiment-design step that should
    run BEFORE B60's z-test ever fires (an underpowered test that
    "finds nothing" is a measurement of nothing). Ceil is taken with
    a 1e-9 inward nudge so both engines land on the same integer.

    Scale shape: the baseline rate is one user-grain aggregate; the
    planning grid is |lifts| rows of O(1) algebra.
    """
    base = load_table(spark, sf_dir, "events").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            * 1.0
            / F.count(F.lit(1))
        ).alias("p0")
    )
    grids = []
    for lift in PW_LIFTS:
        grids.append(
            base.select(
                F.lit(lift).alias("lift"),
                "p0",
                (F.col("p0") + lift).alias("p1"),
            )
        )
    grid = grids[0]
    for g in grids[1:]:
        grid = grid.unionAll(g)
    pbar = (F.col("p0") + F.col("p1")) / 2.0
    half = PW_Z_ALPHA * F.sqrt(2.0 * pbar * (1 - pbar)) + PW_Z_BETA * F.sqrt(
        F.col("p0") * (1 - F.col("p0")) + F.col("p1") * (1 - F.col("p1"))
    )
    return grid.select(
        "lift",
        round_eps(F.col("p0"), 6).alias("baseline_rate"),
        round_eps(F.col("p1"), 6).alias("target_rate"),
        F.ceil(half * half / (F.col("lift") * F.col("lift")) - 1e-9)
        .cast("bigint")
        .alias("n_per_arm"),
    ).orderBy("lift")


# ---------------------------------------------------------------- C177

BD_TOP_TERMS = 50

_C177_ORACLE = f"""
WITH tf AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) GROUP BY source, tok
),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM tf GROUP BY 1),
top_terms AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, tok) AS rk
    FROM tf GROUP BY tok
  ) WHERE rk <= {BD_TOP_TERMS}
),
grid AS (
  SELECT s.source, s.t, tt.tok FROM tot s CROSS JOIN top_terms tt
),
freq AS (
  SELECT g.source, g.tok,
         COALESCE(tf.c, 0) * 1.0 / g.t AS f
  FROM grid g LEFT JOIN tf ON g.source = tf.source AND g.tok = tf.tok
),
zstats AS (
  SELECT tok,
         AVG(f) AS mu,
         sqrt((COUNT(*) * SUM(f * f) - SUM(f) * SUM(f))
              / (COUNT(*) * 1.0 * (COUNT(*) - 1))) AS sd
  FROM freq GROUP BY tok
),
z AS (
  SELECT freq.source, freq.tok, (freq.f - zs.mu) / zs.sd AS z
  FROM freq JOIN zstats zs ON freq.tok = zs.tok
  WHERE zs.sd > 0
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       {sql_round('AVG(ABS(a.z - b.z))', 6)} AS burrows_delta
FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
GROUP BY a.source, b.source ORDER BY src_a, src_b
"""


@register("burrows_delta", oracle=_C177_ORACLE)
def burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every source pair: each of the top-
    {BD_TOP_TERMS} corpus terms' relative frequency is z-scored
    ACROSS sources (zero-filled where a source lacks the term), and
    Delta = mean |z_a - z_b| — stylometry's authorship distance,
    which reads function-word STYLE where C170's JS reads raw
    distribution mass (two sources about different topics can still
    share a Delta-close style, and vice versa — the forensic signal
    for "same generator behind different feeds").

    Scale shape: one token aggregate; top terms by one vocabulary-
    grain rank; the zero-fill grid is a |sources| x |terms|
    dimension cross; z-statistics and the pair deltas all run at
    that bounded grain.
    """
    tf = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tf = tf.persist()
    tot = tf.groupBy("source").agg(F.sum("c").cast("bigint").alias("t"))
    top_terms = (
        tf.groupBy("tok")
        .agg(F.sum("c").alias("gc"))
        .select(
            "tok",
            F.row_number()
            .over(Window.orderBy(F.col("gc").desc(), F.col("tok")))
            .alias("rk"),
        )
        .where(F.col("rk") <= BD_TOP_TERMS)
        .select("tok")
    )
    grid = tot.transform(scalars(top_terms))
    freq = grid.join(tf, ["source", "tok"], "left").select(
        "source",
        "tok",
        (F.coalesce(F.col("c"), F.lit(0)) * 1.0 / F.col("t")).alias("f"),
    )
    freq = freq.persist()
    zstats = freq.groupBy("tok").agg(
        F.avg("f").alias("mu"),
        F.sqrt(
            (
                F.count(F.lit(1)) * F.sum(F.col("f") * F.col("f"))
                - F.sum("f") * F.sum("f")
            )
            / (F.count(F.lit(1)) * 1.0 * (F.count(F.lit(1)) - 1))
        ).alias("sd"),
    )
    z = (
        freq.join(F.broadcast(zstats), "tok")
        .where(F.col("sd") > 0)
        .select(
            "source",
            "tok",
            ((F.col("f") - F.col("mu")) / F.col("sd")).alias("z"),
        )
    )
    a = z.select(
        F.col("source").alias("src_a"), "tok", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"), "tok", F.col("z").alias("zb")
    )
    return (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            round_eps(
                F.avg(F.abs(F.col("za") - F.col("zb"))), 6
            ).alias("burrows_delta"),
        )
        .orderBy("src_a", "src_b")
    )
