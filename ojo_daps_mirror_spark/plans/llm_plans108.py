"""Hundred-eighth sweep (SURVEY.md §2 B200-B201, C185).

Greenwood confidence bands on the Kaplan-Meier curve (the error
bars B72's point estimate ships without — a retention curve with no
bands invites over-reading every wiggle), Gibrat's-law test (is
customer growth independent of size — the null behind every
"small accounts grow faster" claim), and rank-turbulence divergence
(Dodds et al.'s rank-based list divergence — robust where C170's JS
is mass-dominated and C145's RBO only reads the top).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register
from .llm_plans37 import _B72_ORACLE, kaplan_meier_retention

# ---------------------------------------------------------------- B200

_B200_ORACLE = f"""
WITH km AS ( {_B72_ORACLE} ),
g AS (
  SELECT t, n_risk, survival,
         SUM(CASE WHEN n_risk - d <= 0 THEN 0.0
                  ELSE d * 1.0 / (n_risk * 1.0 * (n_risk - d)) END)
           OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS gv
  FROM km
)
SELECT t, n_risk,
       {sql_round('survival', 6)} AS survival,
       {sql_round('survival * sqrt(gv)', 6)} AS greenwood_se,
       {sql_round(
           'GREATEST(0.0, survival - 1.96 * survival * sqrt(gv))', 6)}
         AS ci_lo,
       {sql_round(
           'LEAST(1.0, survival + 1.96 * survival * sqrt(gv))', 6)}
         AS ci_hi
FROM g ORDER BY t
"""


@register("km_greenwood_ci", oracle=_B200_ORACLE)
def km_greenwood_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwood 95% confidence bands on B72's Kaplan-Meier
    activation curve: Var(S) = S^2 sum d/(n(n-d)) accumulated over
    event days, bands clipped to [0, 1] — the error bars that say
    which wiggles in the retention curve are real (and that widen
    honestly as the at-risk set thins, exactly where point-estimate
    over-reading happens). Composes B72's OUTPUT columns verbatim
    (oracle embeds its oracle; the Spark side calls the registered
    query), so curve and bands cannot drift — C63's no-drift recipe
    on the survival side.

    Scale shape: one cumulative window over B72's bounded day frame.
    """
    km = kaplan_meier_retention(spark, sf_dir)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    term = F.when(
        F.col("n_risk") - F.col("d") <= 0, 0.0
    ).otherwise(
        F.col("d") * 1.0 / (F.col("n_risk") * 1.0 * (F.col("n_risk") - F.col("d")))
    )
    g = km.select(
        "t",
        "n_risk",
        "survival",
        F.sum(term).over(w_cum).alias("gv"),
    )
    se = F.col("survival") * F.sqrt(F.col("gv"))
    return g.select(
        "t",
        "n_risk",
        round_eps(F.col("survival"), 6).alias("survival"),
        round_eps(se, 6).alias("greenwood_se"),
        round_eps(
            F.greatest(F.lit(0.0), F.col("survival") - 1.96 * se), 6
        ).alias("ci_lo"),
        round_eps(
            F.least(F.lit(1.0), F.col("survival") + 1.96 * se), 6
        ).alias("ci_hi"),
    ).orderBy("t")


# ---------------------------------------------------------------- B201

GB_Y0 = 1996
GB_Y1 = 1997

_B201_ORACLE = f"""
WITH per_year AS (
  SELECT o_custkey AS c, CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders WHERE year(o_orderdate) IN ({GB_Y0}, {GB_Y1})
  GROUP BY 1, 2
),
cohort AS (
  SELECT ln(a.rev * 1.0) AS x, ln(b.rev * 1.0 / a.rev) AS g
  FROM (SELECT * FROM per_year WHERE yr = {GB_Y0}) a
  JOIN (SELECT * FROM per_year WHERE yr = {GB_Y1}) b USING (c)
),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(g) AS sg,
         SUM(x * x) AS sxx, SUM(x * g) AS sxg, SUM(g * g) AS sgg
  FROM cohort
),
fit AS (
  SELECT n,
         (n * sxg - sx * sg) / (n * sxx - sx * sx) AS beta,
         sg / n AS gbar,
         (sgg - sg * sg / n
          - ((n * sxg - sx * sg) / (n * sxx - sx * sx))
            * (sxg - sx * sg / n)) / (n - 2) AS s2e,
         sxx - sx * sx / n AS cxx
  FROM suff
)
SELECT n AS n_customers,
       {sql_round('gbar', 6)} AS mean_log_growth,
       {sql_round('beta', 6)} AS gibrat_beta,
       {sql_round('sqrt(s2e / cxx)', 6)} AS beta_se,
       {sql_round('beta / sqrt(s2e / cxx)', 6)} AS t_stat
FROM fit
"""


@register("gibrat_law_test", oracle=_B201_ORACLE)
def gibrat_law_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gibrat's law test on customer revenue: regress log growth
    ({GB_Y0} -> {GB_Y1}) on log initial size — beta = 0 means growth
    is independent of size (Gibrat holds, and the size distribution
    drifts lognormal); beta < 0 is mean reversion (small accounts
    catching up — partly B77-style regression to the mean, which is
    WHY this test exists), beta > 0 is rich-get-richer. With the
    OLS standard error and t so the verdict has an error bar.

    Exactness: yearly revenue is exact cents; logs and the OLS
    sufficient statistics are identical IEEE shapes over the cohort
    frame; estimator algebra is O(1).

    Scale shape: one fact aggregate to (customer, year), a key
    self-join, one sufficient-stats reduction.
    """
    per_year = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(GB_Y0, GB_Y1))
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
    a = per_year.where(F.col("yr") == GB_Y0).select(
        "c", F.col("rev").alias("r0")
    )
    b = per_year.where(F.col("yr") == GB_Y1).select(
        "c", F.col("rev").alias("r1")
    )
    cohort = a.join(b, "c").select(
        F.log(F.col("r0") * 1.0).alias("x"),
        F.log(F.col("r1") * 1.0 / F.col("r0")).alias("g"),
    )
    suff = cohort.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("g").alias("sg"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("g")).alias("sxg"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    )
    n = F.col("n")
    beta = (n * F.col("sxg") - F.col("sx") * F.col("sg")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    s2e = (
        F.col("sgg")
        - F.col("sg") * F.col("sg") / n
        - beta * (F.col("sxg") - F.col("sx") * F.col("sg") / n)
    ) / (n - 2)
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    se = F.sqrt(s2e / cxx)
    return suff.select(
        n.alias("n_customers"),
        round_eps(F.col("sg") / n, 6).alias("mean_log_growth"),
        round_eps(beta, 6).alias("gibrat_beta"),
        round_eps(se, 6).alias("beta_se"),
        round_eps(beta / se, 6).alias("t_stat"),
    )


# ---------------------------------------------------------------- C185

_C185_ORACLE = f"""
WITH tf AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) GROUP BY source, tok
),
ranked AS (
  SELECT source, tok,
         1.0 / ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY c DESC, tok) AS ir
  FROM tf
),
per_src AS (
  SELECT source, SUM(ir) AS h FROM ranked GROUP BY source
),
inner_pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS shared,
         SUM(ABS(a.ir - b.ir)) AS cross_term,
         SUM(a.ir) AS sha, SUM(b.ir) AS shb
  FROM ranked a JOIN ranked b
    ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.shared AS shared_vocab,
       {sql_round(
           '(i.cross_term + (pa.h - i.sha) + (pb.h - i.shb))'
           ' / (pa.h + pb.h)', 6)} AS rtd_alpha1
FROM inner_pairs i
JOIN per_src pa ON i.src_a = pa.source
JOIN per_src pb ON i.src_b = pb.source
ORDER BY src_a, src_b
"""


@register("rank_turbulence_divergence", oracle=_C185_ORACLE)
def rank_turbulence_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-turbulence divergence (Dodds et al. 2020, alpha = 1)
    between every source pair's word RANK lists, normalised by the
    disjoint-lists bound: |1/r_a - 1/r_b| summed over the union,
    with words absent from a source contributing 1/r of the side
    that has them (1/inf = 0 on the other). Rank-based, so it is
    robust where C170's JS is dominated by a few heavy words, and
    it reads the WHOLE list where C145's RBO discounts past the
    top. One-sided mass folds into per-source harmonic totals, so —
    like the JS matrix — the whole computation runs off the
    SHARED-vocabulary join alone.

    Scale shape: per-source ranks are windows over vocabulary-grain
    partitions; one token-key equi self-join; per-source totals
    attach by source key.
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
    ranked = tf.select(
        "source",
        "tok",
        (
            1.0
            / F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("c").desc(), F.col("tok")
                )
            )
        ).alias("ir"),
    )
    ranked = ranked.persist()
    per_src = ranked.groupBy("source").agg(F.sum("ir").alias("h"))
    a = ranked.select(
        F.col("source").alias("src_a"), "tok", F.col("ir").alias("ira")
    )
    b = ranked.select(
        F.col("source").alias("src_b"), "tok", F.col("ir").alias("irb")
    )
    inner = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("shared"),
            F.sum(F.abs(F.col("ira") - F.col("irb"))).alias("cross_term"),
            F.sum("ira").alias("sha"),
            F.sum("irb").alias("shb"),
        )
    )
    out = (
        inner.join(
            F.broadcast(
                per_src.select(
                    F.col("source").alias("src_a"), F.col("h").alias("ha")
                )
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                per_src.select(
                    F.col("source").alias("src_b"), F.col("h").alias("hb")
                )
            ),
            "src_b",
        )
    )
    rtd = (
        F.col("cross_term")
        + (F.col("ha") - F.col("sha"))
        + (F.col("hb") - F.col("shb"))
    ) / (F.col("ha") + F.col("hb"))
    return out.select(
        "src_a",
        "src_b",
        F.col("shared").alias("shared_vocab"),
        round_eps(rtd, 6).alias("rtd_alpha1"),
    ).orderBy("src_a", "src_b")
