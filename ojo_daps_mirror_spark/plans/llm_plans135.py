"""Hundred-thirty-fifth sweep (SURVEY.md §2 B250-B251, C220).

Sen's slope confidence interval (Theil-Sen B92 gives the point
estimate; Gilbert's rank-selected bounds give the inference — the
nonparametric trend CI regulators actually quote), the Lorenz
asymmetry coefficient (Gini says HOW unequal, LAC says WHO drives it
— many small units vs few giant ones land on opposite sides of 1 at
the same Gini), and keep-best dedup (the FIX for the min-id exemplar
bias that exemplar_quality_bias measured: per duplicate component,
keep the argmax-quality member — richest vocabulary, deterministic
tiebreak — and report exactly where it disagrees with keep-min-id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.dedup import chain_edges, connected_components
from ..operators.attach import attach_scalars, scalars
from ..operators.rank import global_order_stats
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B250

SEN_Z = 1.959964  # two-sided 95%

_B250_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
pts AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY w) AS BIGINT) AS t, y
  FROM weekly
),
slopes AS (
  SELECT (CAST(b.y AS DOUBLE) - a.y) / (b.t - a.t) AS s
  FROM pts a JOIN pts b ON b.t > a.t
),
ranked AS (
  SELECT s, CAST(ROW_NUMBER() OVER (ORDER BY s) AS BIGINT) AS r,
         CAST(COUNT(*) OVER () AS BIGINT) AS np
  FROM slopes
),
ties AS (
  SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS DOUBLE)
           AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pts GROUP BY y)
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
cuts AS (
  SELECT np,
         CAST(FLOOR((np - {SEN_Z!r} * sqrt(
             (n * (n - 1.0) * (2 * n + 5) - tie_term) / 18.0)) / 2.0)
           AS BIGINT) AS rlo,
         CAST(FLOOR((np + {SEN_Z!r} * sqrt(
             (n * (n - 1.0) * (2 * n + 5) - tie_term) / 18.0)) / 2.0)
           AS BIGINT) + 1 AS rhi
  FROM ties, nn, (SELECT MAX(np) AS np FROM ranked)
)
SELECT (SELECT MAX(n) FROM nn) AS n_weeks,
       c.np AS n_slopes,
       {sql_round('(SELECT quantile_cont(s, 0.5) FROM slopes)', 6)}
         AS sen_slope,
       {sql_round('(SELECT s FROM ranked WHERE r = GREATEST(c.rlo, 1))',
                  6)} AS ci95_lo,
       {sql_round('(SELECT s FROM ranked WHERE r = LEAST(c.rhi, c.np))',
                  6)} AS ci95_hi,
       CASE WHEN (SELECT s FROM ranked WHERE r = GREATEST(c.rlo, 1)) > 0
              OR (SELECT s FROM ranked WHERE r = LEAST(c.rhi, c.np)) < 0
            THEN 1 ELSE 0 END AS trend_significant_5pct
FROM cuts c
"""


@register("sen_slope_ci", oracle=_B250_ORACLE)
def sen_slope_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sen's slope with Gilbert's 95% confidence bounds: the
    Theil-Sen point estimate (B92) plus the nonparametric CI —
    order the N' pairwise slopes and read the bounds at ranks
    (N' -/+ z*sqrt(Var_MK))/2, where Var_MK is the Mann-Kendall
    tie-corrected variance (B152's machinery, reused as the
    slope-rank dispersion). This is the trend interval
    environmental/regulatory practice quotes, and 'CI excludes 0'
    here IS the Mann-Kendall significance call made through the
    estimate instead of beside it.

    Exactness: slopes are exact-integer ratios; the rank cuts are
    exact integer arithmetic off exact tie sums; bound selection is
    rank-indexed, not interpolated.

    Scale shape: the |weeks|^2/2 slope frame (series-sized), one
    rank window, two rank lookups.
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (
                F.datediff(
                    F.date_trunc("week", F.col("o_orderdate")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    pts = weekly.select(
        F.row_number().over(Window.orderBy("w")).cast("bigint").alias("t"),
        "y",
    )
    pts = pts.persist()
    a = pts.alias("a")
    b = pts.alias("b")
    slopes = a.join(b, F.col("b.t") > F.col("a.t")).select(
        (
            (F.col("b.y").cast("double") - F.col("a.y"))
            / (F.col("b.t") - F.col("a.t"))
        ).alias("s")
    )
    slopes = slopes.persist()
    ranked = slopes.select(
        "s",
        F.row_number().over(Window.orderBy("s")).cast("bigint").alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("np"),
    )
    dec = "decimal(38,0)"
    ties = (
        pts.groupBy("y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(
                F.col("t").cast(dec) * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("double")
            .alias("tie_term")
        )
    )
    nn = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    np_ = ranked.agg(F.max("np").alias("np"))
    var_mk = (
        F.col("n") * (F.col("n") - 1.0) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / 18.0
    cuts = (
        ties.transform(scalars(nn))
        .transform(scalars(np_))
        .select(
            F.col("np").alias("npc"),
            "n",
            F.floor((F.col("np") - SEN_Z * F.sqrt(var_mk)) / 2.0)
            .cast("bigint")
            .alias("rlo"),
            (
                F.floor((F.col("np") + SEN_Z * F.sqrt(var_mk)) / 2.0)
                .cast("bigint")
                + 1
            ).alias("rhi"),
        )
    )
    sen = slopes.agg(F.expr("percentile(s, 0.5)").alias("sen_slope"))
    picked = (
        ranked.drop("np")
        .transform(scalars(cuts))
        .select(
            "s",
            "r",
            F.col("npc").alias("np"),
            "n",
            F.greatest(F.col("rlo"), F.lit(1)).alias("rlo"),
            F.least(F.col("rhi"), F.col("npc")).alias("rhi"),
        )
        .where((F.col("r") == F.col("rlo")) | (F.col("r") == F.col("rhi")))
        .groupBy("np", "n")
        .agg(
            F.min(F.when(F.col("r") == F.col("rlo"), F.col("s"))).alias(
                "lo"
            ),
            F.min(F.when(F.col("r") == F.col("rhi"), F.col("s"))).alias(
                "hi"
            ),
        )
    )
    out = picked.transform(scalars(sen))
    return out.select(
        F.col("n").alias("n_weeks"),
        F.col("np").alias("n_slopes"),
        round_eps(F.col("sen_slope"), 6).alias("sen_slope"),
        round_eps(F.col("lo"), 6).alias("ci95_lo"),
        round_eps(F.col("hi"), 6).alias("ci95_hi"),
        ((F.col("lo") > 0) | (F.col("hi") < 0))
        .cast("int")
        .alias("trend_significant_5pct"),
    )


# ---------------------------------------------------------------- B251

_B251_ORACLE = f"""
WITH cust_rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv
  FROM cust_rev
),
sorted_ AS (
  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, o_custkey) AS BIGINT)
           AS r,
         CAST(SUM(v) OVER (ORDER BY v, o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM cust_rev
),
below AS (
  SELECT m.n, m.sv,
         CAST(MAX(CASE WHEN s.v * m.n < m.sv THEN s.r ELSE 0 END)
              AS BIGINT) AS m_cnt,
         CAST(MAX(CASE WHEN s.v * m.n < m.sv THEN s.cum ELSE 0 END)
              AS BIGINT) AS lm
  FROM sorted_ s, mom m
  GROUP BY m.n, m.sv
),
bracket AS (
  SELECT b.n, b.sv, b.m_cnt, b.lm,
         (SELECT v FROM sorted_ WHERE r = b.m_cnt) AS xm,
         (SELECT v FROM sorted_ WHERE r = b.m_cnt + 1) AS xm1
  FROM below b
),
lac AS (
  SELECT n, m_cnt,
         (CAST(sv AS DOUBLE) / n - xm) / (xm1 - xm) AS delta,
         CAST(m_cnt AS DOUBLE) / n AS f_mu,
         CAST(lm AS DOUBLE) / sv AS l_mu,
         CAST(xm1 AS DOUBLE) / sv AS xm1_share
  FROM bracket
)
SELECT n AS n_customers, m_cnt AS below_mean,
       {sql_round('f_mu + delta / n', 6)} AS f_at_mean,
       {sql_round('l_mu + delta * xm1_share', 6)} AS l_at_mean,
       {sql_round('f_mu + delta / n + l_mu + delta * xm1_share', 6)}
         AS lorenz_asymmetry,
       CASE WHEN f_mu + delta / n + l_mu + delta * xm1_share > 1
            THEN 'few-large-units' ELSE 'many-small-units' END
         AS inequality_driver
FROM lac
"""


@register("lorenz_asymmetry", oracle=_B251_ORACLE)
def lorenz_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz asymmetry coefficient (Damgaard-Weiner) of customer
    revenue: Gini (B-track) says HOW unequal; LAC says WHO drives it
    — S = F(mu) + L(mu) evaluated where the Lorenz curve is steepest
    (at the mean), with S > 1 meaning a few GIANT customers carry
    the inequality and S < 1 meaning a mass of small ones does. Two
    revenue books with identical Gini can sit on opposite sides of
    1 — and need opposite retention strategies. Interpolation term
    delta handled exactly per the original formula.

    Exactness: revenues are exact cent integers; the below-mean
    count, bracketing order statistics and cumulative sums are
    exact; delta is a ratio of exact integers.

    Scale shape: one fact aggregate to customer grain, one sorted
    prefix window, two rank lookups, one reduction.
    """
    cust_rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("v")
        )
    )
    mom = cust_rev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sv"),
    )
    # Rank + running revenue via the range-partitioned two-phase
    # pass — no single-reducer window over the customer-grain frame
    # (operators/rank.py).
    sorted_ = global_order_stats(
        cust_rev, ["v", "o_custkey"], rn_col="r", cumsum={"cum": "v"}
    ).select("v", F.col("r").cast("bigint").alias("r"),
             F.col("cum").cast("bigint").alias("cum"))
    sorted_ = sorted_.persist()
    below = (
        attach_scalars(sorted_, mom)
        .groupBy("n", "sv")
        .agg(
            F.max(
                F.when(F.col("v") * F.col("n") < F.col("sv"), F.col("r"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("m_cnt"),
            F.max(
                F.when(F.col("v") * F.col("n") < F.col("sv"), F.col("cum"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("lm"),
        )
    )
    xm = sorted_.select(F.col("r").alias("rm"), F.col("v").alias("xm"))
    xm1 = sorted_.select(
        F.col("r").alias("rm1"), F.col("v").alias("xm1")
    )
    bracket = (
        below.join(F.broadcast(xm), below.m_cnt == xm.rm)
        .join(F.broadcast(xm1), below.m_cnt + 1 == xm1.rm1)
    )
    delta = (
        F.col("sv").cast("double") / F.col("n") - F.col("xm")
    ) / (F.col("xm1") - F.col("xm"))
    f_mu = F.col("m_cnt").cast("double") / F.col("n")
    l_mu = F.col("lm").cast("double") / F.col("sv")
    xm1_share = F.col("xm1").cast("double") / F.col("sv")
    s = f_mu + delta / F.col("n") + l_mu + delta * xm1_share
    return bracket.select(
        F.col("n").alias("n_customers"),
        F.col("m_cnt").alias("below_mean"),
        round_eps(f_mu + delta / F.col("n"), 6).alias("f_at_mean"),
        round_eps(l_mu + delta * xm1_share, 6).alias("l_at_mean"),
        round_eps(s, 6).alias("lorenz_asymmetry"),
        F.when(s > 1, "few-large-units")
        .otherwise("many-small-units")
        .alias("inequality_driver"),
    )


# ---------------------------------------------------------------- C220

_C220_ORACLE = """
WITH comp AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40)))
           AS component_id,
         COUNT(*) OVER (PARTITION BY md5(substr(text, 1, 40)))
           AS group_size
  FROM documents
),
quality AS (
  SELECT doc_id,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS q
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS tok
        FROM documents)
  GROUP BY doc_id
),
scored AS (
  SELECT c.component_id, c.doc_id, c.group_size, q.q,
         ROW_NUMBER() OVER (PARTITION BY c.component_id
                            ORDER BY q.q DESC, c.doc_id) AS rk
  FROM comp c JOIN quality q USING (doc_id)
  WHERE c.group_size > 1
),
picked AS (
  SELECT component_id, CAST(group_size AS BIGINT) AS group_size,
         MAX(CASE WHEN rk = 1 THEN doc_id END) AS best_exemplar,
         MAX(CASE WHEN rk = 1 THEN q END) AS best_quality,
         MAX(CASE WHEN doc_id = component_id THEN q END)
           AS minid_quality
  FROM scored
  GROUP BY component_id, group_size
)
SELECT component_id, group_size,
       CAST(best_exemplar AS BIGINT) AS best_exemplar,
       CAST(best_quality AS BIGINT) AS best_quality,
       CAST(minid_quality AS BIGINT) AS minid_quality,
       CASE WHEN best_exemplar <> component_id THEN 1 ELSE 0 END
         AS choice_changed,
       CAST(best_quality - minid_quality AS BIGINT) AS quality_gain
FROM picked
ORDER BY component_id
"""


@register("dedup_keep_best", oracle=_C220_ORACLE)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST dedup — the fix for the bias exemplar_quality_bias
    measured: per duplicate component (the A11 connected-components
    machinery over prefix-key chain edges), keep the member with the
    richest vocabulary (distinct-token count, doc_id tiebreak)
    instead of the smallest id. The output holds both choices side
    by side: choice_changed marks components where min-id and
    argmax-quality disagree, quality_gain is exactly what switching
    buys. At 100 TB this is the difference between a dedup that
    systematically keeps the earliest-crawled (often shortest,
    template-laden) copy and one that keeps the best one.

    Exactness: components reproduce the A11 closed-form oracle;
    quality is an exact distinct count; argmax tiebreak is total.

    Scale shape: the same iterative CC as A11 (edge-incident
    vertices only), one (doc, token) distinct aggregate for quality,
    one per-component argmax window over members of multi-doc
    components only.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.substring(F.col("text"), 1, 40))
    edges = chain_edges(docs, "doc_id", key)
    comps = connected_components(
        edges, docs.select("doc_id"), id_col="doc_id"
    )
    sizes = comps.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size")
    )
    quality = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias(
                "tok"
            ),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("tok").cast("bigint").alias("q"))
    )
    members = (
        comps.join(F.broadcast(sizes), "component_id")
        .where(F.col("group_size") > 1)
        .join(quality, "doc_id")
    )
    scored = members.select(
        "component_id",
        "doc_id",
        "group_size",
        "q",
        F.row_number()
        .over(
            Window.partitionBy("component_id").orderBy(
                F.col("q").desc(), "doc_id"
            )
        )
        .alias("rk"),
    )
    picked = scored.groupBy("component_id", "group_size").agg(
        F.max(F.when(F.col("rk") == 1, F.col("doc_id")))
        .cast("bigint")
        .alias("best_exemplar"),
        F.max(F.when(F.col("rk") == 1, F.col("q")))
        .cast("bigint")
        .alias("best_quality"),
        F.max(
            F.when(F.col("doc_id") == F.col("component_id"), F.col("q"))
        )
        .cast("bigint")
        .alias("minid_quality"),
    )
    return picked.select(
        "component_id",
        "group_size",
        "best_exemplar",
        "best_quality",
        "minid_quality",
        (F.col("best_exemplar") != F.col("component_id"))
        .cast("int")
        .alias("choice_changed"),
        (F.col("best_quality") - F.col("minid_quality"))
        .cast("bigint")
        .alias("quality_gain"),
    ).orderBy("component_id")
