"""Eighty-seventh sweep (SURVEY.md §2 B160-B161, C162).

Shewhart X-bar/R control chart (the SPC limits that distinguish
common-cause noise from assignable causes — what B110's z-flags
approximate without subgrouping), the ABC-XYZ inventory matrix
(value concentration x demand variability — the 9-cell planning
grid B73's ABC alone can't give), and the vocabulary coverage curve
(what share of token mass the top-K words carry — the tokenizer/
vocab-truncation budget number between C126's Zipf fit and C144's
OOV rate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B160

SPC_N = 7  # subgroup size: one calendar week of daily values
SPC_A2 = 0.419  # Shewhart constants for n=7
SPC_D3 = 0.076
SPC_D4 = 1.924

_B160_ORACLE = f"""
WITH daily AS (
  SELECT date_trunc('week', o_orderdate)::DATE AS wk, o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1, 2
),
sub AS (
  SELECT wk,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(MAX(v) - MIN(v) AS BIGINT) AS r
  FROM daily GROUP BY wk
  HAVING COUNT(*) = {SPC_N}
),
grand AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
         AVG(s * 1.0 / {SPC_N}) AS xbb,
         AVG(r * 1.0) AS rbar
  FROM sub
),
lim AS (
  SELECT n_weeks, xbb, rbar,
         xbb + {SPC_A2!r} * rbar AS uclx,
         xbb - {SPC_A2!r} * rbar AS lclx,
         {SPC_D4!r} * rbar AS uclr,
         {SPC_D3!r} * rbar AS lclr
  FROM grand
),
flags AS (
  SELECT l.n_weeks, l.xbb, l.rbar, l.uclx, l.lclx, l.uclr, l.lclr,
         CAST(SUM(CASE WHEN s.s * 1.0 / {SPC_N} > l.uclx
                         OR s.s * 1.0 / {SPC_N} < l.lclx
                       THEN 1 ELSE 0 END) AS BIGINT) AS oob_mean,
         CAST(SUM(CASE WHEN s.r > l.uclr OR s.r < l.lclr
                       THEN 1 ELSE 0 END) AS BIGINT) AS oob_range
  FROM sub s CROSS JOIN lim l
  GROUP BY 1, 2, 3, 4, 5, 6, 7
)
SELECT n_weeks,
       {sql_round('xbb / 100.0', 4)} AS xbar_bar,
       {sql_round('rbar / 100.0', 4)} AS r_bar,
       {sql_round('uclx / 100.0', 4)} AS ucl_mean,
       {sql_round('lclx / 100.0', 4)} AS lcl_mean,
       {sql_round('uclr / 100.0', 4)} AS ucl_range,
       oob_mean, oob_range
FROM flags
"""


@register("spc_control_chart", oracle=_B160_ORACLE)
def spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart X-bar / R control chart over weekly subgroups of
    daily revenue (n = {SPC_N} days): grand mean, average range,
    A2/D3/D4 control limits, and the count of out-of-control weeks
    on each chart — the SPC discipline that separates common-cause
    variation from assignable causes, where B110's plain z-flags
    conflate within-week and between-week variance.

    Exactness: subgroup sums and ranges are exact BIGINT cents;
    only complete {SPC_N}-day weeks enter (exact count filter);
    grand averages run over the bounded |weeks| frame; limits are
    O(1) constants algebra.

    Scale shape: fact to (week, day) grain once, subgroup stats at
    |weeks| grain, a broadcast 1-row limits attach for the flag
    counts — dimension-scale throughout.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("week", F.col("o_orderdate"))
            .cast("date")
            .alias("wk"),
            F.col("o_orderdate").alias("d"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("v")
        )
    )
    sub = (
        daily.groupBy("wk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s"),
            (F.max("v") - F.min("v")).cast("bigint").alias("r"),
        )
        .where(F.col("n") == SPC_N)
    )
    sub = sub.persist()
    grand = sub.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_weeks"),
        F.avg(F.col("s") * 1.0 / SPC_N).alias("xbb"),
        F.avg(F.col("r") * 1.0).alias("rbar"),
    )
    lim = grand.select(
        "n_weeks",
        "xbb",
        "rbar",
        (F.col("xbb") + SPC_A2 * F.col("rbar")).alias("uclx"),
        (F.col("xbb") - SPC_A2 * F.col("rbar")).alias("lclx"),
        (SPC_D4 * F.col("rbar")).alias("uclr"),
        (SPC_D3 * F.col("rbar")).alias("lclr"),
    )
    xbar = F.col("s") * 1.0 / SPC_N
    flags = (
        sub.transform(scalars(lim))
        .groupBy(
            "n_weeks", "xbb", "rbar", "uclx", "lclx", "uclr", "lclr"
        )
        .agg(
            F.sum(
                F.when(
                    (xbar > F.col("uclx")) | (xbar < F.col("lclx")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("oob_mean"),
            F.sum(
                F.when(
                    (F.col("r") > F.col("uclr"))
                    | (F.col("r") < F.col("lclr")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("oob_range"),
        )
    )
    return flags.select(
        "n_weeks",
        round_eps(F.col("xbb") / 100.0, 4).alias("xbar_bar"),
        round_eps(F.col("rbar") / 100.0, 4).alias("r_bar"),
        round_eps(F.col("uclx") / 100.0, 4).alias("ucl_mean"),
        round_eps(F.col("lclx") / 100.0, 4).alias("lcl_mean"),
        round_eps(F.col("uclr") / 100.0, 4).alias("ucl_range"),
        "oob_mean",
        "oob_range",
    )


# ---------------------------------------------------------------- B161

ABC_A = 0.8  # cumulative revenue share boundaries
ABC_B = 0.95
XYZ_X = 0.5  # demand CV boundaries
XYZ_Y = 1.0

_B161_ORACLE = f"""
WITH weekly AS (
  SELECT l_partkey AS p,
         CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', l_shipdate)::DATE) / 7 AS BIGINT)
           AS w,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS r
  FROM lineitem GROUP BY 1, 2
),
nw AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS n_weeks FROM weekly),
part_stats AS (
  SELECT p,
         CAST(SUM(r) AS BIGINT) AS rev,
         CAST(SUM(q) AS BIGINT) AS sq,
         CAST(SUM(q * q) AS BIGINT) AS sq2
  FROM weekly GROUP BY p
),
abc AS (
  SELECT p, rev, sq, sq2,
         SUM(rev) OVER (ORDER BY rev DESC, p
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1.0
           / SUM(rev) OVER () AS cum_share
  FROM part_stats
),
classed AS (
  SELECT CASE WHEN cum_share <= {ABC_A!r} THEN 'A'
              WHEN cum_share <= {ABC_B!r} THEN 'B'
              ELSE 'C' END AS abc_class,
         CASE WHEN sqrt((sq2 * 1.0 / n_weeks)
                        - (sq * 1.0 / n_weeks) * (sq * 1.0 / n_weeks))
                   / (sq * 1.0 / n_weeks) < {XYZ_X!r} THEN 'X'
              WHEN sqrt((sq2 * 1.0 / n_weeks)
                        - (sq * 1.0 / n_weeks) * (sq * 1.0 / n_weeks))
                   / (sq * 1.0 / n_weeks) < {XYZ_Y!r} THEN 'Y'
              ELSE 'Z' END AS xyz_class,
         rev
  FROM abc CROSS JOIN nw
)
SELECT abc_class, xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       {sql_round(
           'SUM(rev) * 100.0 / (SELECT SUM(rev) FROM classed)', 4)}
         AS revenue_share_pct
FROM classed GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("abc_xyz_matrix", oracle=_B161_ORACLE)
def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory planning matrix: parts classed by
    cumulative revenue share (A <= {ABC_A}, B <= {ABC_B}, else C —
    B73's Pareto cut) crossed with weekly-demand variability
    (CV < {XYZ_X} -> X steady, < {XYZ_Y} -> Y, else Z erratic),
    with zero-demand weeks counted via the global week span (no
    zero-fill join: E[q^2] and the mean both divide by the TOTAL
    week count, so absent weeks contribute exactly their zeros).
    AX cells run on autopilot (B147's EOQ), CZ cells justify no
    stock at all — the 9-cell grid is the standard planner's map.

    Exactness: revenue and demand moments are exact BIGINTs at
    (part, week) grain; the ABC rank uses a deterministic
    (revenue desc, partkey) order; CV is one double expression.

    Scale shape: one fact aggregate to (part, week), one to part
    grain; the cumulative-share window is over |parts|; the week
    count is a broadcast scalar; report is 9 rows.
    """
    weekly = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("p"),
            (
                F.datediff(
                    F.date_trunc("week", F.col("l_shipdate")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w"),
        )
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("q"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("r"),
        )
    )
    weekly = weekly.persist()
    nw = weekly.agg(F.countDistinct("w").cast("bigint").alias("n_weeks"))
    part_stats = weekly.groupBy("p").agg(
        F.sum("r").cast("bigint").alias("rev"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sq2"),
    )
    w_cum = Window.orderBy(F.col("rev").desc(), F.col("p")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    abc = part_stats.select(
        "p",
        "rev",
        "sq",
        "sq2",
        (
            F.sum("rev").over(w_cum) * 1.0 / F.sum("rev").over(w_all)
        ).alias("cum_share"),
    )
    mean_q = F.col("sq") * 1.0 / F.col("n_weeks")
    cv = (
        F.sqrt(F.col("sq2") * 1.0 / F.col("n_weeks") - mean_q * mean_q)
        / mean_q
    )
    classed = abc.transform(scalars(nw)).select(
        F.when(F.col("cum_share") <= ABC_A, "A")
        .when(F.col("cum_share") <= ABC_B, "B")
        .otherwise("C")
        .alias("abc_class"),
        F.when(cv < XYZ_X, "X").when(cv < XYZ_Y, "Y").otherwise("Z").alias(
            "xyz_class"
        ),
        "rev",
    )
    return (
        classed.select(
            "abc_class",
            "xyz_class",
            "rev",
            F.sum("rev").over(w_all).alias("rev_tot"),
        )
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            round_eps(
                F.sum("rev") * 100.0 / F.max("rev_tot"), 4
            ).alias("revenue_share_pct"),
        )
        .orderBy("abc_class", "xyz_class")
    )


# ---------------------------------------------------------------- C162

VC_KS = (100, 500, 1000)

_C162_ORACLE = f"""
WITH tf AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) GROUP BY tok
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rk FROM tf
)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(c) AS BIGINT) AS total_tokens,
       {", ".join(
           sql_round(
               f'SUM(CASE WHEN rk <= {k} THEN c ELSE 0 END) * 100.0'
               ' / SUM(c)', 4) + f' AS coverage_top{k}_pct'
           for k in VC_KS)}
FROM ranked
"""


@register("vocab_coverage_curve", oracle=_C162_ORACLE)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of corpus token mass
    carried by the top-{VC_KS} words — the direct budget question
    behind tokenizer and embedding-table sizing (C126's Zipf slope
    predicts this curve's shape; C144's OOV rate is what you pay
    where it flattens; C158's hapax tail is its far end). A corpus
    where 100 words cover 95% is template-heavy; one where 1000
    words cover 50% will shred any fixed vocab.

    Scale shape: one explode to token grain and one frequency
    aggregate (C30's shuffle); the rank is a global window over
    VOCABULARY-grain rows (not corpus rows) with a deterministic
    (count desc, token) tiebreak; the report is a single-row
    conditional reduction.
    """
    tf = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ranked = tf.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("tok")))
        .alias("rk"),
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum("c").cast("bigint").alias("total_tokens"),
    ]
    for k in VC_KS:
        aggs.append(
            round_eps(
                F.sum(F.when(F.col("rk") <= k, F.col("c")).otherwise(0))
                * 100.0
                / F.sum("c"),
                4,
            ).alias(f"coverage_top{k}_pct")
        )
    return ranked.agg(*aggs)
