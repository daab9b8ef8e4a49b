"""Hundred-thirty-fourth sweep (SURVEY.md §2 B247, B249, C219).

Siegel repeated-medians slope (the 50%-breakdown robust regressor —
Theil-Sen medians ALL pairwise slopes and breaks at 29% outliers;
Siegel medians per-point medians and survives half the data being
garbage), one-covariate ANCOVA of order value across priorities
adjusted for order size (is the priority 'effect' just a lines-per-
order effect? — closed-form pooled-slope adjustment, no solver), and
leave-one-source-out corpus valuation (each source's marginal
contribution to corpus quality, exclusive vocabulary and token mass,
computed for ALL sources in one pass via complement algebra — the
poor man's data Shapley the mixture planners actually use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import attach_scalars, scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B247

_B247_ORACLE = f"""
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
per_point AS (
  SELECT a.t,
         quantile_cont((CAST(b.y AS DOUBLE) - a.y) / (b.t - a.t), 0.5)
           AS med_slope
  FROM pts a JOIN pts b ON a.t <> b.t
  GROUP BY a.t
),
fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         quantile_cont(med_slope, 0.5) AS slope
  FROM per_point
),
icpt AS (
  SELECT quantile_cont(p.y - f.slope * p.t, 0.5) AS intercept, f.slope,
         f.n
  FROM pts p, fit f
  GROUP BY f.slope, f.n
)
SELECT n AS n_weeks,
       {sql_round('slope', 6)} AS siegel_slope,
       {sql_round('intercept', 4)} AS siegel_intercept
FROM icpt
"""


@register("siegel_repeated_medians", oracle=_B247_ORACLE)
def siegel_repeated_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel repeated-medians slope of weekly order volume — the
    50%-BREAKDOWN robust regressor that finishes the line-fit family:
    OLS (B57) breaks at one outlier, Theil-Sen (B92, median of all
    pairwise slopes) breaks at ~29% contamination, max-consensus
    (B241) maximises coverage at a tolerance; Siegel takes each
    point's MEDIAN slope to all others, then the median of those
    medians — half the points can be arbitrary garbage and the fit
    stands. Intercept = median of (y - slope*t).

    Exactness: pairwise slopes are exact-integer ratios; both
    engines run the same interpolated median (percentile /
    quantile_cont) over identical doubles at every stage.

    Scale shape: one series-sized pair join (|weeks|^2, never
    corpus-sized), one per-point median, two scalar medians.
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
    per_point = (
        a.join(b, F.col("a.t") != F.col("b.t"))
        .select(
            F.col("a.t").alias("t"),
            (
                (F.col("b.y").cast("double") - F.col("a.y"))
                / (F.col("b.t") - F.col("a.t"))
            ).alias("s"),
        )
        .groupBy("t")
        .agg(F.expr("percentile(s, 0.5)").alias("med_slope"))
    )
    fit = per_point.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("percentile(med_slope, 0.5)").alias("slope"),
    )
    icpt = (
        pts.transform(scalars(fit))
        .groupBy("slope", "n")
        .agg(
            F.expr("percentile(y - slope * t, 0.5)").alias("intercept")
        )
    )
    return icpt.select(
        F.col("n").alias("n_weeks"),
        round_eps(F.col("slope"), 6).alias("siegel_slope"),
        round_eps(F.col("intercept"), 4).alias("siegel_intercept"),
    )


# ---------------------------------------------------------------- B249

_B249_ORACLE = f"""
WITH osz AS (
  SELECT l_orderkey AS okey, CAST(COUNT(*) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
),
samp AS (
  SELECT o.o_orderpriority AS g,
         CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT) AS y,
         z.x
  FROM orders o JOIN osz z ON o.o_orderkey = z.okey
),
per_g AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
  FROM samp GROUP BY g
),
pooled AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM(sxx - CAST(sx AS DOUBLE) * sx / ng) AS wxx,
         SUM(sxy - CAST(sx AS DOUBLE) * sy / ng) AS wxy,
         CAST(SUM(sx) AS BIGINT) AS tx, CAST(SUM(sy) AS BIGINT) AS ty
  FROM per_g
),
adj AS (
  SELECT p.g, p.ng,
         CAST(p.sy AS DOUBLE) / p.ng / 100.0 AS raw_mean,
         (CAST(p.sy AS DOUBLE) / p.ng
          - (q.wxy / q.wxx)
            * (CAST(p.sx AS DOUBLE) / p.ng
               - CAST(q.tx AS DOUBLE) / q.n)) / 100.0 AS adj_mean,
         q.wxy / q.wxx AS b_pooled
  FROM per_g p, pooled q
)
SELECT g AS priority, ng AS n_orders,
       {sql_round('raw_mean', 4)} AS raw_mean_value,
       {sql_round('adj_mean', 4)} AS size_adjusted_mean,
       {sql_round('raw_mean - adj_mean', 4)} AS size_effect,
       {sql_round('b_pooled / 100.0', 6)} AS pooled_slope_per_line
FROM adj ORDER BY priority
"""


@register("ancova_adjusted_means", oracle=_B249_ORACLE)
def ancova_adjusted_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-covariate ANCOVA: mean order value per priority ADJUSTED
    for order size (line-item count) at the common pooled-within
    slope — the closed-form answer to 'is the priority effect real
    or just an order-size effect?'. anova_oneway (B-track) compares
    raw means; here each group mean slides along the pooled
    regression to the grand-mean covariate, and size_effect is
    exactly the part of the raw gap that order size explains. The
    pooled slope uses within-group moments only, so between-group
    confounding never contaminates it.

    Exactness: all moments are exact 128-bit integers from one
    aggregate over the orders-lineitem join; the adjustment is one
    double tree.

    Scale shape: one lineitem aggregate to order grain (map-side
    combinable), one broadcastable join to orders, one 5-row group
    aggregate, one reduction.
    """
    osz = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    samp = (
        load_table(spark, sf_dir, "orders")
        .join(osz, F.col("o_orderkey") == F.col("okey"))
        .select(
            F.col("o_orderpriority").alias("g"),
            F.round(F.col("o_totalprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("y"),
            "x",
        )
    )
    dec = "decimal(38,0)"
    per_g = samp.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast("double").alias("sxy"),
    )
    per_g = per_g.persist()
    pooled = per_g.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(
            F.col("sxx")
            - F.col("sx").cast("double") * F.col("sx") / F.col("ng")
        ).alias("wxx"),
        F.sum(
            F.col("sxy")
            - F.col("sx").cast("double") * F.col("sy") / F.col("ng")
        ).alias("wxy"),
        F.sum("sx").cast("bigint").alias("tx"),
    )
    adj = attach_scalars(per_g, pooled)
    b = F.col("wxy") / F.col("wxx")
    raw_mean = F.col("sy").cast("double") / F.col("ng") / 100.0
    adj_mean = (
        F.col("sy").cast("double") / F.col("ng")
        - b
        * (
            F.col("sx").cast("double") / F.col("ng")
            - F.col("tx").cast("double") / F.col("n")
        )
    ) / 100.0
    return adj.select(
        F.col("g").alias("priority"),
        F.col("ng").alias("n_orders"),
        round_eps(raw_mean, 4).alias("raw_mean_value"),
        round_eps(adj_mean, 4).alias("size_adjusted_mean"),
        round_eps(raw_mean - adj_mean, 4).alias("size_effect"),
        round_eps(b / 100.0, 6).alias("pooled_slope_per_line"),
    ).orderBy("priority")


# ---------------------------------------------------------------- C219

_C219_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
tok_src AS (
  SELECT tok, source, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY tok, source
),
tok_span AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(SUM(c) AS BIGINT) AS total_c
  FROM tok_src GROUP BY tok
),
gstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(total_c) AS BIGINT) AS tokens
  FROM tok_span
),
per_src AS (
  SELECT s.source,
         CAST(SUM(s.c) AS BIGINT) AS src_tokens,
         CAST(SUM(CASE WHEN t.n_sources = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS exclusive_types
  FROM tok_src s JOIN tok_span t USING (tok)
  GROUP BY s.source
)
SELECT p.source, p.src_tokens, p.exclusive_types,
       {sql_round('CAST(p.src_tokens AS DOUBLE) * 100.0 / g.tokens', 4)}
         AS token_share_pct,
       CAST(g.vocab - p.exclusive_types AS BIGINT) AS loo_vocab,
       {sql_round(
           'CAST(p.exclusive_types AS DOUBLE) * 100.0 / g.vocab', 4)}
         AS vocab_loss_pct,
       {sql_round(
           'CAST(p.exclusive_types AS DOUBLE)'
           ' / (CAST(p.src_tokens AS DOUBLE) / g.tokens)'
           ' / g.vocab * 100.0', 4)} AS value_density
FROM per_src p, gstats g
ORDER BY p.source
"""


@register("source_loo_valuation", oracle=_C219_ORACLE)
def source_loo_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out corpus valuation in ONE pass: for every
    source simultaneously, what the corpus LOSES if it is dropped —
    exclusive vocabulary types (types appearing in no other source),
    the left-over vocabulary, and value_density (exclusive-vocab
    contribution per unit of token budget — the number a mixture
    planner ranks sources by; shapley_attribution prices 3 channels
    exactly, this scales the marginal-value idea to all sources via
    complement algebra instead of 2^n subsets). The trick: a
    source's LOO vocabulary is global vocab minus ITS exclusive
    types — one (token, source) aggregate answers every source at
    once, no per-source recomputation.

    Exactness: all counts exact integers; three ratios at the end.

    Scale shape: one (token, source) count, one token-grain span
    aggregate, one source-grain rollup — all map-side combinable,
    nothing per-source-iterative.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    )
    tok_src = toks.groupBy("tok", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tok_span = tok_src.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.sum("c").cast("bigint").alias("total_c"),
    )
    glob = tok_span.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("total_c").cast("bigint").alias("tokens"),
    )
    per_src = (
        tok_src.join(tok_span, "tok")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("src_tokens"),
            F.sum((F.col("n_sources") == 1).cast("int"))
            .cast("bigint")
            .alias("exclusive_types"),
        )
    )
    out = attach_scalars(per_src, glob)
    return out.select(
        "source",
        "src_tokens",
        "exclusive_types",
        round_eps(
            F.col("src_tokens").cast("double") * 100.0 / F.col("tokens"), 4
        ).alias("token_share_pct"),
        (F.col("vocab") - F.col("exclusive_types"))
        .cast("bigint")
        .alias("loo_vocab"),
        round_eps(
            F.col("exclusive_types").cast("double") * 100.0
            / F.col("vocab"),
            4,
        ).alias("vocab_loss_pct"),
        round_eps(
            F.col("exclusive_types").cast("double")
            / (F.col("src_tokens").cast("double") / F.col("tokens"))
            / F.col("vocab")
            * 100.0,
            4,
        ).alias("value_density"),
    ).orderBy("source")
