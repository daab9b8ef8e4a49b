"""Hundred-twelfth sweep (SURVEY.md §2 B207-B208, C190).

Mean residual life (E[remaining wait | waited t] — the aging curve
that says whether a stuck order is almost done or barely started;
increasing MRL is the used-better-than-new regime B177's age
buckets hint at), the two-segment minimum-variance portfolio
(Markowitz's closed form pointed at revenue smoothing — how much
diversification the two books actually buy, given B181's tail
co-movement), and the dedup mixture-shift audit (keep-one-exemplar
dedup silently REWEIGHTS the source mixture — the distortion C150's
savings number doesn't show).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.dedup import connected_components
from ..sources import load_table
from . import register
from .text_plans import _C5_ORACLE, dedup_minhash_lsh

# ---------------------------------------------------------------- B207

_B207_ORACLE = f"""
WITH lt AS (
  SELECT datediff('day', o.o_orderdate, l.l_shipdate) AS t
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
daily AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt FROM lt GROUP BY t
),
suffix AS (
  SELECT t,
         CAST(SUM(cnt) OVER (ORDER BY t DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS BIGINT) AS surv,
         CAST(SUM(CAST(t AS BIGINT) * cnt) OVER (ORDER BY t DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS BIGINT) AS wsum
  FROM daily
)
SELECT CAST(t AS BIGINT) AS waited_days,
       surv AS n_still_waiting,
       {sql_round('wsum * 1.0 / surv - t', 4)} AS mean_residual_days
FROM suffix WHERE surv IS NOT NULL AND surv > 0
ORDER BY waited_days
"""


@register("mean_residual_life", oracle=_B207_ORACLE)
def mean_residual_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean residual life of order-to-ship lead time: for each
    waited duration t, the EXPECTED remaining wait among lines that
    took longer — MRL(t) = E[T - t | T > t]. Decreasing MRL means
    patience pays (the order is almost done); flat or increasing
    MRL is the lognormal/heavy-tail regime where a late order is a
    LOST order and B177's old buckets deserve escalation, not hope.
    The conditional-expectation curve B72's survival probability
    doesn't give.

    Exactness: suffix counts and weighted sums are exact BIGINTs
    from two descending cumulative windows over the bounded |days|
    frame; one double division per day.

    Scale shape: one fact-fact key join collapses to day grain;
    everything after is windows over the bounded frame.
    """
    lt = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_shipdate").alias("ship")
        )
        .join(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("ok"),
                F.col("o_orderdate").alias("od"),
            ),
            "ok",
        )
        .select(F.datediff("ship", "od").alias("t"))
    )
    daily = lt.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_suf = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    suffix = daily.select(
        "t",
        F.sum("cnt").over(w_suf).cast("bigint").alias("surv"),
        F.sum(F.col("t").cast("bigint") * F.col("cnt"))
        .over(w_suf)
        .cast("bigint")
        .alias("wsum"),
    )
    return (
        suffix.where(F.col("surv").isNotNull() & (F.col("surv") > 0))
        .select(
            F.col("t").cast("bigint").alias("waited_days"),
            F.col("surv").alias("n_still_waiting"),
            round_eps(
                F.col("wsum") * 1.0 / F.col("surv") - F.col("t"), 4
            ).alias("mean_residual_days"),
        )
        .orderBy("waited_days")
    )


# ---------------------------------------------------------------- B208

MV_SEG_A = "BUILDING"
MV_SEG_B = "MACHINERY"

_B208_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o.o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(SUM(CASE WHEN c.c_mktsegment = '{MV_SEG_A}'
                       THEN CAST(ROUND(o.o_totalprice * 100 + 1e-9)
                                 AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN c.c_mktsegment = '{MV_SEG_B}'
                       THEN CAST(ROUND(o.o_totalprice * 100 + 1e-9)
                                 AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM weekly
),
mo AS (
  SELECT n,
         CAST(n * sxx - sx * sx AS DOUBLE) / ((n * 1.0) * (n - 1)) AS va,
         CAST(n * syy - sy * sy AS DOUBLE) / ((n * 1.0) * (n - 1)) AS vb,
         CAST(n * sxy - sx * sy AS DOUBLE) / ((n * 1.0) * (n - 1)) AS cab
  FROM suff
),
port AS (
  SELECT n, va, vb, cab,
         (vb - cab) / (va + vb - 2 * cab) AS wa
  FROM mo
)
SELECT n AS n_weeks,
       {sql_round('wa', 6)} AS weight_a,
       {sql_round('1.0 - wa', 6)} AS weight_b,
       {sql_round(
           '(wa * wa * va + (1 - wa) * (1 - wa) * vb'
           ' + 2 * wa * (1 - wa) * cab) / 1e8', 4)} AS portfolio_var,
       {sql_round('LEAST(va, vb) / 1e8', 4)} AS best_single_var,
       {sql_round(
           '(1.0 - (wa * wa * va + (1 - wa) * (1 - wa) * vb'
           '        + 2 * wa * (1 - wa) * cab) / LEAST(va, vb))'
           ' * 100.0', 4)} AS var_reduction_pct
FROM port
"""


@register("min_variance_portfolio", oracle=_B208_ORACLE)
def min_variance_portfolio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markowitz minimum-variance weights over the {MV_SEG_A} /
    {MV_SEG_B} weekly-revenue pair: w* = (vb - cov)/(va + vb - 2cov)
    in closed form, with the achieved portfolio variance against the
    best single segment — how much revenue-smoothing the two books
    actually buy, which B168's beta (co-movement) and B181's tail
    dependence bound from either side. Negative weight means the
    'hedge' requires shorting a business line — i.e. it isn't one.

    Exactness: weekly cents and all second moments are 128-bit
    exact; the weights and variances are O(1) algebra.

    Scale shape: one orders-customer join to the |weeks| frame, one
    sufficient-stats reduction.
    """
    cents = F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
    weekly = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("d"),
            cents.alias("cents"),
        )
        .join(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("ck"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "ck",
        )
        .groupBy(
            (
                F.datediff(
                    F.date_trunc("week", F.col("d")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w")
        )
        .agg(
            F.sum(
                F.when(F.col("seg") == MV_SEG_A, F.col("cents")).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.when(F.col("seg") == MV_SEG_B, F.col("cents")).otherwise(0)
            )
            .cast("bigint")
            .alias("y"),
        )
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    suff = weekly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n")
    denom = (n * 1.0) * (n - 1)
    va = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double") / denom
    vb = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double") / denom
    cab = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / denom
    wa = (vb - cab) / (va + vb - 2 * cab)
    pvar = wa * wa * va + (1 - wa) * (1 - wa) * vb + 2 * wa * (1 - wa) * cab
    best = F.least(va, vb)
    return suff.select(
        n.alias("n_weeks"),
        round_eps(wa, 6).alias("weight_a"),
        round_eps(1.0 - wa, 6).alias("weight_b"),
        round_eps(pvar / 1e8, 4).alias("portfolio_var"),
        round_eps(best / 1e8, 4).alias("best_single_var"),
        round_eps((1.0 - pvar / best) * 100.0, 4).alias(
            "var_reduction_pct"
        ),
    )


# ---------------------------------------------------------------- C190

_C190_ORACLE = f"""
WITH RECURSIVE verified AS ({_C5_ORACLE}),
edges AS (
  SELECT id_a AS x, id_b AS y FROM verified
  UNION ALL
  SELECT id_b AS x, id_a AS y FROM verified
),
reach AS (
  SELECT doc_id AS v, doc_id AS w FROM documents
  UNION
  SELECT r.v, e.y FROM reach r JOIN edges e ON r.w = e.x
),
comp AS (SELECT v AS doc_id, MIN(w) AS cid FROM reach GROUP BY v),
docs AS (
  SELECT d.doc_id, d.source,
         CAST(len(string_split_regex(lower(d.text), '\\s+')) AS BIGINT)
           AS toks,
         CASE WHEN d.doc_id = comp.cid THEN 1 ELSE 0 END AS kept
  FROM documents d JOIN comp ON d.doc_id = comp.doc_id
),
per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS docs_before,
         CAST(SUM(kept) AS BIGINT) AS docs_after,
         CAST(SUM(toks) AS BIGINT) AS toks_before,
         CAST(SUM(kept * toks) AS BIGINT) AS toks_after
  FROM docs GROUP BY source
),
tot AS (
  SELECT CAST(SUM(toks_before) AS BIGINT) AS tb,
         CAST(SUM(toks_after) AS BIGINT) AS ta
  FROM per_src
)
SELECT source, docs_before, docs_after,
       {sql_round('toks_before * 100.0 / tb', 4)} AS share_before_pct,
       {sql_round('toks_after * 100.0 / ta', 4)} AS share_after_pct,
       {sql_round(
           'toks_after * 100.0 / ta - toks_before * 100.0 / tb', 4)}
         AS share_delta_pp
FROM per_src CROSS JOIN tot ORDER BY source
"""


@register("dedup_mixture_shift", oracle=_C190_ORACLE)
def dedup_mixture_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture distortion of keep-one-exemplar dedup: token
    shares per source BEFORE vs AFTER the composed C5 -> CC ->
    keep-min pass — a source whose content is heavily mirrored
    elsewhere loses share silently, which re-weights the training
    mixture C33/C100 carefully planned; the delta column is the
    correction a post-dedup re-balancing pass must apply. C150
    prices the savings; this shows who PAID them.

    Scale shape: C5's pairs feed the iterative CC; kept = doc is
    its own component exemplar (component id IS the min doc id);
    token counts are map-side; one |sources|-row aggregate with a
    1-row totals attach.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    docs_all = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        "source",
        F.size(F.split(F.lower(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("toks"),
    )
    comp = connected_components(
        pairs.select(
            F.col("id_a").alias("first_id"), F.col("id_b").alias("second_id")
        ),
        docs_all.select("id"),
        id_col="id",
    )
    docs = comp.join(docs_all, "id").select(
        "source",
        "toks",
        F.when(F.col("id") == F.col("component_id"), 1)
        .otherwise(0)
        .alias("kept"),
    )
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_before"),
        F.sum("kept").cast("bigint").alias("docs_after"),
        F.sum("toks").cast("bigint").alias("toks_before"),
        F.sum(F.col("kept") * F.col("toks"))
        .cast("bigint")
        .alias("toks_after"),
    )
    w_all = Window.partitionBy()
    out = per_src.select(
        "*",
        F.sum("toks_before").over(w_all).cast("bigint").alias("tb"),
        F.sum("toks_after").over(w_all).cast("bigint").alias("ta"),
    )
    sb = F.col("toks_before") * 100.0 / F.col("tb")
    sa = F.col("toks_after") * 100.0 / F.col("ta")
    return out.select(
        "source",
        "docs_before",
        "docs_after",
        round_eps(sb, 4).alias("share_before_pct"),
        round_eps(sa, 4).alias("share_after_pct"),
        round_eps(sa - sb, 4).alias("share_delta_pp"),
    ).orderBy("source")
