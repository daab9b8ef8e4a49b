"""Hundred-fifth sweep (SURVEY.md §2 B195-B196, C181).

1-D Wasserstein distance between two segments' weekly-revenue
distributions (earth-mover's: integrates the whole CDF gap where
B90's KS only reads its maximum — reported together so the contrast
is visible), Page's L trend test (the ORDERED-alternative companion
to B158's Friedman, pointed at "priority volumes rank monotonically
within weeks"), and a char-bigram naive-Bayes language identifier
(the Cavnar-Trenkle-style second opinion to C3's stopword scorer,
trained on the even half and graded on the odd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B195

WS_SEG_A = "BUILDING"
WS_SEG_B = "MACHINERY"

_B195_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o.o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         c.c_mktsegment AS seg,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{WS_SEG_A}', '{WS_SEG_B}')
  GROUP BY 1, 2
),
support AS (
  SELECT v,
         CAST(SUM(CASE WHEN seg = '{WS_SEG_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN seg = '{WS_SEG_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
  FROM weekly GROUP BY v
),
cdf AS (
  SELECT v,
         SUM(c1) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1.0
           / SUM(c1) OVER () AS f1,
         SUM(c2) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1.0
           / SUM(c2) OVER () AS f2,
         LEAD(v) OVER (ORDER BY v) - v AS gap,
         CAST(SUM(c1) OVER () AS BIGINT) AS n1,
         CAST(SUM(c2) OVER () AS BIGINT) AS n2
  FROM support
)
SELECT MAX(n1) AS n_weeks_a, MAX(n2) AS n_weeks_b,
       {sql_round(
           'SUM(CASE WHEN gap IS NULL THEN 0.0'
           '         ELSE ABS(f1 - f2) * gap END) / 100.0', 4)}
         AS wasserstein_1,
       {sql_round('MAX(ABS(f1 - f2))', 6)} AS ks_stat
FROM cdf
"""


@register("wasserstein_1d", oracle=_B195_ORACLE)
def wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth-mover's) distance between the
    {WS_SEG_A} and {WS_SEG_B} segments' weekly-revenue
    distributions, via the closed form W1 = integral |F1 - F2| over
    the merged support — reported WITH the KS statistic on the same
    pass: KS reads only the largest CDF gap, W1 prices every dollar
    of distributional difference, and the pair diverging is itself
    diagnostic (a narrow deep gap vs a broad shallow one).

    Exactness: the merged support, counts and cumulative sums are
    exact BIGINTs over the bounded |weeks|-value frame; the
    integral is one conditional reduction of identical IEEE shapes.

    Scale shape: one orders-customer join to (week, segment) grain,
    one support aggregate, cumulative windows over the bounded
    support frame.
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("d"),
            F.round(F.col("o_totalprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("cents"),
        )
        .join(
            load_table(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment").isin(WS_SEG_A, WS_SEG_B))
            .select(
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
            .alias("w"),
            "seg",
        )
        .agg(F.sum("cents").cast("bigint").alias("v"))
    )
    support = weekly.groupBy("v").agg(
        F.sum(F.when(F.col("seg") == WS_SEG_A, 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("seg") == WS_SEG_B, 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cdf = support.select(
        "v",
        (
            F.sum("c1").over(w_cum) * 1.0 / F.sum("c1").over(w_all)
        ).alias("f1"),
        (
            F.sum("c2").over(w_cum) * 1.0 / F.sum("c2").over(w_all)
        ).alias("f2"),
        (F.lead("v").over(Window.orderBy("v")) - F.col("v")).alias("gap"),
        F.sum("c1").over(w_all).cast("bigint").alias("n1"),
        F.sum("c2").over(w_all).cast("bigint").alias("n2"),
    )
    return cdf.agg(
        F.max("n1").alias("n_weeks_a"),
        F.max("n2").alias("n_weeks_b"),
        round_eps(
            F.sum(
                F.when(F.col("gap").isNull(), 0.0).otherwise(
                    F.abs(F.col("f1") - F.col("f2")) * F.col("gap")
                )
            )
            / 100.0,
            4,
        ).alias("wasserstein_1"),
        round_eps(F.max(F.abs(F.col("f1") - F.col("f2"))), 6).alias(
            "ks_stat"
        ),
    )


# ---------------------------------------------------------------- B196

_B196_ORACLE = f"""
WITH wk AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7 AS BIGINT)
           AS b,
         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS j,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1, 2
),
kk AS (SELECT CAST(COUNT(DISTINCT j) AS BIGINT) AS k FROM wk),
complete AS (
  SELECT b FROM wk GROUP BY b
  HAVING COUNT(*) = (SELECT k FROM kk)
),
cells AS (SELECT wk.* FROM wk JOIN complete USING (b)),
ranked AS (
  SELECT b, j,
         CAST(2 * RANK() OVER (PARTITION BY b ORDER BY x)
              + COUNT(*) OVER (PARTITION BY b, x) - 1 AS BIGINT) AS r2
  FROM cells
),
rj AS (
  SELECT j, CAST(SUM(r2) AS BIGINT) AS r2j,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM ranked GROUP BY j
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(m) AS m,
         CAST(SUM(j * r2j) AS BIGINT) AS l2
  FROM rj
)
SELECT k, m AS n_blocks,
       {sql_round('l2 / 2.0', 2)} AS page_l,
       {sql_round('m * k * (k + 1.0) * (k + 1.0) / 4.0', 2)} AS expected_l,
       {sql_round(
           '(l2 / 2.0 - m * k * (k + 1.0) * (k + 1.0) / 4.0)'
           ' / sqrt(m * (k * 1.0) * k * (k + 1.0)'
           '        * ((k * 1.0) * k - 1) / 144.0)', 6)} AS z_stat
FROM red
"""


@register("page_trend_test", oracle=_B196_ORACLE)
def page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for an ORDERED trend across priority classes
    within weekly blocks: L = sum_j j * R_j over within-block ranks
    — where B158's Friedman asks "do the classes differ at all",
    Page's L is pointed at "do they rank MONOTONICALLY with
    priority order" (B174's dose-response question, asked of ranks
    instead of proportions), buying power against exactly that
    alternative. Same complete-block, doubled-rank machinery as
    B158 so the two tests read the identical design.

    Exactness: ordered scores come from the priority label's digit;
    L is an exact BIGINT (doubled) over exact rank sums; the normal
    approximation is O(1) algebra.
    """
    wk = (
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
            .alias("b"),
            F.substring(F.col("o_orderpriority"), 1, 1)
            .cast("bigint")
            .alias("j"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    wk = wk.persist()
    kk = wk.agg(F.countDistinct("j").cast("bigint").alias("k"))
    complete = (
        wk.groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(kk), F.col("cnt") == F.col("k"))
        .select("b")
    )
    cells = wk.join(F.broadcast(complete), "b")
    w_rank = Window.partitionBy("b").orderBy("x")
    w_tie = Window.partitionBy("b", "x")
    ranked = cells.select(
        "j",
        (
            2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1
        )
        .cast("bigint")
        .alias("r2"),
    )
    rj = ranked.groupBy("j").agg(
        F.sum("r2").cast("bigint").alias("r2j"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    red = rj.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("m").cast("bigint").alias("m"),
        F.sum(F.col("j") * F.col("r2j")).cast("bigint").alias("l2"),
    )
    k, m, l2 = F.col("k"), F.col("m"), F.col("l2")
    e_l = m * k * (k + 1.0) * (k + 1.0) / 4.0
    sd_l = F.sqrt(
        m * (k * 1.0) * k * (k + 1.0) * ((k * 1.0) * k - 1) / 144.0
    )
    return red.select(
        "k",
        m.alias("n_blocks"),
        round_eps(l2 / 2.0, 2).alias("page_l"),
        round_eps(e_l, 2).alias("expected_l"),
        round_eps((l2 / 2.0 - e_l) / sd_l, 6).alias("z_stat"),
    )


# ---------------------------------------------------------------- C181

CNB_ALPHA = 0.5

_C181_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, doc_id % 2 AS part, lang, lower(text) AS tx
  FROM documents
),
bgs AS (
  SELECT doc_id, part, lang,
         unnest(list_transform(generate_series(1, length(tx) - 1),
                               i -> tx[i:i+1])) AS bg
  FROM docs
),
tr AS (
  SELECT lang AS l, bg, CAST(COUNT(*) AS BIGINT) AS c
  FROM bgs WHERE part = 0 GROUP BY 1, 2
),
tr_tot AS (SELECT l, CAST(SUM(c) AS BIGINT) AS t FROM tr GROUP BY l),
vocab AS (SELECT CAST(COUNT(DISTINCT bg) AS BIGINT) AS v FROM tr),
ev AS (
  SELECT doc_id, lang, bg, CAST(COUNT(*) AS BIGINT) AS c
  FROM bgs WHERE part = 1 GROUP BY 1, 2, 3
),
grid AS (
  SELECT ev.doc_id, ev.lang, ev.bg, ev.c, tt.l, tt.t, vocab.v
  FROM ev CROSS JOIN tr_tot tt CROSS JOIN vocab
),
scored AS (
  SELECT g.doc_id, g.lang, g.l,
         SUM(g.c * ln((COALESCE(tr.c, 0) + {CNB_ALPHA!r})
                      / (g.t + {CNB_ALPHA!r} * g.v))) AS score
  FROM grid g LEFT JOIN tr ON g.l = tr.l AND g.bg = tr.bg
  GROUP BY g.doc_id, g.lang, g.l
),
pred AS (
  SELECT doc_id, lang, l AS pred FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, l) AS rk
    FROM scored
  ) WHERE rk = 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pred)
SELECT lang AS true_lang, pred AS pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       {sql_round('COUNT(*) * 100.0 / MAX(n)', 4)} AS pct_of_eval
FROM pred CROSS JOIN tot
GROUP BY lang, pred ORDER BY true_lang, pred_lang
"""


@register("char_ngram_langid", oracle=_C181_ORACLE)
def char_ngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-bigram naive-Bayes language identifier (the Cavnar-
    Trenkle n-gram-profile family): per-language bigram likelihoods
    fit on the even-doc half, odd docs classified by add-
    {CNB_ALPHA} smoothed log-likelihood, confusion matrix against
    the stored labels. A SECOND, feature-disjoint opinion next to
    C3's stopword scorer — where the two disagree is where C151's
    label-noise audit should look first, and char n-grams survive
    the no-stopword/short-text regime that starves C3.

    Scale shape: training collapses to (lang, bigram) counts; eval
    docs collapse to (doc, bigram) counts BEFORE scoring; the score
    join runs at that count grain x |langs| (a broadcast lang-dim
    cross), and the argmax is one rank window at doc grain — no
    per-doc sort, no Python.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(2)).alias("part"),
        "lang",
        F.lower(F.col("text")).alias("tx"),
    )
    bgs = docs.select(
        "doc_id",
        "part",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(tx) - 1),"
                " i -> substring(tx, i, 2))"
            )
        ).alias("bg"),
    )
    bgs = bgs.persist()
    tr = (
        bgs.where(F.col("part") == 0)
        .groupBy(F.col("lang").alias("l"), "bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tr = tr.persist()
    tr_tot = tr.groupBy("l").agg(F.sum("c").cast("bigint").alias("t"))
    vocab = tr.agg(F.countDistinct("bg").cast("bigint").alias("v"))
    ev = (
        bgs.where(F.col("part") == 1)
        .groupBy("doc_id", "lang", "bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    grid = ev.transform(scalars(tr_tot)).transform(scalars(vocab))
    scored = (
        grid.join(
            tr.select("l", "bg", F.col("c").alias("tc")), ["l", "bg"], "left"
        )
        .groupBy("doc_id", "lang", "l")
        .agg(
            F.sum(
                F.col("c")
                * F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + CNB_ALPHA)
                    / (F.col("t") + CNB_ALPHA * F.col("v"))
                )
            ).alias("score")
        )
    )
    pred = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("score").desc(), F.col("l")
                )
            ),
        )
        .where(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("l").alias("pred"))
    )
    w_all = Window.partitionBy()
    return (
        pred.withColumn("n", F.count(F.lit(1)).over(w_all).cast("bigint"))
        .groupBy(
            F.col("lang").alias("true_lang"), F.col("pred").alias("pred_lang")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            round_eps(
                F.count(F.lit(1)) * 100.0 / F.max("n"), 4
            ).alias("pct_of_eval"),
        )
        .orderBy("true_lang", "pred_lang")
    )
