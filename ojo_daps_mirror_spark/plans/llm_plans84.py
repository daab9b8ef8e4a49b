"""Eighty-fourth sweep (SURVEY.md §2 B154-B155, C159).

Pettitt change-point test (WHERE does the series break, with a
distribution-free p-value — the localisation step after B110 flags
and B152 confirms a trend), the Oaxaca-Blinder decomposition (how
much of a between-segment outcome gap is composition vs behaviour —
econometrics' standard gap-accounting), and held-out bigram
perplexity per source (train on the even half, score the odd half —
the CCNet-style LM quality signal where in-corpus scores like C23
reward memorisation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B154

_B154_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7 AS BIGINT)
           AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
vv AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM weekly GROUP BY y),
ranked AS (
  SELECT y,
         CAST(2 * SUM(cnt) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + 1 AS BIGINT) AS r2
  FROM vv
),
series AS (
  SELECT w.w, r.r2,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(ROW_NUMBER() OVER (ORDER BY w.w) AS BIGINT) AS t,
         CAST(SUM(r.r2) OVER (ORDER BY w.w
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_r2
  FROM weekly w JOIN ranked r USING (y)
),
u AS (
  SELECT n, w, ABS(cum_r2 - t * (n + 1)) AS u2_abs
  FROM series WHERE t < n
),
top AS (
  SELECT n, w, u2_abs,
         ROW_NUMBER() OVER (ORDER BY u2_abs DESC, w) AS rk
  FROM u
)
SELECT n AS n_weeks,
       CAST(w AS BIGINT) AS changepoint_week,
       CAST(u2_abs AS BIGINT) AS k_stat_doubled,
       {sql_round(
           '2.0 * exp(-6.0 * (u2_abs / 2.0) * (u2_abs / 2.0)'
           ' / ((n * 1.0) * n * n + (n * 1.0) * n))', 6)} AS p_value
FROM top WHERE rk = 1
"""


@register("pettitt_test", oracle=_B154_ORACLE)
def pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point test on the weekly order-volume series:
    U_t = sum of rank deviations before/after each candidate split,
    K = max_t |U_t| locates the single most likely break and
    p ~ 2 exp(-6K^2/(n^3+n^2)) says whether it's real — the
    nonparametric WHERE to B85's CUSUM (which assumes a known mean)
    and the localisation step after B152's trend verdict.

    Exactness: the classic U_t = 2*sum(R_i, i<=t) - t(n+1) over
    average ranks, carried in DOUBLED ranks (B91's trick) so every
    U_t is an exact BIGINT; only the closed-form p-value is a
    double. Deterministic (|U| desc, week) argmax.

    Scale shape: fact to |weeks| frame once; ranks from the bounded
    value-grain frame; one cumulative window over |weeks| rows.
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
    vv = weekly.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_v = Window.orderBy("y").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = vv.select(
        "y",
        (2 * F.sum("cnt").over(w_v) - F.col("cnt") + 1)
        .cast("bigint")
        .alias("r2"),
    )
    w_all = Window.partitionBy()
    w_t = Window.orderBy("w")
    w_cum = w_t.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series = (
        weekly.join(F.broadcast(ranked), "y")
        .select(
            "w",
            "r2",
            F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
            F.row_number().over(w_t).cast("bigint").alias("t"),
            F.sum("r2").over(w_cum).cast("bigint").alias("cum_r2"),
        )
    )
    u = series.where(F.col("t") < F.col("n")).select(
        "n",
        "w",
        F.abs(F.col("cum_r2") - F.col("t") * (F.col("n") + 1)).alias(
            "u2_abs"
        ),
    )
    top = u.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("u2_abs").desc(), F.col("w"))
        ),
    ).where(F.col("rk") == 1)
    n, k2 = F.col("n"), F.col("u2_abs")
    p = 2.0 * F.exp(
        -6.0
        * (k2 / 2.0)
        * (k2 / 2.0)
        / ((n * 1.0) * n * n + (n * 1.0) * n)
    )
    return top.select(
        n.alias("n_weeks"),
        F.col("w").cast("bigint").alias("changepoint_week"),
        k2.cast("bigint").alias("k_stat_doubled"),
        round_eps(p, 6).alias("p_value"),
    )


# ---------------------------------------------------------------- B155

OB_SEG_A = "BUILDING"
OB_SEG_B = "MACHINERY"

_B155_ORACLE = f"""
WITH lx AS (
  SELECT l_orderkey AS ok, CAST(COUNT(*) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
),
oy AS (
  SELECT o.o_orderkey AS ok, c.c_mktsegment AS g,
         CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{OB_SEG_A}', '{OB_SEG_B}')
),
samp AS (SELECT oy.g, lx.x, oy.y FROM oy JOIN lx USING (ok)),
grp AS (
  SELECT g,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM samp GROUP BY g
),
fit AS (
  SELECT g, n,
         CAST(sx AS DOUBLE) / n AS xbar,
         CAST(sy AS DOUBLE) / n AS ybar,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS b
  FROM grp
),
wide AS (
  SELECT MAX(CASE WHEN g = '{OB_SEG_A}' THEN xbar END) AS xa,
         MAX(CASE WHEN g = '{OB_SEG_A}' THEN ybar END) AS ya,
         MAX(CASE WHEN g = '{OB_SEG_A}' THEN b END) AS ba,
         MAX(CASE WHEN g = '{OB_SEG_B}' THEN xbar END) AS xb,
         MAX(CASE WHEN g = '{OB_SEG_B}' THEN ybar END) AS yb,
         MAX(CASE WHEN g = '{OB_SEG_B}' THEN b END) AS bb,
         MAX(CASE WHEN g = '{OB_SEG_A}' THEN n END) AS na,
         MAX(CASE WHEN g = '{OB_SEG_B}' THEN n END) AS nb
  FROM fit
)
SELECT na AS n_{OB_SEG_A.lower()}, nb AS n_{OB_SEG_B.lower()},
       {sql_round('(ya - yb) / 100.0', 4)} AS gap,
       {sql_round('bb * (xa - xb) / 100.0', 4)} AS explained,
       {sql_round('((ya - yb) - bb * (xa - xb)) / 100.0', 4)}
         AS unexplained,
       {sql_round('bb * (xa - xb) * 100.0 / (ya - yb)', 4)}
         AS pct_explained
FROM wide
"""


@register("oaxaca_blinder", oracle=_B155_ORACLE)
def oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca-Blinder two-fold decomposition of the mean order-value
    gap between the {OB_SEG_A} and {OB_SEG_B} segments, with order
    width (lineitem count) as the endowment: explained =
    b_B * (xbar_A - xbar_B) is the part of the gap due to segment A
    simply placing WIDER orders; the remainder is behavioural
    (different price per line) — econometrics' standard answer to
    "is this gap composition or conduct", one level deeper than
    B129's Simpson audit.

    Exactness: per-group OLS sufficient statistics in 128-bit
    integers (HUGEINT / decimal(38,0)); slopes and the decomposition
    are O(1) algebra on |groups| = 2 rows pivoted wide by
    conditional aggregates — no scalar-attach join at all.

    Scale shape: one lineitem aggregate to order grain, one
    orders-customer join (key-partitioned), one group aggregate.
    """
    lx = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    oy = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("ok"),
            F.col("o_custkey").alias("ck"),
            F.round(F.col("o_totalprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("y"),
        )
        .join(
            load_table(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment").isin(OB_SEG_A, OB_SEG_B))
            .select(
                F.col("c_custkey").alias("ck"),
                F.col("c_mktsegment").alias("g"),
            ),
            "ck",
        )
    )
    samp = oy.join(lx, "ok").select("g", "x", "y")
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    grp = samp.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
    )
    n = F.col("n")
    fit = grp.select(
        "g",
        "n",
        (F.col("sx").cast("double") / n).alias("xbar"),
        (F.col("sy").cast("double") / n).alias("ybar"),
        (
            (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("b"),
    )

    def pick(seg: str, col: str):
        return F.max(F.when(F.col("g") == seg, F.col(col)))

    wide = fit.agg(
        pick(OB_SEG_A, "xbar").alias("xa"),
        pick(OB_SEG_A, "ybar").alias("ya"),
        pick(OB_SEG_A, "b").alias("ba"),
        pick(OB_SEG_B, "xbar").alias("xb"),
        pick(OB_SEG_B, "ybar").alias("yb"),
        pick(OB_SEG_B, "b").alias("bb"),
        pick(OB_SEG_A, "n").alias("na"),
        pick(OB_SEG_B, "n").alias("nb"),
    )
    gap = F.col("ya") - F.col("yb")
    expl = F.col("bb") * (F.col("xa") - F.col("xb"))
    return wide.select(
        F.col("na").alias(f"n_{OB_SEG_A.lower()}"),
        F.col("nb").alias(f"n_{OB_SEG_B.lower()}"),
        round_eps(gap / 100.0, 4).alias("gap"),
        round_eps(expl / 100.0, 4).alias("explained"),
        round_eps((gap - expl) / 100.0, 4).alias("unexplained"),
        round_eps(expl * 100.0 / gap, 4).alias("pct_explained"),
    )


# ---------------------------------------------------------------- C159

PPL_ALPHA = 0.5

_C159_ORACLE = f"""
WITH toks AS (
  SELECT doc_id % 2 AS part, source,
         string_split_regex(lower(text), '\\s+') AS t
  FROM documents
),
bigrams AS (
  SELECT part, source,
         unnest(list_transform(
           generate_series(1, greatest(len(t) - 1, 0)),
           i -> {{'w1': t[i], 'w2': t[i+1]}})) AS bg
  FROM toks
),
ev AS (
  SELECT source, bg.w1 AS w1, bg.w2 AS w2,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bigrams WHERE part = 1 GROUP BY 1, 2, 3
),
tr_bg AS (
  SELECT bg.w1 AS w1, bg.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM bigrams WHERE part = 0 GROUP BY 1, 2
),
tr_ug AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM tr_bg GROUP BY w1
),
vocab AS (
  SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS v FROM (
    SELECT unnest(t) AS u FROM toks WHERE part = 0
  )
),
scored AS (
  SELECT e.source, e.cnt,
         COALESCE(t2.c12, 0) AS c12, COALESCE(t1.c1, 0) AS c1, vocab.v
  FROM ev e
  LEFT JOIN tr_bg t2 ON e.w1 = t2.w1 AND e.w2 = t2.w2
  LEFT JOIN tr_ug t1 ON e.w1 = t1.w1
  CROSS JOIN vocab
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN c12 = 0 THEN cnt ELSE 0 END) AS BIGINT)
         AS n_unseen,
       {sql_round(
           f'exp(-SUM(cnt * ln((c12 + {PPL_ALPHA!r})'
           f' / (c1 + {PPL_ALPHA!r} * v))) / SUM(cnt))', 4)} AS ppl
FROM scored GROUP BY source ORDER BY source
"""


@register("holdout_bigram_ppl", oracle=_C159_ORACLE)
def holdout_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram perplexity per source: an add-{PPL_ALPHA}
    smoothed bigram LM is fit on the even-doc_id half and scores the
    odd half — the CCNet-style quality signal done honestly (C23's
    in-corpus bigram score and C94's perplexity buckets reward
    memorising the very text being scored; a held-out split cannot).
    Also reports the unseen-bigram share (the bigram OOV rate,
    C144's question one order up).

    Scale shape: both halves' bigrams collapse to count grain before
    anything joins (the only corpus-volume shuffle is the bigram
    aggregate each side); scoring is two LEFT equi-joins at
    bigram-vocabulary grain plus a broadcast 1-row vocab attach;
    the report is a |sources|-row reduction of exact counts, with
    the log-sum the only float.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        F.pmod(F.col("doc_id"), F.lit(2)).alias("part"),
        "source",
        F.split(F.lower(F.col("text")), r"\s+").alias("t"),
    )
    t = F.col("t")
    shifted = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
    bg = F.slice(
        F.zip_with(
            t, shifted, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
        ),
        1,
        F.greatest(F.size(t) - 1, F.lit(0)),
    )
    bigrams = toks.select(
        "part", "source", F.explode(bg).alias("bg")
    ).select(
        "part",
        "source",
        F.col("bg.w1").alias("w1"),
        F.col("bg.w2").alias("w2"),
    )
    bigrams = bigrams.persist()
    ev = (
        bigrams.where(F.col("part") == 1)
        .groupBy("source", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tr_bg = (
        bigrams.where(F.col("part") == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    tr_bg = tr_bg.persist()
    tr_ug = tr_bg.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1")
    )
    vocab = (
        toks.where(F.col("part") == 0)
        .select(F.explode("t").alias("u"))
        .agg(F.countDistinct("u").cast("bigint").alias("v"))
    )
    scored = (
        ev.join(tr_bg, ["w1", "w2"], "left")
        .join(tr_ug, "w1", "left")
        .transform(scalars(vocab))
        .select(
            "source",
            "cnt",
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
            "v",
        )
    )
    lnp = F.log(
        (F.col("c12") + PPL_ALPHA) / (F.col("c1") + PPL_ALPHA * F.col("v"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.sum(F.when(F.col("c12") == 0, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_unseen"),
            round_eps(
                F.exp(-F.sum(F.col("cnt") * lnp) / F.sum("cnt")), 4
            ).alias("ppl"),
        )
        .orderBy("source")
    )
