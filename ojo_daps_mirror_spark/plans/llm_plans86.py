"""Eighty-sixth sweep (SURVEY.md §2 B158-B159, C161).

Friedman blocked rank test (completing the rank-test family: B91
Mann-Whitney two-sample, B134 Kruskal-Wallis independent k-sample —
this is the k-sample test when samples are PAIRED by week), the
Hurst R/S exponent (long-memory: does this series merely
autocorrelate (B146) or remember for months — the number that
decides whether averaging windows shrink errors at all), and the
text entropy rate (how many bits the previous token buys — the
corpus compressibility/predictability number behind every
perplexity signal C23/C94/C159 report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B158

_B158_ORACLE = f"""
WITH wk AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7 AS BIGINT)
           AS b,
         o_orderpriority AS j,
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
  SELECT b, j, x,
         CAST(2 * RANK() OVER (PARTITION BY b ORDER BY x)
              + COUNT(*) OVER (PARTITION BY b, x) - 1 AS BIGINT) AS r2
  FROM cells
),
ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS t FROM cells GROUP BY b, x
  )
),
rj AS (
  SELECT j, CAST(SUM(r2) AS BIGINT) AS r2j,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ranked GROUP BY j
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(n) AS n,
         SUM((r2j / 2.0) * (r2j / 2.0)) AS sr2
  FROM rj
)
SELECT k, n AS n_blocks,
       {sql_round(
           '(12.0 * sr2 / (n * k * (k + 1.0)) - 3.0 * n * (k + 1))'
           ' / (1.0 - tie_term'
           '   / ((n * 1.0) * k * (k * 1.0 * k - 1)))', 6)}
         AS friedman_chi2
FROM red CROSS JOIN ties
"""


@register("friedman_test", oracle=_B158_ORACLE)
def friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Friedman test of order-priority volumes BLOCKED
    by week: within each (complete) week the k priority classes are
    ranked, and the test asks whether any class systematically ranks
    high across weeks — the paired k-sample member of the rank-test
    family (B91 two-sample, B134 independent k-sample) that removes
    week-to-week volume swings the way a paired t-test removes
    subject effects. Chi2(k-1) under H0.

    Exactness: within-block average ranks carried as exact doubled
    integers (2*min_rank + ties - 1); rank sums, block counts and
    the Sum(t^3 - t) tie term are exact BIGINTs; one double division
    at the end. Incomplete weeks (a priority with zero orders) are
    excluded — the standard complete-block design, decided by an
    exact count both engines share.

    Scale shape: fact collapses to the (week, priority) grid once;
    ranks are windows over <=k-row partitions; everything downstream
    is |priorities|-row.
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
            F.col("o_orderpriority").alias("j"),
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
        "b",
        "j",
        (
            2 * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - 1
        )
        .cast("bigint")
        .alias("r2"),
    )
    ties = (
        cells.groupBy("b", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("tie_term")
        )
    )
    rj = ranked.groupBy("j").agg(
        F.sum("r2").cast("bigint").alias("r2j"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    red = rj.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("n").cast("bigint").alias("n"),
        F.sum((F.col("r2j") / 2.0) * (F.col("r2j") / 2.0)).alias("sr2"),
    )
    k, n = F.col("k"), F.col("n")
    chi = (
        12.0 * F.col("sr2") / (n * k * (k + 1.0)) - 3.0 * n * (k + 1)
    ) / (
        1.0
        - F.col("tie_term") / ((n * 1.0) * k * (k * 1.0 * k - 1))
    )
    return (
        red.transform(scalars(ties))
        .select(
            "k",
            n.alias("n_blocks"),
            round_eps(chi, 6).alias("friedman_chi2"),
        )
    )


# ---------------------------------------------------------------- B159

HURST_MS = (8, 16, 32, 64)


def _b159_block_cte(m: int) -> str:
    return f"""
  SELECT {m} AS m, (t - 1) // {m} AS bid, t, x FROM daily"""


_B159_ORACLE = f"""
WITH daily_raw AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY 1
),
daily AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t, x
  FROM daily_raw
),
blocks AS ({" UNION ALL ".join(_b159_block_cte(m) for m in HURST_MS)}),
cum AS (
  SELECT m, bid, t, x,
         CAST(SUM(x) OVER (PARTITION BY m, bid ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cx,
         CAST(ROW_NUMBER() OVER (PARTITION BY m, bid ORDER BY t)
           AS BIGINT) AS i,
         CAST(SUM(x) OVER (PARTITION BY m, bid) AS BIGINT) AS s,
         CAST(SUM(CAST(x AS HUGEINT) * x) OVER (PARTITION BY m, bid)
           AS HUGEINT) AS s2,
         CAST(COUNT(*) OVER (PARTITION BY m, bid) AS BIGINT) AS cnt
  FROM blocks
),
dev AS (
  SELECT m, bid, cnt, s, s2,
         cx - i * (s * 1.0 / m) AS c
  FROM cum WHERE cnt = m
),
rs AS (
  SELECT m, bid,
         (MAX(c) - MIN(c))
           / sqrt(CAST(MAX(s2) AS DOUBLE) / m
                  - (MAX(s) * 1.0 / m) * (MAX(s) * 1.0 / m)) AS rs_val
  FROM dev
  GROUP BY m, bid
  HAVING MAX(s2) * m > CAST(MAX(s) AS HUGEINT) * MAX(s)
),
per_m AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         AVG(rs_val) AS mean_rs
  FROM rs GROUP BY m
),
fit AS (
  SELECT m, n_blocks, mean_rs,
         CAST(COUNT(*) OVER () AS BIGINT) AS np,
         SUM(ln(m * 1.0)) OVER () AS sx,
         SUM(ln(mean_rs)) OVER () AS sy,
         SUM(ln(m * 1.0) * ln(m * 1.0)) OVER () AS sxx,
         SUM(ln(m * 1.0) * ln(mean_rs)) OVER () AS sxy
  FROM per_m
)
SELECT m, n_blocks,
       {sql_round('mean_rs', 6)} AS mean_rs,
       {sql_round(
           '(np * sxy - sx * sy) / (np * sxx - sx * sx)', 6)}
         AS hurst_exponent
FROM fit ORDER BY m
"""


@register("hurst_rs", oracle=_B159_ORACLE)
def hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue by classic rescaled-range
    analysis: at block sizes m = {HURST_MS}, each complete block's
    range of cumulative mean-deviations over its std gives R/S;
    the slope of ln(mean R/S) on ln(m) is H — 0.5 means no memory,
    H > 0.5 long-range persistence that B93's short-lag ACF and
    B146's lag-1 DW cannot see, and the regime where averaging
    windows stop shrinking errors.

    Exactness: block sums/squares are exact integers (128-bit for
    the squares); cumulative deviations and R/S are identical IEEE
    shapes; degenerate blocks (zero variance) are excluded by an
    EXACT integer comparison (s2*m > s^2) both engines share.

    Scale shape: fact collapses to the |days| frame once; the four
    block sizes are a union of windowed passes over that bounded
    frame; the log-log fit is a window over 4 rows.
    """
    daily_raw = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("x")
        )
    )
    daily = daily_raw.select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("t"),
        "x",
    )
    daily = daily.persist()
    frames = []
    for m in HURST_MS:
        frames.append(
            daily.select(
                F.lit(m).cast("int").alias("m"),
                ((F.col("t") - 1) / m).cast("bigint").alias("bid"),
                "t",
                "x",
            )
        )
    blocks = frames[0]
    for fr in frames[1:]:
        blocks = blocks.unionAll(fr)
    w_blk = Window.partitionBy("m", "bid")
    w_cum = w_blk.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = blocks.select(
        "m",
        "bid",
        F.sum("x").over(w_cum).cast("bigint").alias("cx"),
        F.row_number().over(w_blk.orderBy("t")).cast("bigint").alias("i"),
        F.sum("x").over(w_blk).cast("bigint").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .over(w_blk)
        .cast("decimal(38,0)")
        .alias("s2"),
        F.count(F.lit(1)).over(w_blk).cast("bigint").alias("cnt"),
    )
    dev = cum.where(F.col("cnt") == F.col("m")).select(
        "m",
        "bid",
        "s",
        "s2",
        (F.col("cx") - F.col("i") * (F.col("s") * 1.0 / F.col("m"))).alias(
            "c"
        ),
    )
    rs = (
        dev.groupBy("m", "bid")
        .agg(
            F.max("c").alias("cmax"),
            F.min("c").alias("cmin"),
            F.max("s").alias("s"),
            F.max("s2").alias("s2"),
        )
        .where(
            F.col("s2") * F.col("m")
            > F.col("s").cast("decimal(38,0)") * F.col("s")
        )
        .select(
            "m",
            (
                (F.col("cmax") - F.col("cmin"))
                / F.sqrt(
                    F.col("s2").cast("double") / F.col("m")
                    - (F.col("s") * 1.0 / F.col("m"))
                    * (F.col("s") * 1.0 / F.col("m"))
                )
            ).alias("rs_val"),
        )
    )
    per_m = rs.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.avg("rs_val").alias("mean_rs"),
    )
    w_all = Window.partitionBy()
    lx = F.log(F.col("m") * 1.0)
    ly = F.log(F.col("mean_rs"))
    fit = per_m.select(
        "m",
        "n_blocks",
        "mean_rs",
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("np"),
        F.sum(lx).over(w_all).alias("sx"),
        F.sum(ly).over(w_all).alias("sy"),
        F.sum(lx * lx).over(w_all).alias("sxx"),
        F.sum(lx * ly).over(w_all).alias("sxy"),
    )
    np_, sx, sy, sxx, sxy = (
        F.col("np"),
        F.col("sx"),
        F.col("sy"),
        F.col("sxx"),
        F.col("sxy"),
    )
    return fit.select(
        "m",
        "n_blocks",
        round_eps(F.col("mean_rs"), 6).alias("mean_rs"),
        round_eps(
            (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx), 6
        ).alias("hurst_exponent"),
    ).orderBy("m")


# ---------------------------------------------------------------- C161

_C161_ORACLE = f"""
WITH toks AS (
  SELECT source, string_split_regex(lower(text), '\\s+') AS t
  FROM documents
),
bg AS (
  SELECT source, u.w1 AS w1, u.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    SELECT source,
           unnest(list_transform(
             generate_series(1, greatest(len(t) - 1, 0)),
             i -> {{'w1': t[i], 'w2': t[i+1]}})) AS u
    FROM toks
  )
  GROUP BY 1, 2, 3
),
marg AS (
  SELECT source, w1, CAST(SUM(c) AS BIGINT) AS c1 FROM bg GROUP BY 1, 2
),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS b FROM bg GROUP BY 1),
hj AS (
  SELECT bg.source,
         -SUM((bg.c * 1.0 / t.b) * log2(bg.c * 1.0 / t.b)) AS h_joint
  FROM bg JOIN tot t USING (source) GROUP BY bg.source
),
hm AS (
  SELECT m.source,
         -SUM((m.c1 * 1.0 / t.b) * log2(m.c1 * 1.0 / t.b)) AS h_marg
  FROM marg m JOIN tot t USING (source) GROUP BY m.source
)
SELECT hj.source AS source, t.b AS n_bigrams,
       {sql_round('h_marg', 6)} AS h_unigram_bits,
       {sql_round('h_joint - h_marg', 6)} AS h_cond_bits,
       {sql_round('h_marg - (h_joint - h_marg)', 6)} AS info_gain_bits,
       {sql_round('(h_joint - h_marg) / h_marg', 6)} AS entropy_ratio
FROM hj JOIN hm USING (source) JOIN tot t USING (source)
ORDER BY source
"""


@register("text_entropy_rate", oracle=_C161_ORACLE)
def text_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram entropy rate per source: H(W2 | W1) = H(W1, W2) - H(W1)
    in bits — how much knowing the previous token compresses the
    next, with the info gain H(W1) - H(W2|W1) and the conditional/
    marginal ratio. This is the model-free compressibility floor
    under every LM quality signal here (C23's scores, C94's buckets,
    C159's held-out perplexity): a source whose ratio ~1 is
    incompressible noise, ~0 is pure template — either extreme is a
    data-quality flag C132 should name.

    Scale shape: ONE bigram aggregate per source is the only
    corpus-volume shuffle (the same one C159's LM pays); the
    marginal re-aggregates the bigram-grain frame; totals ride a
    |sources|-key join; the entropy sums run at vocabulary grain.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        "source", F.split(F.lower(F.col("text")), r"\s+").alias("t")
    )
    t = F.col("t")
    shifted = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
    pairs = F.slice(
        F.zip_with(
            t, shifted, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
        ),
        1,
        F.greatest(F.size(t) - 1, F.lit(0)),
    )
    bg = (
        toks.select("source", F.explode(pairs).alias("u"))
        .select(
            "source",
            F.col("u.w1").alias("w1"),
            F.col("u.w2").alias("w2"),
        )
        .groupBy("source", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    bg = bg.persist()
    marg = bg.groupBy("source", "w1").agg(
        F.sum("c").cast("bigint").alias("c1")
    )
    tot = bg.groupBy("source").agg(F.sum("c").cast("bigint").alias("b"))
    hj = (
        bg.join(tot, "source")
        .groupBy("source")
        .agg(
            (
                -F.sum(
                    (F.col("c") * 1.0 / F.col("b"))
                    * F.log2(F.col("c") * 1.0 / F.col("b"))
                )
            ).alias("h_joint")
        )
    )
    hm = (
        marg.join(tot, "source")
        .groupBy("source")
        .agg(
            (
                -F.sum(
                    (F.col("c1") * 1.0 / F.col("b"))
                    * F.log2(F.col("c1") * 1.0 / F.col("b"))
                )
            ).alias("h_marg")
        )
    )
    out = hj.join(hm, "source").join(tot, "source")
    h_cond = F.col("h_joint") - F.col("h_marg")
    return out.select(
        "source",
        F.col("b").alias("n_bigrams"),
        round_eps(F.col("h_marg"), 6).alias("h_unigram_bits"),
        round_eps(h_cond, 6).alias("h_cond_bits"),
        round_eps(F.col("h_marg") - h_cond, 6).alias("info_gain_bits"),
        round_eps(h_cond / F.col("h_marg"), 6).alias("entropy_ratio"),
    ).orderBy("source")
