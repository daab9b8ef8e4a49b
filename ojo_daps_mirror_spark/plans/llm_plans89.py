"""Eighty-ninth sweep (SURVEY.md §2 B164-B165, C164).

Expected shortfall / VaR on daily revenue drops (the tail-risk pair:
VaR says the 95th-percentile bad day, CVaR says how bad the bad days
ARE — the coherent-risk fix for VaR's blindness past the threshold),
the Kupiec proportion-of-failures backtest (is a VaR model's breach
COUNT consistent with its confidence level — the regulatory test
that closes the risk loop), and the embedding participation ratio
(how many dimensions the corpus actually uses — the spectral
effective-dimensionality diagnostic next to C109's isotropy and
C104's matryoshka recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B164

ES_ALPHA = 0.05  # tail level: 95% VaR / CVaR

_B164_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
diffs AS (
  SELECT d, CAST(LAG(v) OVER (ORDER BY d) - v AS BIGINT) AS loss
  FROM daily QUALIFY loss IS NOT NULL
),
ranked AS (
  SELECT d, loss,
         CAST(ROW_NUMBER() OVER (ORDER BY loss DESC, d) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM diffs
),
kk AS (
  SELECT n, CAST(FLOOR({ES_ALPHA!r} * n) + 1 AS BIGINT) AS k
  FROM ranked LIMIT 1
)
SELECT r.n AS n_days,
       {sql_round('MAX(CASE WHEN r.rk = kk.k THEN r.loss END) / 100.0', 2)}
         AS var95,
       {sql_round(
           'SUM(CASE WHEN r.rk <= kk.k THEN r.loss ELSE 0 END) * 1.0'
           ' / (kk.k * 100.0)', 4)} AS cvar95,
       {sql_round(
           'MAX(CASE WHEN r.rk = 1 THEN r.loss END) / 100.0', 2)}
         AS worst_drop
FROM ranked r CROSS JOIN kk
GROUP BY r.n, kk.k
"""


@register("expected_shortfall", oracle=_B164_ORACLE)
def expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% VaR and expected shortfall (CVaR) of day-over-day revenue
    DROPS: VaR is the k-th worst daily drop (k = floor(0.05 n) + 1,
    the empirical tail quantile), CVaR the mean of the k worst —
    the coherent tail-risk number that keeps caring how bad the tail
    is past the threshold, where B138's Gumbel return level
    extrapolates the maximum and B110 only flags. Exact integer
    order statistics, no interpolation ambiguity.

    Scale shape: fact to |days| frame, one lag window, one
    (loss desc, day) rank over the bounded frame, a 1-row k attach,
    one conditional reduction.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("v")
        )
    )
    diffs = daily.select(
        "d",
        (F.lag("v").over(Window.orderBy("d")) - F.col("v"))
        .cast("bigint")
        .alias("loss"),
    ).where(F.col("loss").isNotNull())
    w_all = Window.partitionBy()
    ranked = diffs.select(
        "d",
        "loss",
        F.row_number()
        .over(Window.orderBy(F.col("loss").desc(), F.col("d")))
        .cast("bigint")
        .alias("rk"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    ).withColumn(
        "k", (F.floor(F.lit(ES_ALPHA) * F.col("n")) + 1).cast("bigint")
    )
    return ranked.groupBy("n", "k").agg(
        round_eps(
            F.max(F.when(F.col("rk") == F.col("k"), F.col("loss")))
            / 100.0,
            2,
        ).alias("var95"),
        round_eps(
            F.sum(
                F.when(F.col("rk") <= F.col("k"), F.col("loss")).otherwise(
                    0
                )
            )
            * 1.0
            / (F.col("k") * 100.0),
            4,
        ).alias("cvar95"),
        round_eps(
            F.max(F.when(F.col("rk") == 1, F.col("loss"))) / 100.0, 2
        ).alias("worst_drop"),
    ).select(
        F.col("n").alias("n_days"), "var95", "cvar95", "worst_drop"
    )


# ---------------------------------------------------------------- B165

KUPIEC_SPLIT = 1998  # train < split <= eval
KUPIEC_P = 0.05

_B165_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
diffs AS (
  SELECT d, CAST(LAG(v) OVER (ORDER BY d) - v AS BIGINT) AS loss
  FROM daily QUALIFY loss IS NOT NULL
),
train AS (
  SELECT loss, ROW_NUMBER() OVER (ORDER BY loss DESC, loss) AS rk,
         COUNT(*) OVER () AS n
  FROM diffs WHERE year(d) < {KUPIEC_SPLIT}
),
var_t AS (
  SELECT CAST(MAX(CASE WHEN rk = CAST(FLOOR({KUPIEC_P!r} * n) + 1
                                  AS BIGINT)
                       THEN loss END) AS BIGINT) AS var_train
  FROM train
),
ev AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
         CAST(SUM(CASE WHEN d2.loss > v.var_train THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM (SELECT * FROM diffs WHERE year(d) >= {KUPIEC_SPLIT}) d2
  CROSS JOIN var_t v
)
SELECT n_eval, x AS n_breaches,
       {sql_round('x * 1.0 / n_eval', 6)} AS breach_rate,
       {sql_round(
           f'-2.0 * ((n_eval - x) * ln(1.0 - {KUPIEC_P!r})'
           f' + x * ln({KUPIEC_P!r})'
           ' - (n_eval - x) * ln(CASE WHEN x = n_eval THEN 1.0'
           '                          ELSE 1.0 - x * 1.0 / n_eval END)'
           ' - x * ln(CASE WHEN x = 0 THEN 1.0'
           '               ELSE x * 1.0 / n_eval END))', 6)} AS lr_pof
FROM ev
"""


@register("kupiec_pof_test", oracle=_B165_ORACLE)
def kupiec_pof_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kupiec proportion-of-failures backtest of B164's VaR model:
    the 95% VaR is fit on pre-{KUPIEC_SPLIT} daily drops, then the
    breach count on {KUPIEC_SPLIT}+ is tested against the nominal 5%
    by likelihood ratio (chi2(1) under H0) — the regulatory
    out-of-sample check that a tail model is neither too loose nor
    suspiciously tight. Train/eval split by calendar year, the same
    honest-holdout discipline as C159.

    Exactness: the train VaR is an exact integer order statistic;
    breach counts are exact; the LR is O(1) algebra with the x=0 and
    x=n edge cases pinned to 0*ln(0) = 0 in both engines.

    Scale shape: one |days|-frame lag pass shared by both windows,
    a 1-row broadcast VaR attach onto the eval frame, one reduction.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("v")
        )
    )
    diffs = daily.select(
        "d",
        (F.lag("v").over(Window.orderBy("d")) - F.col("v"))
        .cast("bigint")
        .alias("loss"),
    ).where(F.col("loss").isNotNull())
    diffs = diffs.persist()
    w_all = Window.partitionBy()
    train = (
        diffs.where(F.year("d") < KUPIEC_SPLIT)
        .select(
            "loss",
            F.row_number()
            .over(Window.orderBy(F.col("loss").desc()))
            .alias("rk"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
    )
    var_t = train.agg(
        F.max(
            F.when(
                F.col("rk")
                == (F.floor(F.lit(KUPIEC_P) * F.col("n")) + 1).cast(
                    "bigint"
                ),
                F.col("loss"),
            )
        )
        .cast("bigint")
        .alias("var_train")
    )
    ev = (
        diffs.where(F.year("d") >= KUPIEC_SPLIT)
        .transform(scalars(var_t))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum(
                F.when(F.col("loss") > F.col("var_train"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
        )
    )
    n, x = F.col("n_eval"), F.col("x")
    rate = x * 1.0 / n
    import math

    lr = -2.0 * (
        (n - x) * math.log(1.0 - KUPIEC_P)
        + x * math.log(KUPIEC_P)
        - (n - x)
        * F.log(F.when(x == n, 1.0).otherwise(1.0 - x * 1.0 / n))
        - x * F.log(F.when(x == 0, 1.0).otherwise(x * 1.0 / n))
    )
    return ev.select(
        "n_eval",
        x.alias("n_breaches"),
        round_eps(rate, 6).alias("breach_rate"),
        round_eps(lr, 6).alias("lr_pof"),
    )


# ---------------------------------------------------------------- C164

_C164_ORACLE = f"""
WITH dims AS (
  SELECT u.d AS d, CAST(u.x AS DOUBLE) AS x FROM (
    SELECT unnest(list_transform(embedding,
                                 (x, i) -> {{'d': i, 'x': x}})) AS u
    FROM embeddings
  )
),
per_dim AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS s1, SUM(x * x) AS s2
  FROM dims GROUP BY d
),
vars AS (
  SELECT d, n, s2 / n - (s1 / n) * (s1 / n) AS var FROM per_dim
),
red AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_vectors,
         CAST(COUNT(*) AS BIGINT) AS n_dims,
         SUM(var) AS tv, SUM(var * var) AS tv2, MAX(var) AS vmax
  FROM vars
)
SELECT n_vectors, n_dims,
       {sql_round('tv', 6)} AS total_variance,
       {sql_round('tv * tv / tv2', 4)} AS participation_ratio,
       {sql_round('vmax * 100.0 / tv', 4)} AS max_dim_share_pct
FROM red
"""


@register("participation_ratio", oracle=_C164_ORACLE)
def participation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding participation ratio PR = (sum var_d)^2 / sum var_d^2
    over per-dimension variances — the spectral effective
    dimensionality (PR = D when every dimension carries equal
    variance, PR -> 1 under collapse): the diagonal-spectrum
    diagnostic that catches dimensional collapse C109's mean-cosine
    isotropy can miss, and the capacity number behind C104's
    matryoshka-truncation recall. Also reports the heaviest single
    dimension's variance share.

    Scale shape: one posexplode to (dim, value) grain — |dims| x n
    rows through ONE map-side-combined aggregate to |dims| rows;
    the spectrum reduction is |dims|-row. Values are cast to double
    BEFORE any arithmetic in both engines (float32 storage must not
    accumulate in float32).
    """
    dims = load_table(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("d0", "xf")
    ).select(
        (F.col("d0") + 1).alias("d"), F.col("xf").cast("double").alias("x")
    )
    per_dim = dims.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    n = F.col("n")
    vars_ = per_dim.select(
        "d",
        "n",
        (F.col("s2") / n - (F.col("s1") / n) * (F.col("s1") / n)).alias(
            "var"
        ),
    )
    red = vars_.agg(
        F.max("n").cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.sum("var").alias("tv"),
        F.sum(F.col("var") * F.col("var")).alias("tv2"),
        F.max("var").alias("vmax"),
    )
    return red.select(
        "n_vectors",
        "n_dims",
        round_eps(F.col("tv"), 6).alias("total_variance"),
        round_eps(F.col("tv") * F.col("tv") / F.col("tv2"), 4).alias(
            "participation_ratio"
        ),
        round_eps(F.col("vmax") * 100.0 / F.col("tv"), 4).alias(
            "max_dim_share_pct"
        ),
    )
