"""Hundred-eleventh sweep (SURVEY.md §2 B205-B206, C189).

Batch-means confidence intervals (the autocorrelation-robust CI
from simulation output analysis — B146/B159 DIAGNOSE dependence,
this is what you DO about it), fixed-frequency periodogram peaks
(the spectral view of seasonality B93's time-domain correlogram
reads lag by lag), and the background-cosine null (the semantic
twin of C167's lexical null — the calibration floor under every
embedding-similarity threshold in the ANN/semdedup family).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.vectors import dot, norm, sql_cosine
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B205

BM_BATCH = 32

_B205_ORACLE = f"""
WITH daily_raw AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
idx AS (
  SELECT v, (ROW_NUMBER() OVER (ORDER BY d) - 1) // {BM_BATCH} AS bid,
         ROW_NUMBER() OVER (ORDER BY d) AS t,
         COUNT(*) OVER () AS nd
  FROM daily_raw
),
complete AS (
  SELECT v, bid FROM idx WHERE bid < nd // {BM_BATCH}
),
batches AS (
  SELECT bid, CAST(SUM(v) AS HUGEINT) AS s,
         CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM complete GROUP BY bid
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(s) AS HUGEINT) AS st,
         CAST(SUM(s2) AS DOUBLE) AS s2d,
         SUM((CAST(s AS DOUBLE) / {BM_BATCH})
             * (CAST(s AS DOUBLE) / {BM_BATCH})) AS sb2
  FROM batches
),
ci AS (
  SELECT m, n,
         CAST(st AS DOUBLE) / n AS mu,
         sqrt((s2d - CAST(st AS DOUBLE) * st / n) / (n - 1.0)) AS sd_day,
         sqrt((sb2 - (CAST(st AS DOUBLE) / {BM_BATCH})
                     * (CAST(st AS DOUBLE) / {BM_BATCH}) / m)
              / (m - 1.0)) AS sd_batch
  FROM red
)
SELECT m AS n_batches, n AS n_days,
       {sql_round('mu / 100.0', 4)} AS mean_daily,
       {sql_round('1.96 * sd_day / sqrt(n * 1.0) / 100.0', 4)}
         AS naive_ci_half,
       {sql_round('1.96 * sd_batch / sqrt(m * 1.0) / 100.0', 4)}
         AS batch_means_ci_half,
       {sql_round(
           '(sd_batch / sqrt(m * 1.0)) / (sd_day / sqrt(n * 1.0))',
           6)} AS inefficiency_factor
FROM ci
"""


@register("batch_means_ci", oracle=_B205_ORACLE)
def batch_means_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-means CI for mean daily revenue (batch = {BM_BATCH}
    days): the naive s/sqrt(n) half-width assumes independent days;
    the batch-means half-width uses the variance of batch AVERAGES,
    which absorbs short-range autocorrelation — simulation output
    analysis' standard fix, and the actionable step after B146/B170
    DIAGNOSE dependence. The inefficiency factor (>1 under positive
    autocorrelation) is how much the naive CI lies.

    Exactness: batch sums and squares are 128-bit exact; only
    complete batches enter (exact index arithmetic); the two CIs
    are O(1) algebra.

    Scale shape: fact to the |days| frame, two rank windows, one
    batch aggregate, one reduction.
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
    w_all = Window.partitionBy()
    idx = daily.select(
        "v",
        F.floor(
            (F.row_number().over(Window.orderBy("d")) - 1) / BM_BATCH
        ).alias("bid"),
        F.count(F.lit(1)).over(w_all).alias("nd"),
    )
    complete = idx.where(
        F.col("bid") < F.floor(F.col("nd") / BM_BATCH)
    ).select("v", "bid")
    batches = complete.groupBy("bid").agg(
        F.sum(F.col("v").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("s"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v"))
        .cast("decimal(38,0)")
        .alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    red = batches.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s").cast("decimal(38,0)").alias("st"),
        F.sum("s2").cast("double").alias("s2d"),
        F.sum(
            (F.col("s").cast("double") / BM_BATCH)
            * (F.col("s").cast("double") / BM_BATCH)
        ).alias("sb2"),
    )
    m, n = F.col("m"), F.col("n")
    std = F.col("st").cast("double")
    mu = std / n
    sd_day = F.sqrt((F.col("s2d") - std * F.col("st") / n) / (n - 1.0))
    sd_batch = F.sqrt(
        (F.col("sb2") - (std / BM_BATCH) * (std / BM_BATCH) / m)
        / (m - 1.0)
    )
    return red.select(
        m.alias("n_batches"),
        n.alias("n_days"),
        round_eps(mu / 100.0, 4).alias("mean_daily"),
        round_eps(1.96 * sd_day / F.sqrt(n * 1.0) / 100.0, 4).alias(
            "naive_ci_half"
        ),
        round_eps(1.96 * sd_batch / F.sqrt(m * 1.0) / 100.0, 4).alias(
            "batch_means_ci_half"
        ),
        round_eps(
            (sd_batch / F.sqrt(m * 1.0)) / (sd_day / F.sqrt(n * 1.0)), 6
        ).alias("inefficiency_factor"),
    )


# ---------------------------------------------------------------- B206

PG_PERIODS = (7, 14, 30, 91)

_B206_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1
),
cen AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
         v - (SUM(v) OVER ()) * 1.0 / (COUNT(*) OVER ()) AS e,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
),
proj AS (
  {" UNION ALL ".join(
      f'''SELECT {p} AS period, n,
         SUM(e * cos(2 * pi() * t / {p})) AS cp,
         SUM(e * sin(2 * pi() * t / {p})) AS sp,
         SUM(e * e) AS see
  FROM cen GROUP BY n''' for p in PG_PERIODS)}
),
powr AS (
  SELECT period, n,
         2.0 * (cp * cp + sp * sp) / (n * see) AS share
  FROM proj
)
SELECT CAST(period AS BIGINT) AS period_days,
       {sql_round('share * 100.0', 4)} AS variance_share_pct,
       CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY share DESC, period) = 1
                 THEN 1 ELSE 0 END AS BIGINT) AS is_dominant
FROM powr ORDER BY period_days
"""


@register("periodogram_peaks", oracle=_B206_ORACLE)
def periodogram_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-frequency periodogram of daily revenue at candidate
    periods {PG_PERIODS} days: the variance share captured by each
    frequency's cos/sin projection (normalised so a pure sinusoid
    scores 1) — the SPECTRAL seasonality detector that localises in
    frequency where B93's correlogram smears across lags, with the
    dominant period flagged. Four Goertzel-style projections, no
    FFT machinery.

    Scale shape: fact to |days|, mean-centering by window, one
    projection aggregate per period over the bounded frame (union),
    a rank over |periods| rows. Transcendental calls are identical
    expressions both engines; their sub-ulp library differences
    vanish at the reported rounding.
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
    w_all = Window.partitionBy()
    cen = daily.select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("t"),
        (
            F.col("v")
            - F.sum("v").over(w_all) * 1.0 / F.count(F.lit(1)).over(w_all)
        ).alias("e"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    cen = cen.persist()
    projs = []
    for p in PG_PERIODS:
        ang = 2 * math.pi * F.col("t") / p
        projs.append(
            cen.groupBy("n").agg(
                F.lit(p).alias("period"),
                F.sum(F.col("e") * F.cos(ang)).alias("cp"),
                F.sum(F.col("e") * F.sin(ang)).alias("sp"),
                F.sum(F.col("e") * F.col("e")).alias("see"),
            )
        )
    proj = projs[0]
    for fr in projs[1:]:
        proj = proj.unionAll(fr)
    share = (
        2.0
        * (F.col("cp") * F.col("cp") + F.col("sp") * F.col("sp"))
        / (F.col("n") * F.col("see"))
    )
    powr = proj.select("period", share.alias("share"))
    return powr.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("share").desc(), F.col("period"))
        ),
    ).select(
        F.col("period").cast("bigint").alias("period_days"),
        round_eps(F.col("share") * 100.0, 4).alias("variance_share_pct"),
        F.when(F.col("rk") == 1, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_dominant"),
    ).orderBy("period_days")


# ---------------------------------------------------------------- C189

_C189_ORACLE = f"""
WITH ranked AS (
  SELECT embedding, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn,
         COUNT(*) OVER () AS n
  FROM embeddings
),
pairs AS (
  SELECT a.rn AS i,
         {sql_cosine('a.embedding', 'b.embedding')} AS cos
  FROM ranked a JOIN ranked b ON b.rn = a.rn + a.n // 2
),
stats AS (
  SELECT cos, ROW_NUMBER() OVER (ORDER BY cos DESC, i) AS rk,
         COUNT(*) OVER () AS np
  FROM pairs
)
SELECT CAST(MAX(np) AS BIGINT) AS n_pairs,
       {sql_round('AVG(cos)', 6)} AS mean_cosine,
       {sql_round(
           'MAX(CASE WHEN rk = CAST(FLOOR(0.05 * np) + 1 AS BIGINT)'
           ' THEN cos END)', 6)} AS p95_cosine,
       {sql_round('MAX(cos)', 6)} AS max_cosine
FROM stats
"""


@register("background_cosine_null", oracle=_C189_ORACLE)
def background_cosine_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Background-similarity null for the EMBEDDING space: cosine
    over maximally-separated deterministic pairs (rank i with
    i + n/2 — C167's pairing applied to vectors), reporting mean,
    p95 and max. This is the calibration floor under every
    semantic-similarity threshold here (A13/C10's cosine cut,
    C25's semdedup epsilon, C121's transfer): anisotropic encoders
    push ALL cosines up (C109/C164's diagnosis), and a threshold
    below this null's tail calls unrelated documents duplicates.

    Scale shape: one rank-key equi-join of the ranked frame (no
    sampling RNG), exact order-statistic tail over |pairs| rows.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        norm(F.col("embedding")).alias("nrm"),
    )
    w_all = Window.partitionBy()
    ranked = emb.select(
        "e",
        "nrm",
        F.row_number().over(Window.orderBy("vec_id")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    ranked = ranked.persist()
    a = ranked.select(
        F.col("rn").alias("i"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
        (F.col("rn") + F.floor(F.col("n") / 2)).cast("int").alias("mrn"),
    )
    b = ranked.select(
        F.col("rn").alias("mrn"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, "mrn").select(
        "i",
        (dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias(
            "cos"
        ),
    )
    stats = pairs.select(
        "cos",
        F.row_number()
        .over(Window.orderBy(F.col("cos").desc(), F.col("i")))
        .alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("np"),
    )
    return stats.agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        round_eps(F.avg("cos"), 6).alias("mean_cosine"),
        round_eps(
            F.max(
                F.when(
                    F.col("rk")
                    == (F.floor(0.05 * F.col("np")) + 1).cast("bigint"),
                    F.col("cos"),
                )
            ),
            6,
        ).alias("p95_cosine"),
        round_eps(F.max("cos"), 6).alias("max_cosine"),
    )
