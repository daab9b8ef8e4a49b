"""Forty-eighth sweep (SURVEY.md §2 B97, C109-C110).

Seasonal-adjusted anomaly detection (B49's decomposition feeding
B39's z-flags — the incident detector that doesn't page on weekends),
RLHF preference-pair mining from quality-scored documents, and
per-source unigram KL divergence against the corpus (the dataset
drift statistic completing C92's per-doc importance weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import (
    STOPWORDS,
    sql_stopword_hits,
    sql_tokens,
    stopword_hits,
    tokens,
)
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B97

SA_TREND_HALF = 3  # centered 7-day moving average (B49's constant)
SA_Z = 2.0

_B97_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate::DATE AS day, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
trended AS (
  SELECT day, n_orders,
         AVG(n_orders * 1.0) OVER w AS trend,
         COUNT(*) OVER w AS wn
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN {SA_TREND_HALF} PRECEDING
               AND {SA_TREND_HALF} FOLLOWING)
),
interior AS (
  SELECT day, n_orders, trend, n_orders - trend AS detrended,
         isodow(day) AS wd
  FROM trended WHERE wn = {2 * SA_TREND_HALF + 1}
),
seasonal AS (
  SELECT wd, {sql_round('AVG(detrended)', 6)} AS seasonal
  FROM interior GROUP BY wd
),
resid AS (
  SELECT day, n_orders,
         CAST(ROUND((detrended - seasonal.seasonal) * 1e6) AS BIGINT) AS r6
  FROM interior JOIN seasonal USING (wd)
),
stats AS (
  SELECT AVG(r6) AS mu, STDDEV_SAMP(r6) AS sigma FROM resid
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_orders,
       {sql_round('r6 / 1e6', 6)} AS residual,
       {sql_round('(r6 - s.mu) / s.sigma', 6)} AS z,
       CASE WHEN abs((r6 - s.mu) / s.sigma) > {SA_Z} THEN 1 ELSE 0 END
         AS is_anomaly
FROM resid CROSS JOIN stats s
ORDER BY day
"""


@register("seasonal_anomaly_flags", oracle=_B97_ORACLE)
def seasonal_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly flags: B49's classical
    decomposition produces residuals, B39's z-rule flags |z| > {SA_Z}
    on THOSE — the incident detector that doesn't fire every weekend
    (a raw-count z-score pages on every Saturday dip; the residual
    z only on deviations from the weekly pattern).

    Scale shape: corpus → |days| rows in one aggregate; trend/seasonal
    windows, residual quantisation and the z-stats all run on the
    dimension-scale frame. Residuals are quantised to integer
    micro-units BEFORE mean/std, so both engines reduce exact integers
    in any order and z is arithmetic on identical values.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.orderBy("day").rowsBetween(-SA_TREND_HALF, SA_TREND_HALF)
    interior = (
        daily.withColumn("trend", F.avg(F.col("n_orders") * 1.0).over(w))
        .withColumn("wn", F.count(F.lit(1)).over(w))
        .where(F.col("wn") == 2 * SA_TREND_HALF + 1)
        .withColumn("detrended", F.col("n_orders") - F.col("trend"))
        .withColumn("wd", F.weekday("day") + 1)
    )
    seasonal = round_eps(F.avg("detrended").over(Window.partitionBy("wd")), 6)
    resid = interior.withColumn("seasonal", seasonal).select(
        "day",
        "n_orders",
        F.round((F.col("detrended") - F.col("seasonal")) * 1e6)
        .cast("bigint")
        .alias("r6"),
    )
    stats = resid.agg(
        F.avg("r6").alias("mu"), F.stddev_samp("r6").alias("sigma")
    )
    z = (F.col("r6") - F.col("mu")) / F.col("sigma")
    return (
        resid.transform(scalars(stats))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_orders",
            round_eps(F.col("r6") / 1e6, 6).alias("residual"),
            round_eps(z, 6).alias("z"),
            F.when(F.abs(z) > SA_Z, 1).otherwise(0).alias("is_anomaly"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------- C109

PREF_MARGIN = 0.05  # minimum quality gap between chosen and rejected


_C109_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {sql_stopword_hits(f"list_filter({sql_tokens('text')}, t -> t <> '')")}
           * 1.0 /
         greatest(len(list_filter({sql_tokens('text')}, t -> t <> '')), 1)
           AS q
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, q,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS rt,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q ASC, doc_id DESC)
           AS rb,
         COUNT(*) OVER (PARTITION BY lang) AS nl
  FROM scored
),
pairs AS (
  SELECT t.lang, t.rt AS pair_rank,
         t.doc_id AS chosen, b.doc_id AS rejected,
         t.q AS q_chosen, b.q AS q_rejected
  FROM ranked t JOIN ranked b
    ON t.lang = b.lang AND t.rt = b.rb AND t.rt <= t.nl / 2
)
SELECT lang, CAST(pair_rank AS BIGINT) AS pair_rank, chosen, rejected,
       {sql_round('q_chosen', 6)} AS q_chosen,
       {sql_round('q_rejected', 6)} AS q_rejected,
       {sql_round('q_chosen - q_rejected', 6)} AS margin
FROM pairs
WHERE q_chosen - q_rejected >= {PREF_MARGIN}
ORDER BY lang, pair_rank
"""


@register("preference_pair_mining", oracle=_C109_ORACLE)
def preference_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLHF/DPO preference-pair construction from a scored corpus:
    within each language, rank docs by a quality signal (stopword
    density — the C2 family's naturalness proxy), pair the i-th best
    with the i-th worst (top half only, so no doc is chosen AND
    rejected), and keep pairs whose quality margin ≥ {PREF_MARGIN} —
    the deterministic, reshard-stable batch shape of reward-model /
    DPO data prep (chosen-vs-rejected with a margin floor).

    Scale shape: scoring is pure per-row array math (zero shuffles);
    the two rankings are windows on the SAME language partitioning
    (one shuffle); the pair join is (lang, rank)-keyed — equi, never
    quadratic. Quality is one integer÷integer division, so both
    engines rank identical doubles.
    """
    toks = F.filter(tokens(F.col("text")), lambda t: t != "")
    scored = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (
            stopword_hits(toks, STOPWORDS)
            * 1.0
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("q"),
    )
    w_top = Window.partitionBy("lang").orderBy(F.desc("q"), F.asc("doc_id"))
    w_bot = Window.partitionBy("lang").orderBy(F.asc("q"), F.desc("doc_id"))
    ranked = scored.select(
        "doc_id",
        "lang",
        "q",
        F.row_number().over(w_top).alias("rt"),
        F.row_number().over(w_bot).alias("rb"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("nl"),
    )
    top = ranked.select("lang", "rt", "doc_id", "q", "nl")
    bot = ranked.select(
        "lang",
        F.col("rb").alias("rt"),
        F.col("doc_id").alias("rejected"),
        F.col("q").alias("q_rejected"),
    )
    pairs = top.join(bot, ["lang", "rt"]).where(
        F.col("rt") <= F.col("nl") / 2
    )
    margin = F.col("q") - F.col("q_rejected")
    return (
        pairs.where(margin >= PREF_MARGIN)
        .select(
            "lang",
            F.col("rt").cast("bigint").alias("pair_rank"),
            F.col("doc_id").alias("chosen"),
            "rejected",
            round_eps(F.col("q"), 6).alias("q_chosen"),
            round_eps(F.col("q_rejected"), 6).alias("q_rejected"),
            round_eps(margin, 6).alias("margin"),
        )
        .orderBy("lang", "pair_rank")
    )


# ---------------------------------------------------------------- C110

_C110_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({sql_tokens('text')}) AS t FROM documents
),
tt AS (SELECT source, t FROM tok WHERE t <> ''),
st AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c_st
  FROM tt GROUP BY 1, 2
),
tot AS (
  SELECT t, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY t
),
gl AS (
  SELECT CAST(SUM(c_t) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM tot
),
src_tot AS (
  SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM st GROUP BY source
),
terms AS (
  SELECT st.source,
         CAST(ROUND(
           (st.c_st * 1.0 / src_tot.n_s)
           * ln((st.c_st * 1.0 / src_tot.n_s)
                / ((tot.c_t + 1.0) / (gl.n + gl.v))) * 1e9
         ) AS BIGINT) AS kl9
  FROM st
  JOIN tot USING (t)
  JOIN src_tot USING (source)
  CROSS JOIN gl
)
SELECT terms.source,
       (SELECT n_s FROM src_tot WHERE src_tot.source = terms.source)
         AS n_tokens,
       {sql_round('SUM(kl9) / 1e9', 6)} AS kl_nats
FROM terms GROUP BY terms.source ORDER BY terms.source
"""


@register("source_kl_divergence", oracle=_C110_ORACLE)
def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence KL(source ‖ corpus) with an
    add-one-smoothed corpus model — the dataset drift/redundancy
    statistic at SOURCE grain (C92 scores docs, C42 measures pairwise
    overlap; this says how far each source's token distribution sits
    from the mixture it feeds). Source MLE is unsmoothed, so terms
    exist only where c_st > 0 — KL is finite by construction.

    Scale shape: the token stream collapses ONCE to (source, token)
    grain (the only corpus-volume shuffle); token totals, source
    totals and the vocab scalar are aggregates OF that table; per-term
    contributions quantise to integer nano-units so each source's sum
    is exact in any reduction order.
    """
    tt = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("t"))
        .where(F.col("t") != "")
    )
    st = tt.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c_st"))
    st = st.persist()
    tot = st.groupBy("t").agg(F.sum("c_st").alias("c_t"))
    gl = tot.agg(
        F.sum("c_t").alias("n"), F.count(F.lit(1)).alias("v")
    )
    src_tot = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    q = F.col("c_st") * 1.0 / F.col("n_s")
    p = (F.col("c_t") + 1.0) / (F.col("n") + F.col("v"))
    kl9 = F.round(q * F.log(q / p) * 1e9).cast("bigint")
    terms = (
        st.join(tot, "t")
        .join(F.broadcast(src_tot), "source")
        .transform(scalars(gl))
        .select("source", "n_s", kl9.alias("kl9"))
    )
    return (
        terms.groupBy("source")
        .agg(
            F.first("n_s").alias("n_tokens"),
            round_eps(F.sum("kl9") / 1e9, 6).alias("kl_nats"),
        )
        .orderBy("source")
    )
