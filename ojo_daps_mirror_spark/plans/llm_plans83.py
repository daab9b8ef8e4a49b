"""Eighty-third sweep (SURVEY.md §2 B152-B153, C158).

Mann-Kendall trend test (the nonparametric IS-there-a-trend test
that standardly pairs with B92's Theil-Sen slope — sign-based, so
outliers can't fake or hide a trend), the Laspeyres/Paasche/Fisher
price-index family (the economics of "did prices rise or did the
basket shift" — the index-number problem every revenue time series
hides), and the hapax legomena profile (the share of a source's
vocabulary seen exactly once — the lexical-richness number that
drives vocabulary sizing beyond C107's Heaps exponent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B152

_B152_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7 AS BIGINT)
           AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM weekly a JOIN weekly b ON a.w < b.w
),
ties AS (
  SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM weekly GROUP BY y)
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM weekly),
stats AS (
  SELECT n, s, tie_term,
         (n * (n - 1.0) * (2 * n + 5) - tie_term) / 18.0 AS var_s
  FROM pairs CROSS JOIN ties CROSS JOIN nn
)
SELECT n AS n_weeks, s AS s_stat,
       {sql_round('var_s', 4)} AS var_s,
       {sql_round(
           'CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)'
           '     WHEN s < 0 THEN (s + 1) / sqrt(var_s)'
           '     ELSE 0.0 END', 6)} AS z_stat
FROM stats
"""


@register("mann_kendall_trend", oracle=_B152_ORACLE)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on the weekly order-volume series:
    S = sum over time-ordered pairs of sign(y_j - y_i), with the
    standard tie-corrected variance and continuity-corrected Z —
    the distribution-free trend TEST that pairs with B92's Theil-Sen
    slope ESTIMATE (same pair space, sign instead of slope), immune
    to the outliers that drag B57's OLS.

    Exactness: S and the tie term are exact BIGINTs (sign sums over
    the |weeks|^2/2 pair space — dimension-scale, corpus-size
    independent); variance and Z are O(1) algebra.

    Scale shape: fact collapses to |weeks| rows once; the pair
    expansion is a banded self-join of that bounded frame (same
    declared shape as B93's correlogram / B97's Hodges-Lehmann);
    everything downstream is single-row.
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
    weekly = weekly.persist()
    a = weekly.select(F.col("w").alias("wa"), F.col("y").alias("ya"))
    b = weekly.select(F.col("w").alias("wb"), F.col("y").alias("yb"))
    pairs = (
        a.join(F.broadcast(b), F.col("wa") < F.col("wb"))
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    ties = (
        weekly.groupBy("y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("bigint")
            .alias("tie_term")
        )
    )
    nn = weekly.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    stats = pairs.transform(scalars(ties)).transform(scalars(nn))
    n, s = F.col("n"), F.col("s")
    var_s = (n * (n - 1.0) * (2 * n + 5) - F.col("tie_term")) / 18.0
    z = (
        F.when(s > 0, (s - 1) / F.sqrt(var_s))
        .when(s < 0, (s + 1) / F.sqrt(var_s))
        .otherwise(0.0)
    )
    return stats.select(
        n.alias("n_weeks"),
        s.alias("s_stat"),
        round_eps(var_s, 4).alias("var_s"),
        round_eps(z, 6).alias("z_stat"),
    )


# ---------------------------------------------------------------- B153

PI_BASE_YEAR = 1995

_B153_ORACLE = f"""
WITH py AS (
  SELECT l_partkey AS p, CAST(year(l_shipdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS r
  FROM lineitem GROUP BY 1, 2
),
base AS (
  SELECT p, q AS q0, r * 1.0 / q AS p0
  FROM py WHERE yr = {PI_BASE_YEAR}
),
joined AS (
  SELECT py.yr, py.q AS qt, py.r * 1.0 / py.q AS pt, b.q0, b.p0
  FROM py JOIN base b USING (p)
),
sums AS (
  SELECT yr,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(pt * q0) AS l_num, SUM(p0 * q0) AS l_den,
         SUM(pt * qt) AS p_num, SUM(p0 * qt) AS p_den
  FROM joined GROUP BY yr
)
SELECT yr AS year, n_parts,
       {sql_round('l_num / l_den', 6)} AS laspeyres,
       {sql_round('p_num / p_den', 6)} AS paasche,
       {sql_round('sqrt((l_num / l_den) * (p_num / p_den))', 6)} AS fisher
FROM sums ORDER BY yr
"""


@register("fisher_price_index", oracle=_B153_ORACLE)
def fisher_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices by ship year
    against the {PI_BASE_YEAR} base basket: Laspeyres prices the OLD
    basket at new prices (overstates inflation), Paasche the NEW
    basket (understates), Fisher is their geometric mean — the
    index-number decomposition that says whether revenue growth
    (B83) is price or basket-mix. Matched basket: only parts traded
    in both the year and the base enter (the standard treatment).

    Exactness: per-(part, year) quantity and revenue are exact
    BIGINTs; unit prices are one double division each; the per-year
    basket sums run over the bounded |parts| frame with identical
    expression shapes both engines.

    Scale shape: one fact aggregate to (part, year) grain; the base
    frame is a filter of it joined back on the part key (bounded by
    |parts|); the index arithmetic is |years|-row.
    """
    py = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("p"),
            F.year(F.col("l_shipdate")).cast("bigint").alias("yr"),
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
    py = py.persist()
    base = py.where(F.col("yr") == PI_BASE_YEAR).select(
        "p",
        F.col("q").alias("q0"),
        (F.col("r") * 1.0 / F.col("q")).alias("p0"),
    )
    joined = py.select(
        "p",
        "yr",
        F.col("q").alias("qt"),
        (F.col("r") * 1.0 / F.col("q")).alias("pt"),
    ).join(F.broadcast(base), "p")
    sums = joined.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.col("pt") * F.col("q0")).alias("l_num"),
        F.sum(F.col("p0") * F.col("q0")).alias("l_den"),
        F.sum(F.col("pt") * F.col("qt")).alias("p_num"),
        F.sum(F.col("p0") * F.col("qt")).alias("p_den"),
    )
    lasp = F.col("l_num") / F.col("l_den")
    paas = F.col("p_num") / F.col("p_den")
    return sums.select(
        F.col("yr").alias("year"),
        "n_parts",
        round_eps(lasp, 6).alias("laspeyres"),
        round_eps(paas, 6).alias("paasche"),
        round_eps(F.sqrt(lasp * paas), 6).alias("fisher"),
    ).orderBy("year")


# ---------------------------------------------------------------- C158

_C158_ORACLE = f"""
WITH tf AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) GROUP BY source, tok
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
       {sql_round(
           'SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)', 6)}
         AS hapax_share_vocab,
       {sql_round(
           'SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / SUM(c)', 6)}
         AS hapax_share_tokens
FROM tf GROUP BY source ORDER BY source
"""


@register("hapax_profile", oracle=_C158_ORACLE)
def hapax_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena profile per source: the share of vocabulary
    (and of token mass) carried by words seen exactly once, plus dis
    legomena (seen twice) — Zipf's-law's raggedy tail measured
    directly. High hapax share means vocabulary still growing (ties
    to C107's Heaps exponent) and predicts C144's OOV pain; a hapax
    share near zero on a "natural" source is itself a template/
    synthetic-text smell for C132.

    Scale shape: one explode to token grain, one (source, token)
    aggregate (the same shuffle C30's frequency table already pays),
    then a |sources|-row reduction. No second pass over the corpus.
    """
    tf = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    one = F.when(F.col("c") == 1, 1).otherwise(0)
    two = F.when(F.col("c") == 2, 1).otherwise(0)
    return (
        tf.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(one).cast("bigint").alias("n_hapax"),
            F.sum(two).cast("bigint").alias("n_dis"),
            round_eps(F.sum(one) * 1.0 / F.count(F.lit(1)), 6).alias(
                "hapax_share_vocab"
            ),
            round_eps(F.sum(one) * 1.0 / F.sum("c"), 6).alias(
                "hapax_share_tokens"
            ),
        )
        .orderBy("source")
    )
