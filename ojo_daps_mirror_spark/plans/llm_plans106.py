"""Hundred-sixth sweep (SURVEY.md §2 B197, C182-C183).

Competing-risks cumulative incidence (Aalen-Johansen: returned vs
kept as competing outcomes with real right-censoring at a valuation
date — the question B72's single-event Kaplan-Meier CANNOT answer,
because 1 - KM overestimates each cause when causes compete), the
Hill diversity profile (vocabulary richness at q = 0/1/2 in ONE
family — C158's vocab count, C161's entropy and Simpson
concentration are all points on this curve), and quality-by-length
deciles (the stratified evidence C171's confound audit demanded
before any score-gated filtering claim).
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
from ..operators.attach import attach_scalars
from ..operators.rank import global_order_stats, ntile_from_rank
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B197

CIF_COHORT_YEAR = 1997
CIF_VAL = "1997-12-31"

_B197_ORACLE = f"""
WITH lines AS (
  SELECT datediff('day', o.o_orderdate,
                  LEAST(l.l_shipdate, DATE '{CIF_VAL}')) AS t,
         CASE WHEN l.l_shipdate > DATE '{CIF_VAL}' THEN 'cens'
              WHEN l.l_returnflag = 'R' THEN 'ret'
              ELSE 'kept' END AS outcome
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE year(o.o_orderdate) = {CIF_COHORT_YEAR}
),
daily AS (
  SELECT t,
         CAST(SUM(CASE WHEN outcome = 'ret' THEN 1 ELSE 0 END)
              AS BIGINT) AS d1,
         CAST(SUM(CASE WHEN outcome = 'kept' THEN 1 ELSE 0 END)
              AS BIGINT) AS d2,
         CAST(SUM(CASE WHEN outcome = 'cens' THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM lines GROUP BY t
),
risk AS (
  SELECT t, d1, d2,
         CAST(SUM(d1 + d2 + c) OVER () AS BIGINT)
           - CAST(COALESCE(SUM(d1 + d2 + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS n_risk
  FROM daily
),
km AS (
  SELECT t, d1, d2, n_risk,
         exp(COALESCE(SUM(ln(1.0 - (d1 + d2) * 1.0 / n_risk))
             OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0.0)) AS s_minus
  FROM risk WHERE n_risk > 0
),
cif AS (
  SELECT t, n_risk, s_minus,
         SUM(s_minus * d1 * 1.0 / n_risk) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cif1,
         SUM(s_minus * d2 * 1.0 / n_risk) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cif2
  FROM km WHERE d1 + d2 > 0
)
SELECT CAST(t AS BIGINT) AS day,
       n_risk,
       {sql_round('s_minus', 6)} AS surv_before,
       {sql_round('cif1', 6)} AS cif_returned,
       {sql_round('cif2', 6)} AS cif_kept
FROM cif ORDER BY day
"""


@register("competing_risks_cif", oracle=_B197_ORACLE)
def competing_risks_cif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence for COMPETING outcomes on
    the {CIF_COHORT_YEAR} line cohort valued at {CIF_VAL}: each line
    either ships-and-returns, ships-and-keeps, or is right-censored
    still unshipped; CIF_k(t) = sum of S(t-) d_k/n over event days —
    the decomposition B72's single-event Kaplan-Meier CANNOT give
    (1 - KM per cause overestimates both when causes compete, the
    classic competing-risks fallacy), with the overall survival
    carried as exp of an exclusive-window log-sum exactly like
    B179's factor products.

    Exactness: event/censor counts are exact BIGINTs at day grain;
    at-risk counts derive from exclusive cumulative windows; the KM
    products and CIF sums are identical IEEE shapes over the bounded
    |days| frame.

    Scale shape: one fact-fact key join collapses to day grain;
    everything after is windows over <=365 rows.
    """
    val = F.lit(CIF_VAL).cast("date")
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_shipdate").alias("ship"),
            F.col("l_returnflag").alias("rf"),
        )
        .join(
            load_table(spark, sf_dir, "orders")
            .where(F.year("o_orderdate") == CIF_COHORT_YEAR)
            .select(
                F.col("o_orderkey").alias("ok"),
                F.col("o_orderdate").alias("od"),
            ),
            "ok",
        )
        .select(
            F.datediff(F.least(F.col("ship"), val), F.col("od")).alias("t"),
            F.when(F.col("ship") > val, "cens")
            .when(F.col("rf") == "R", "ret")
            .otherwise("kept")
            .alias("outcome"),
        )
    )
    daily = lines.groupBy("t").agg(
        F.sum(F.when(F.col("outcome") == "ret", 1).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when(F.col("outcome") == "kept", 1).otherwise(0))
        .cast("bigint")
        .alias("d2"),
        F.sum(F.when(F.col("outcome") == "cens", 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    w_all = Window.partitionBy()
    w_excl = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_incl = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = F.col("d1") + F.col("d2") + F.col("c")
    risk = daily.select(
        "t",
        "d1",
        "d2",
        (
            F.sum(tot).over(w_all).cast("bigint")
            - F.coalesce(F.sum(tot).over(w_excl), F.lit(0)).cast("bigint")
        ).alias("n_risk"),
    ).where(F.col("n_risk") > 0)
    km = risk.select(
        "t",
        "d1",
        "d2",
        "n_risk",
        F.exp(
            F.coalesce(
                F.sum(
                    F.log(
                        1.0
                        - (F.col("d1") + F.col("d2")) * 1.0 / F.col("n_risk")
                    )
                ).over(w_excl),
                F.lit(0.0),
            )
        ).alias("s_minus"),
    )
    cif = km.where(F.col("d1") + F.col("d2") > 0).select(
        "t",
        "n_risk",
        "s_minus",
        F.sum(F.col("s_minus") * F.col("d1") * 1.0 / F.col("n_risk"))
        .over(w_incl)
        .alias("cif1"),
        F.sum(F.col("s_minus") * F.col("d2") * 1.0 / F.col("n_risk"))
        .over(w_incl)
        .alias("cif2"),
    )
    return cif.select(
        F.col("t").cast("bigint").alias("day"),
        "n_risk",
        round_eps(F.col("s_minus"), 6).alias("surv_before"),
        round_eps(F.col("cif1"), 6).alias("cif_returned"),
        round_eps(F.col("cif2"), 6).alias("cif_kept"),
    ).orderBy("day")


# ---------------------------------------------------------------- C182

_C182_ORACLE = f"""
WITH tf AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) GROUP BY source, tok
),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM tf GROUP BY 1),
red AS (
  SELECT tf.source,
         CAST(COUNT(*) AS BIGINT) AS q0,
         exp(-SUM((c * 1.0 / t) * ln(c * 1.0 / t))) AS q1,
         1.0 / SUM((c * 1.0 / t) * (c * 1.0 / t)) AS q2,
         -SUM((c * 1.0 / t) * ln(c * 1.0 / t)) AS h
  FROM tf JOIN tot USING (source)
  GROUP BY tf.source
)
SELECT source, q0 AS vocab_q0,
       {sql_round('q1', 4)} AS hill_q1,
       {sql_round('q2', 4)} AS hill_q2,
       {sql_round('h / ln(q0 * 1.0)', 6)} AS pielou_evenness,
       {sql_round('q2 / q1', 6)} AS q2_q1_ratio
FROM red ORDER BY source
"""


@register("hill_diversity_profile", oracle=_C182_ORACLE)
def hill_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill diversity profile of each source's vocabulary: the
    effective word counts at q = 0 (raw vocab), q = 1 (exp entropy)
    and q = 2 (inverse Simpson), plus Pielou evenness H/ln(vocab) —
    ONE family unifying C158's vocab size, C161's entropy and
    Simpson concentration: q0 counts every word equally, q2 only the
    dominant ones, and the profile's steepness IS the head-heaviness
    C162's coverage curve plots. Ecology's diversity calculus
    applied to corpora.

    Scale shape: rides C30's (source, token) aggregate; all three
    Hill numbers come from ONE reduction at vocabulary grain.
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
    tot = tf.groupBy("source").agg(F.sum("c").cast("bigint").alias("t"))
    p = F.col("c") * 1.0 / F.col("t")
    red = (
        tf.join(tot, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("q0"),
            F.exp(-F.sum(p * F.log(p))).alias("q1"),
            (1.0 / F.sum(p * p)).alias("q2"),
            (-F.sum(p * F.log(p))).alias("h"),
        )
    )
    return red.select(
        "source",
        F.col("q0").alias("vocab_q0"),
        round_eps(F.col("q1"), 4).alias("hill_q1"),
        round_eps(F.col("q2"), 4).alias("hill_q2"),
        round_eps(F.col("h") / F.log(F.col("q0") * 1.0), 6).alias(
            "pielou_evenness"
        ),
        round_eps(F.col("q2") / F.col("q1"), 6).alias("q2_q1_ratio"),
    ).orderBy("source")


# ---------------------------------------------------------------- C183

PUNCT_CLASS_C183 = r"[.,;:!?]"

_C183_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
         len({sql_tokens('text')}) AS n_tokens,
         0.4 * ({sql_stopword_hits(sql_tokens('text'))} * 1.0
                / len({sql_tokens('text')}))
           + 0.3 * least((list_sum(list_transform(
                 {sql_tokens('text')}, s -> length(s))) * 1.0
                 / len({sql_tokens('text')})) / 10.0, 1.0)
           + 0.3 * (1.0 - len(regexp_extract_all(text,
                 '{PUNCT_CLASS_C183}')) * 1.0 / length(text)) AS q
  FROM documents
),
deciled AS (
  SELECT n_tokens, q,
         NTILE(10) OVER (ORDER BY n_tokens, doc_id) AS dec
  FROM m
)
SELECT CAST(dec AS BIGINT) AS length_decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       {sql_round('AVG(n_tokens * 1.0)', 4)} AS mean_tokens,
       {sql_round('AVG(q)', 6)} AS mean_quality,
       {sql_round('MIN(q)', 6)} AS min_quality,
       {sql_round('MAX(q)', 6)} AS max_quality
FROM deciled GROUP BY dec ORDER BY length_decile
"""


@register("quality_by_length_decile", oracle=_C183_ORACLE)
def quality_by_length_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2's quality score stratified by document-length decile —
    the evidence table C171's confound audit demands: if mean
    quality climbs monotonically with the decile, a score threshold
    IS a length threshold and any filtering claim needs this table
    attached. Deciles via NTILE over the deterministic
    (n_tokens, doc_id) order; the score formula is C2's verbatim.

    Scale shape: map-side score and length per doc, one global
    NTILE window over doc-grain rows, a 10-row aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    mean_word_len = (
        F.aggregate(
            F.transform(toks, lambda s: F.length(s)),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        * 1.0
        / F.size(toks)
    )
    q = (
        0.4 * (stopword_hits(toks, STOPWORDS) * 1.0 / F.size(toks))
        + 0.3 * F.least(mean_word_len / 10.0, F.lit(1.0))
        + 0.3
        * (
            1.0
            - F.size(
                F.expr(
                    f"regexp_extract_all(text, '{PUNCT_CLASS_C183}', 0)"
                )
            )
            * 1.0
            / F.length(F.col("text"))
        )
    )
    m = docs.select(
        "doc_id", F.size(toks).alias("n_tokens"), q.alias("q")
    )
    # Decile via the range-partitioned global rank + exact NTILE
    # closed form — no unpartitioned NTILE window over the doc-grain
    # frame (operators/rank.py).
    n_tot = m.agg(F.count(F.lit(1)).cast("bigint").alias("n_tot"))
    deciled = attach_scalars(
        global_order_stats(m, ["n_tokens", "doc_id"], rn_col="rn"), n_tot
    ).select(
        "n_tokens",
        "q",
        ntile_from_rank(F.col("rn"), F.col("n_tot"), 10).alias("dec"),
    )
    return (
        deciled.groupBy(F.col("dec").cast("bigint").alias("length_decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            round_eps(F.avg(F.col("n_tokens") * 1.0), 4).alias(
                "mean_tokens"
            ),
            round_eps(F.avg("q"), 6).alias("mean_quality"),
            round_eps(F.min("q"), 6).alias("min_quality"),
            round_eps(F.max("q"), 6).alias("max_quality"),
        )
        .orderBy("length_decile")
    )
