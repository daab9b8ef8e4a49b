"""Ninety-ninth sweep (SURVEY.md §2 B184-B185, C174).

The G-test (likelihood-ratio independence test — what Pearson's chi2
(B55) approximates to second order, and the additive one across
nested margins), the turning-point randomness test (local
oscillation — the complement of B145's runs test, which sees level
shifts but not jitter), and the exemplar-quality bias audit (does
C16's keep-min-id dedup policy systematically keep the WORSE copy —
the policy bug quality-aware dedup exists to fix).
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
from ..operators.dedup import connected_components
from ..sources import load_table
from . import register
from .text_plans import _C5_ORACLE, dedup_minhash_lsh

# ---------------------------------------------------------------- B184

_B184_ORACLE = f"""
WITH cells AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2
),
marg AS (
  SELECT a, b, o,
         CAST(SUM(o) OVER (PARTITION BY a) AS BIGINT) AS rm,
         CAST(SUM(o) OVER (PARTITION BY b) AS BIGINT) AS cm,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM cells
),
red AS (
  SELECT CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS c,
         MAX(n) AS n,
         2.0 * SUM(o * ln(o * 1.0 * n / (rm * 1.0 * cm))) AS g,
         SUM((o - rm * 1.0 * cm / n) * (o - rm * 1.0 * cm / n)
             / (rm * 1.0 * cm / n)) AS chi2
  FROM marg
)
SELECT r AS card_a, c AS card_b,
       CAST((r - 1) * (c - 1) AS BIGINT) AS df,
       {sql_round('g', 6)} AS g_stat,
       {sql_round('chi2', 6)} AS pearson_chi2,
       {sql_round('g - chi2', 6)} AS g_minus_chi2
FROM red
"""


@register("g_test_independence", oracle=_B184_ORACLE)
def g_test_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio) of independence on the priority x
    status table, reported beside Pearson's chi2 on the SAME cells:
    G = 2 sum o ln(o n / (r c)) is what chi2 approximates to second
    order, is additive across nested partitions (so sub-table G's
    sum to the full-table G — the property drill-down analyses
    exploit), and diverges from chi2 exactly where expected counts
    get small. The difference column makes the approximation error
    visible.

    Exactness: observed counts and marginals are exact BIGINTs
    (marginals as windows over the bounded cell frame, B169's
    shape); both statistics are one double reduction with identical
    IEEE shapes.
    """
    cells = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("a"),
            F.col("o_orderstatus").alias("b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    w_a = Window.partitionBy("a")
    w_b = Window.partitionBy("b")
    w_all = Window.partitionBy()
    marg = cells.select(
        "a",
        "b",
        "o",
        F.sum("o").over(w_a).cast("bigint").alias("rm"),
        F.sum("o").over(w_b).cast("bigint").alias("cm"),
        F.sum("o").over(w_all).cast("bigint").alias("n"),
    )
    e = F.col("rm") * 1.0 * F.col("cm") / F.col("n")
    red = marg.agg(
        F.countDistinct("a").cast("bigint").alias("r"),
        F.countDistinct("b").cast("bigint").alias("c"),
        F.max("n").cast("bigint").alias("n"),
        (
            2.0
            * F.sum(
                F.col("o")
                * F.log(
                    F.col("o") * 1.0 * F.col("n")
                    / (F.col("rm") * 1.0 * F.col("cm"))
                )
            )
        ).alias("g"),
        F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"),
    )
    return red.select(
        F.col("r").alias("card_a"),
        F.col("c").alias("card_b"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("df"),
        round_eps(F.col("g"), 6).alias("g_stat"),
        round_eps(F.col("chi2"), 6).alias("pearson_chi2"),
        round_eps(F.col("g") - F.col("chi2"), 6).alias("g_minus_chi2"),
    )


# ---------------------------------------------------------------- B185

_B185_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7 AS BIGINT)
           AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
tri AS (
  SELECT y,
         LAG(y) OVER (ORDER BY w) AS yp,
         LEAD(y) OVER (ORDER BY w) AS yn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM weekly
),
red AS (
  SELECT MAX(n) AS n,
         CAST(SUM(CASE WHEN yp IS NOT NULL AND yn IS NOT NULL
                        AND ((y > yp AND y > yn) OR (y < yp AND y < yn))
                       THEN 1 ELSE 0 END) AS BIGINT) AS t
  FROM tri
)
SELECT n AS n_weeks, t AS turning_points,
       {sql_round('2.0 * (n - 2) / 3.0', 4)} AS expected_tp,
       {sql_round(
           '(t - 2.0 * (n - 2) / 3.0)'
           ' / sqrt((16.0 * n - 29.0) / 90.0)', 6)} AS z_stat
FROM red
"""


@register("turning_point_test", oracle=_B185_ORACLE)
def turning_point_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point randomness test on the weekly order series:
    count strict local maxima/minima and compare to the null
    E[T] = 2(n-2)/3, Var = (16n-29)/90 — too FEW turning points
    means smooth trend/persistence, too MANY means negative
    autocorrelation (over-correction). The local-oscillation
    complement of B145's runs test (which sees level shifts but not
    jitter) and B170's omnibus Q.

    Exactness: the turning-point count is an exact conditional sum
    over lag/lead windows on the bounded |weeks| frame; the moments
    are O(1) algebra.
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
    w_t = Window.orderBy("w")
    w_all = Window.partitionBy()
    tri = weekly.select(
        "y",
        F.lag("y").over(w_t).alias("yp"),
        F.lead("y").over(w_t).alias("yn"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    is_tp = (
        F.col("yp").isNotNull()
        & F.col("yn").isNotNull()
        & (
            ((F.col("y") > F.col("yp")) & (F.col("y") > F.col("yn")))
            | ((F.col("y") < F.col("yp")) & (F.col("y") < F.col("yn")))
        )
    )
    red = tri.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.when(is_tp, 1).otherwise(0)).cast("bigint").alias("t"),
    )
    n, t = F.col("n"), F.col("t")
    e_tp = 2.0 * (n - 2) / 3.0
    return red.select(
        n.alias("n_weeks"),
        t.alias("turning_points"),
        round_eps(e_tp, 4).alias("expected_tp"),
        round_eps(
            (t - e_tp) / F.sqrt((16.0 * n - 29.0) / 90.0), 6
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------- C174

PUNCT_CLASS_C174 = r"[.,;:!?]"

_C174_ORACLE = f"""
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
q AS (
  SELECT doc_id,
         ROUND(0.4 * ({sql_stopword_hits(sql_tokens('text'))} * 1.0
                      / len({sql_tokens('text')}))
               + 0.3 * least((list_sum(list_transform(
                     {sql_tokens('text')}, s -> length(s))) * 1.0
                     / len({sql_tokens('text')})) / 10.0, 1.0)
               + 0.3 * (1.0 - len(regexp_extract_all(text,
                     '{PUNCT_CLASS_C174}')) * 1.0 / length(text))
               + 1e-9, 4) AS q4
  FROM documents
),
clusters AS (
  SELECT comp.cid,
         CAST(COUNT(*) AS BIGINT) AS sz,
         MIN_BY(q.q4, comp.doc_id) AS q_kept,
         MAX(q.q4) AS q_best
  FROM comp JOIN q USING (doc_id)
  GROUP BY comp.cid
  HAVING COUNT(*) >= 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_dup_clusters,
       CAST(SUM(CASE WHEN q_kept < q_best THEN 1 ELSE 0 END) AS BIGINT)
         AS n_suboptimal,
       {sql_round(
           'SUM(CASE WHEN q_kept < q_best THEN 1 ELSE 0 END) * 100.0'
           ' / COUNT(*)', 4)} AS pct_suboptimal,
       {sql_round('AVG(q_best - q_kept)', 6)} AS mean_quality_gap
FROM clusters
"""


@register("exemplar_quality_bias", oracle=_C174_ORACLE)
def exemplar_quality_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exemplar-quality bias of the keep-min-id dedup policy: within
    each C5 -> connected-components duplicate cluster, compare the
    quality score (C2's formula, 4-dp rounded so both engines
    compare the same grid) of the doc the keep-MIN-doc_id rule
    (C16 / golden_record's convention) retains against the cluster's
    BEST score. A high suboptimal share is the case for
    quality-aware exemplar selection — dedup that deletes the good
    copy is worse than no dedup.

    Scale shape: C5's pairs feed the iterative CC; the score is a
    map-side expression; arg-min/max run at cluster grain via
    min_by — no per-cluster sort.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
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
    q_raw = (
        0.4 * (stopword_hits(toks, STOPWORDS) * 1.0 / F.size(toks))
        + 0.3 * F.least(mean_word_len / 10.0, F.lit(1.0))
        + 0.3
        * (
            1.0
            - F.size(
                F.expr(
                    f"regexp_extract_all(text, '{PUNCT_CLASS_C174}', 0)"
                )
            )
            * 1.0
            / F.length(F.col("text"))
        )
    )
    q = docs.select(
        F.col("doc_id").alias("id"), F.round(q_raw + 1e-9, 4).alias("q4")
    )
    comp = connected_components(
        pairs.select(
            F.col("id_a").alias("first_id"), F.col("id_b").alias("second_id")
        ),
        q.select("id"),
        id_col="id",
    )
    clusters = (
        comp.join(q, "id")
        .groupBy("component_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sz"),
            F.expr("min_by(q4, id)").alias("q_kept"),
            F.max("q4").alias("q_best"),
        )
        .where(F.col("sz") >= 2)
    )
    sub = F.when(F.col("q_kept") < F.col("q_best"), 1).otherwise(0)
    return clusters.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_clusters"),
        F.sum(sub).cast("bigint").alias("n_suboptimal"),
        round_eps(F.sum(sub) * 100.0 / F.count(F.lit(1)), 4).alias(
            "pct_suboptimal"
        ),
        round_eps(F.avg(F.col("q_best") - F.col("q_kept")), 6).alias(
            "mean_quality_gap"
        ),
    )
