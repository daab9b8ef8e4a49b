"""Ninety-seventh sweep (SURVEY.md §2 B180-B181, C172).

The inspection-paradox audit (the length-biased mean interarrival a
randomly-arriving observer actually experiences vs the plain mean —
the renewal-theory gap, ratio = 1 + CV², proven in-row), empirical
upper-tail dependence between two segments' weekly revenues (do
their EXTREMES co-move even when B168's beta says the averages do),
and duplicate-cluster language purity (near-dup clusters mixing
languages are either translations or label noise — the cluster-level
upgrade of C151's exact-hash audit).
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

# ---------------------------------------------------------------- B180

_B180_ORACLE = f"""
WITH gaps AS (
  SELECT datediff('day',
                  LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS g
  FROM orders QUALIFY g IS NOT NULL
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(g) AS BIGINT) AS s1,
         CAST(SUM(CAST(g AS BIGINT) * g) AS BIGINT) AS s2
  FROM gaps
)
SELECT n AS n_gaps,
       {sql_round('s1 * 1.0 / n', 4)} AS mean_gap_days,
       {sql_round('s2 * 1.0 / s1', 4)} AS length_biased_mean,
       {sql_round('(s2 * 1.0 / s1) / (s1 * 1.0 / n)', 6)} AS paradox_ratio,
       {sql_round(
           '(s2 * 1.0 / n - (s1 * 1.0 / n) * (s1 * 1.0 / n))'
           ' / ((s1 * 1.0 / n) * (s1 * 1.0 / n))', 6)} AS cv_squared,
       {sql_round(
           '(s2 * 1.0 / s1) / (s1 * 1.0 / n) - 1.0'
           ' - (s2 * 1.0 / n - (s1 * 1.0 / n) * (s1 * 1.0 / n))'
           '   / ((s1 * 1.0 / n) * (s1 * 1.0 / n))', 6)}
         AS identity_residual
FROM red
"""


@register("inspection_paradox_audit", oracle=_B180_ORACLE)
def inspection_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inspection (waiting-time) paradox measured on customer
    order interarrivals: the plain mean gap vs the LENGTH-BIASED
    mean E[X^2]/E[X] — the gap a randomly-timed observer actually
    lands in — with the renewal identity ratio = 1 + CV^2 verified
    as an in-row residual (B132's closure discipline). This is why
    "average days between orders" understates the staleness a
    random audit sees, and the correction any sampling-by-time
    estimator (B130's HT designs) must apply.

    Exactness: gaps are exact integer days over a deterministic
    (date, orderkey) per-customer order; both moments are exact
    BIGINTs from one aggregate; three double divisions.

    Scale shape: one customer-partitioned lag window at fact grain,
    one reduction.
    """
    gaps = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
        )
        .select(
            F.datediff(
                F.col("o_orderdate"),
                F.lag("o_orderdate").over(
                    Window.partitionBy("o_custkey").orderBy(
                        "o_orderdate", "o_orderkey"
                    )
                ),
            ).alias("g")
        )
        .where(F.col("g").isNotNull())
    )
    red = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("s1"),
        F.sum(F.col("g").cast("bigint") * F.col("g"))
        .cast("bigint")
        .alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    mean = s1 * 1.0 / n
    lbm = s2 * 1.0 / s1
    cv2 = (s2 * 1.0 / n - mean * mean) / (mean * mean)
    return red.select(
        n.alias("n_gaps"),
        round_eps(mean, 4).alias("mean_gap_days"),
        round_eps(lbm, 4).alias("length_biased_mean"),
        round_eps(lbm / mean, 6).alias("paradox_ratio"),
        round_eps(cv2, 6).alias("cv_squared"),
        round_eps(lbm / mean - 1.0 - cv2, 6).alias("identity_residual"),
    )


# ---------------------------------------------------------------- B181

TD_SEG_A = "BUILDING"
TD_SEG_B = "MACHINERY"
TD_Q = 0.1  # tail fraction: top 10% weeks

_B181_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o.o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(SUM(CASE WHEN c.c_mktsegment = '{TD_SEG_A}'
                       THEN CAST(ROUND(o.o_totalprice * 100 + 1e-9)
                                 AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN c.c_mktsegment = '{TD_SEG_B}'
                       THEN CAST(ROUND(o.o_totalprice * 100 + 1e-9)
                                 AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
ranked AS (
  SELECT w, CAST(COUNT(*) OVER () AS BIGINT) AS n,
         ROW_NUMBER() OVER (ORDER BY x DESC, w) AS rx,
         ROW_NUMBER() OVER (ORDER BY y DESC, w) AS ry
  FROM weekly
),
red AS (
  SELECT MAX(n) AS n,
         CAST(FLOOR({TD_Q!r} * MAX(n)) AS BIGINT) AS k,
         CAST(SUM(CASE WHEN rx <= CAST(FLOOR({TD_Q!r} * n) AS BIGINT)
                        AND ry <= CAST(FLOOR({TD_Q!r} * n) AS BIGINT)
                       THEN 1 ELSE 0 END) AS BIGINT) AS joint
  FROM ranked
)
SELECT n AS n_weeks, k AS tail_k, joint AS n_joint,
       {sql_round('joint * 1.0 / k', 6)} AS lambda_upper,
       {sql_round('k * 1.0 / n', 6)} AS indep_expected,
       {sql_round('(joint * 1.0 / k) / (k * 1.0 / n)', 4)} AS tail_lift
FROM red
"""


@register("tail_dependence", oracle=_B181_ORACLE)
def tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical upper-tail dependence between the {TD_SEG_A} and
    {TD_SEG_B} segments' weekly revenues: of each series' top-10%
    weeks, how many coincide — lambda_U = P(Y extreme | X extreme),
    against the k/n expected under independence. Averages can
    co-move (B168's beta) while extremes don't, and vice versa;
    tail dependence is what stress scenarios (B164's CVaR) actually
    need, and the copula-level fact a correlation matrix (B45)
    cannot represent.

    Exactness: ranks are deterministic (value desc, week) row
    numbers over the bounded |weeks| frame; the joint-exceedance
    count is an exact conditional sum; two ratios.

    Scale shape: one orders-customer join to the |weeks| frame, two
    rank windows over it, one reduction.
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
                F.when(F.col("seg") == TD_SEG_A, F.col("cents")).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.when(F.col("seg") == TD_SEG_B, F.col("cents")).otherwise(0)
            )
            .cast("bigint")
            .alias("y"),
        )
    )
    w_all = Window.partitionBy()
    ranked = weekly.select(
        "w",
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.row_number()
        .over(Window.orderBy(F.col("x").desc(), F.col("w")))
        .alias("rx"),
        F.row_number()
        .over(Window.orderBy(F.col("y").desc(), F.col("w")))
        .alias("ry"),
    )
    k_expr = F.floor(F.lit(TD_Q) * F.col("n")).cast("bigint")
    red = ranked.agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(k_expr).cast("bigint").alias("k"),
        F.sum(
            F.when((F.col("rx") <= k_expr) & (F.col("ry") <= k_expr), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("joint"),
    )
    n, k, joint = F.col("n"), F.col("k"), F.col("joint")
    lam = joint * 1.0 / k
    indep = k * 1.0 / n
    return red.select(
        n.alias("n_weeks"),
        k.alias("tail_k"),
        joint.alias("n_joint"),
        round_eps(lam, 6).alias("lambda_upper"),
        round_eps(indep, 6).alias("indep_expected"),
        round_eps(lam / indep, 4).alias("tail_lift"),
    )


# ---------------------------------------------------------------- C172

_C172_ORACLE = f"""
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
clusters AS (
  SELECT comp.cid,
         CAST(COUNT(*) AS BIGINT) AS sz,
         CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS n_langs
  FROM comp JOIN documents d USING (doc_id)
  GROUP BY comp.cid
  HAVING COUNT(*) >= 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_dup_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs_in_clusters,
       CAST(SUM(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mixed_lang_clusters,
       CAST(SUM(CASE WHEN n_langs > 1 THEN sz ELSE 0 END) AS BIGINT)
         AS n_docs_in_mixed,
       {sql_round(
           'SUM(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END) * 100.0'
           ' / COUNT(*)', 4)} AS pct_mixed_clusters
FROM clusters
"""


@register("dup_cluster_lang_purity", oracle=_C172_ORACLE)
def dup_cluster_lang_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language purity of near-duplicate clusters from the composed
    C5 -> connected-components pipeline: a cluster whose members
    carry more than one lang label is either a translation pair
    (keep both!) or label noise (C151's finding, now at NEAR-dup
    rather than exact-hash grain) — and either way, C16's
    keep-one-exemplar policy silently deletes one language's copy.
    The number that decides whether dedup must be language-scoped.

    Scale shape: C5's verified pairs feed A11's iterative CC
    (edge-incident vertices only); the lang join and purity counts
    run at cluster grain. Oracle = C5 pairs verbatim + recursive
    closure (C147's recipe) + the lang rollup.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "lang"
    )
    comp = connected_components(
        pairs.select(
            F.col("id_a").alias("first_id"), F.col("id_b").alias("second_id")
        ),
        docs.select("id"),
        id_col="id",
    )
    clusters = (
        comp.join(docs, comp["id"] == docs["id"])
        .select("component_id", "lang")
        .groupBy("component_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sz"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
        .where(F.col("sz") >= 2)
    )
    mixed = F.when(F.col("n_langs") > 1, 1).otherwise(0)
    return clusters.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs_in_clusters"),
        F.sum(mixed).cast("bigint").alias("n_mixed_lang_clusters"),
        F.sum(F.when(F.col("n_langs") > 1, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_in_mixed"),
        round_eps(
            F.sum(mixed) * 100.0 / F.count(F.lit(1)), 4
        ).alias("pct_mixed_clusters"),
    )
