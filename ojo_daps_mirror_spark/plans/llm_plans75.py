"""Seventy-fifth sweep (SURVEY.md §2 B136-B137, C150).

Nested-model curvature F-test on the weekly order series (is the
trend actually bending, or is B92's straight line enough — the
formal test behind "should the forecast be linear or quadratic"),
Cochran-Mantel-Haenszel stratified association test (the POOLED
test B129's Simpson's-paradox audit motivates: one common
odds-ratio across strata instead of per-stratum eyeballing), and
dedup token savings (what a C5→CC near-dup pass actually buys in
training tokens, per source — the number that decides whether the
dedup stage pays for itself).
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

# ---------------------------------------------------------------- B136

_B136_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o_orderdate)::DATE) / 7 AS BIGINT)
           AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
centered AS (
  SELECT 2 * x - (SELECT MIN(x) + MAX(x) FROM weekly) AS xc, y FROM weekly
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xc) AS BIGINT) AS s1,
         CAST(SUM(xc * xc) AS BIGINT) AS s2,
         CAST(SUM(xc * xc * xc) AS BIGINT) AS s3,
         CAST(SUM(xc * xc * xc * xc) AS BIGINT) AS s4,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(xc * y) AS BIGINT) AS sxy,
         CAST(SUM(xc * xc * y) AS BIGINT) AS sx2y,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM centered
),
fit AS (
  SELECT n, syy, sy, sxy, sx2y,
         (n * 1.0 * s2 - s1 * 1.0 * s1) AS det1,
         (n * 1.0 * sxy - s1 * 1.0 * sy) AS b1n,
         (sy * 1.0 * s2 - s1 * 1.0 * sxy) AS b0n,
         (n * 1.0) * (s2 * 1.0 * s4 - s3 * 1.0 * s3)
           - (s1 * 1.0) * (s1 * 1.0 * s4 - s3 * 1.0 * s2)
           + (s2 * 1.0) * (s1 * 1.0 * s3 - s2 * 1.0 * s2) AS det2,
         (sy * 1.0) * (s2 * 1.0 * s4 - s3 * 1.0 * s3)
           - (s1 * 1.0) * (sxy * 1.0 * s4 - s3 * 1.0 * sx2y)
           + (s2 * 1.0) * (sxy * 1.0 * s3 - s2 * 1.0 * sx2y) AS q0n,
         (n * 1.0) * (sxy * 1.0 * s4 - s3 * 1.0 * sx2y)
           - (sy * 1.0) * (s1 * 1.0 * s4 - s3 * 1.0 * s2)
           + (s2 * 1.0) * (s1 * 1.0 * sx2y - sxy * 1.0 * s2) AS q1n,
         (n * 1.0) * (s2 * 1.0 * sx2y - sxy * 1.0 * s3)
           - (s1 * 1.0) * (s1 * 1.0 * sx2y - sxy * 1.0 * s2)
           + (sy * 1.0) * (s1 * 1.0 * s3 - s2 * 1.0 * s2) AS q2n
  FROM sums
),
sse AS (
  SELECT n,
         syy - (b0n / det1) * sy - (b1n / det1) * sxy AS sse_lin,
         syy - (q0n / det2) * sy - (q1n / det2) * sxy
             - (q2n / det2) * sx2y AS sse_quad
  FROM fit
)
SELECT n AS n_weeks,
       {sql_round('sse_lin', 4)} AS sse_lin,
       {sql_round('sse_quad', 4)} AS sse_quad,
       {sql_round('(sse_lin - sse_quad) / (sse_quad / (n - 3))', 6)}
         AS f_stat,
       CASE WHEN (sse_lin - sse_quad) / (sse_quad / (n - 3)) > 4.0
            THEN 1 ELSE 0 END AS curvature_flag
FROM sse
"""


@register("poly_curvature_ftest", oracle=_B136_ORACLE)
def poly_curvature_ftest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-model F-test for curvature in the weekly order series:
    fit linear and quadratic OLS in closed form (Cramer on the normal
    equations) and test the quadratic term with
    F = (SSE₁−SSE₂)/(SSE₂/(n−3)) — the formal complement to B92's
    robust slope: "does a bend in the trend earn its extra
    parameter". Week index is centered symmetrically (2x−min−max,
    still an integer) so the moment matrix stays well-conditioned.

    Scale shape: ONE fact-grain aggregate to the weekly frame, then
    every power sum (Σxᵏ, Σxᵏy, Σy²) comes from one map-side-combined
    reduction over ≤|weeks| rows into exact BIGINTs — the
    normal-equation sufficient statistics pattern: model fitting at
    100 TB is one aggregate, the algebra is O(1). Both engines run
    the identical double-precision Cramer expressions on identical
    integers.
    """
    wk = F.floor(
        F.datediff(F.date_trunc("week", F.col("o_orderdate")), F.lit("1970-01-05"))
        / 7
    ).cast("bigint")
    weekly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(wk.alias("x"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    w_all = Window.partitionBy()
    centered = weekly.select(
        (2 * F.col("x") - (F.min("x").over(w_all) + F.max("x").over(w_all)))
        .alias("xc"),
        "y",
    )
    xc, y = F.col("xc"), F.col("y")
    sums = centered.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xc).cast("bigint").alias("s1"),
        F.sum(xc * xc).cast("bigint").alias("s2"),
        F.sum(xc * xc * xc).cast("bigint").alias("s3"),
        F.sum(xc * xc * xc * xc).cast("bigint").alias("s4"),
        F.sum(y).cast("bigint").alias("sy"),
        F.sum(xc * y).cast("bigint").alias("sxy"),
        F.sum(xc * xc * y).cast("bigint").alias("sx2y"),
        F.sum(y * y).cast("bigint").alias("syy"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    sy, sxy, sx2y, syy = (F.col(c) for c in ("sy", "sxy", "sx2y", "syy"))
    det1 = n * 1.0 * s2 - s1 * 1.0 * s1
    b1n = n * 1.0 * sxy - s1 * 1.0 * sy
    b0n = sy * 1.0 * s2 - s1 * 1.0 * sxy
    det2 = (
        (n * 1.0) * (s2 * 1.0 * s4 - s3 * 1.0 * s3)
        - (s1 * 1.0) * (s1 * 1.0 * s4 - s3 * 1.0 * s2)
        + (s2 * 1.0) * (s1 * 1.0 * s3 - s2 * 1.0 * s2)
    )
    q0n = (
        (sy * 1.0) * (s2 * 1.0 * s4 - s3 * 1.0 * s3)
        - (s1 * 1.0) * (sxy * 1.0 * s4 - s3 * 1.0 * sx2y)
        + (s2 * 1.0) * (sxy * 1.0 * s3 - s2 * 1.0 * sx2y)
    )
    q1n = (
        (n * 1.0) * (sxy * 1.0 * s4 - s3 * 1.0 * sx2y)
        - (sy * 1.0) * (s1 * 1.0 * s4 - s3 * 1.0 * s2)
        + (s2 * 1.0) * (s1 * 1.0 * sx2y - sxy * 1.0 * s2)
    )
    q2n = (
        (n * 1.0) * (s2 * 1.0 * sx2y - sxy * 1.0 * s3)
        - (s1 * 1.0) * (s1 * 1.0 * sx2y - sxy * 1.0 * s2)
        + (sy * 1.0) * (s1 * 1.0 * s3 - s2 * 1.0 * s2)
    )
    sse_lin = syy - (b0n / det1) * sy - (b1n / det1) * sxy
    sse_quad = (
        syy - (q0n / det2) * sy - (q1n / det2) * sxy - (q2n / det2) * sx2y
    )
    f_stat = (sse_lin - sse_quad) / (sse_quad / (n - 3))
    return sums.select(
        n.alias("n_weeks"),
        round_eps(sse_lin, 4).alias("sse_lin"),
        round_eps(sse_quad, 4).alias("sse_quad"),
        round_eps(f_stat, 6).alias("f_stat"),
        F.when(f_stat > 4.0, 1).otherwise(0).alias("curvature_flag"),
    )


# ---------------------------------------------------------------- B137

CMH_SEGMENT = "BUILDING"  # exposure: customer in this market segment
CMH_OUTCOME = "F"  # outcome: order fully shipped

_B137_ORACLE = f"""
WITH cells AS (
  SELECT o.o_orderpriority AS stratum,
         CASE WHEN c.c_mktsegment = '{CMH_SEGMENT}' THEN 1 ELSE 0 END AS e,
         CASE WHEN o.o_orderstatus = '{CMH_OUTCOME}' THEN 1 ELSE 0 END AS oc
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
strata AS (
  SELECT stratum,
         CAST(SUM(e * oc) AS BIGINT) AS a,
         CAST(SUM(e * (1 - oc)) AS BIGINT) AS b,
         CAST(SUM((1 - e) * oc) AS BIGINT) AS c,
         CAST(SUM((1 - e) * (1 - oc)) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM cells GROUP BY stratum
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(a) AS BIGINT) AS sum_a,
         SUM((a + b) * 1.0 * (a + c) / nt) AS expect,
         SUM((a + b) * 1.0 * (c + d) * (a + c) * (b + d)
             / ((nt * 1.0) * nt * (nt - 1))) AS var_sum,
         SUM(a * 1.0 * d / nt) AS rr_num,
         SUM(b * 1.0 * c / nt) AS rr_den
  FROM strata
)
SELECT k AS n_strata, sum_a,
       {sql_round('expect', 6)} AS expected_a,
       {sql_round('(sum_a - expect) * (sum_a - expect) / var_sum', 6)}
         AS cmh_chi2,
       {sql_round('rr_num / rr_den', 6)} AS mh_odds_ratio,
       CASE WHEN (sum_a - expect) * (sum_a - expect) / var_sum > 3.841
            THEN 1 ELSE 0 END AS significant
FROM agg
"""


@register("cmh_test", oracle=_B137_ORACLE)
def cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test of segment→fulfilment association
    stratified by order priority: per-stratum 2×2 tables pooled into
    ONE Χ²(1) with hypergeometric expectations/variances, plus the
    Mantel-Haenszel common odds ratio Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ). This is
    the POOLED inference B129's Simpson's-paradox audit motivates —
    confounder-adjusted association in one statistic instead of
    per-stratum eyeballing.

    Scale shape: one broadcast customer-dim join, one conditional
    aggregate collapsing the fact stream to |strata| exact-integer
    2×2 tables, then a |strata|-row reduction. All counts stay
    BIGINT until the final ratio arithmetic.
    """
    cells = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderpriority", "o_orderstatus")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_mktsegment"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("o_orderpriority").alias("stratum"),
            F.when(F.col("c_mktsegment") == CMH_SEGMENT, 1)
            .otherwise(0)
            .alias("e"),
            F.when(F.col("o_orderstatus") == CMH_OUTCOME, 1)
            .otherwise(0)
            .alias("oc"),
        )
    )
    e, oc = F.col("e"), F.col("oc")
    strata = cells.groupBy("stratum").agg(
        F.sum(e * oc).cast("bigint").alias("a"),
        F.sum(e * (1 - oc)).cast("bigint").alias("b"),
        F.sum((1 - e) * oc).cast("bigint").alias("c"),
        F.sum((1 - e) * (1 - oc)).cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    a, b, c, d, nt = (F.col(x) for x in ("a", "b", "c", "d", "nt"))
    agg = strata.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(a).cast("bigint").alias("sum_a"),
        F.sum((a + b) * 1.0 * (a + c) / nt).alias("expect"),
        F.sum(
            (a + b) * 1.0 * (c + d) * (a + c) * (b + d)
            / ((nt * 1.0) * nt * (nt - 1))
        ).alias("var_sum"),
        F.sum(a * 1.0 * d / nt).alias("rr_num"),
        F.sum(b * 1.0 * c / nt).alias("rr_den"),
    )
    chi2 = (
        (F.col("sum_a") - F.col("expect"))
        * (F.col("sum_a") - F.col("expect"))
        / F.col("var_sum")
    )
    return agg.select(
        F.col("k").alias("n_strata"),
        "sum_a",
        round_eps(F.col("expect"), 6).alias("expected_a"),
        round_eps(chi2, 6).alias("cmh_chi2"),
        round_eps(F.col("rr_num") / F.col("rr_den"), 6).alias(
            "mh_odds_ratio"
        ),
        F.when(chi2 > 3.841, 1).otherwise(0).alias("significant"),
    )


# ---------------------------------------------------------------- C150


def _c150_oracle() -> str:
    return f"""
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
toks AS (
  SELECT doc_id, source,
         CAST(len(list_filter(str_split_regex(lower(text), '\\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tok
  FROM documents
),
labeled AS (
  SELECT t.source, t.n_tok,
         CASE WHEN c.cid = t.doc_id THEN 1 ELSE 0 END AS kept
  FROM toks t JOIN comp c ON t.doc_id = c.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
       CAST(SUM(kept * n_tok) AS BIGINT) AS tokens_kept,
       CAST(SUM((1 - kept) * n_tok) AS BIGINT) AS tokens_saved,
       {sql_round('SUM((1 - kept) * n_tok) * 100.0 / SUM(n_tok)', 4)}
         AS pct_saved
FROM labeled GROUP BY source ORDER BY source
"""


@register("dedup_token_savings", oracle=_c150_oracle())
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token savings of the composed C5→CC near-dup pass, per source:
    each duplicate cluster keeps its min-doc_id exemplar and the
    TRAINING TOKENS of everything else are the savings — the number
    that decides whether a dedup stage pays for itself (and which
    source is boilerplate-heaviest). Token grain = whitespace tokens,
    C1's counting rule.

    Scale shape: C5's verified pairs (band-bucketed, capped,
    Jaccard-verified) feed A11's iterative CC carrying only
    edge-incident vertices; per-doc token counts are map-side
    expression work (size of the split array — no explode); the
    report is one |sources|-key aggregate. Oracle = C5's oracle pairs
    verbatim + recursive closure (C147's no-drift recipe).
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(
        pairs.select(
            F.col("id_a").alias("first_id"), F.col("id_b").alias("second_id")
        ),
        docs.select(F.col("doc_id").alias("id")),
        id_col="id",
    )
    toks = docs.select(
        "doc_id",
        "source",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
            )
        )
        .cast("bigint")
        .alias("n_tok"),
    )
    labeled = toks.join(
        comp.select(F.col("id").alias("doc_id"), "component_id"), "doc_id"
    ).select(
        "source",
        "n_tok",
        F.when(F.col("component_id") == F.col("doc_id"), 1)
        .otherwise(0)
        .alias("kept"),
    )
    kept, n_tok = F.col("kept"), F.col("n_tok")
    return (
        labeled.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.sum(n_tok).cast("bigint").alias("tokens_total"),
            F.sum(kept * n_tok).cast("bigint").alias("tokens_kept"),
            F.sum((1 - kept) * n_tok).cast("bigint").alias("tokens_saved"),
            round_eps(
                F.sum((1 - kept) * n_tok) * 100.0 / F.sum(n_tok), 4
            ).alias("pct_saved"),
        )
        .orderBy("source")
    )
