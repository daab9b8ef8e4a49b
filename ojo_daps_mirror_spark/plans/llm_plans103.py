"""Hundred-third sweep (SURVEY.md §2 B191-B192, C179).

Deming (orthogonal / errors-in-both-variables) regression — the
slope OLS systematically attenuates when the regressor is noisy
too, with the attenuation made visible; Pareto knee-point detection
(the kneedle elbow of the cumulative revenue curve — the EMPIRICAL
place to cut class A where B73 hardcodes 80%); and sorted-
neighborhood dedup (the classic record-linkage blocking: sort once,
compare only a fixed window of neighbours — the third blocking
family next to C5's LSH and C149's Levenshtein blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import shingles, sql_shingles, sql_tokens, tokens
from ..operators.rank import global_order_stats
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B191

_B191_ORACLE = f"""
WITH panel AS (
  SELECT ln(SUM(CAST(ROUND(l.l_extendedprice * 100 + 1e-9) AS BIGINT))
            * 1.0
            / SUM(CAST(ROUND(l.l_quantity) AS BIGINT))) AS x,
         ln(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) * 1.0) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, year(l.l_shipdate)
),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM panel
),
cen AS (
  SELECT n,
         sxx - sx * sx / n AS cxx,
         sxy - sx * sy / n AS cxy,
         syy - sy * sy / n AS cyy
  FROM suff
)
SELECT n AS n_cells,
       {sql_round('cxy / cxx', 6)} AS ols_slope,
       {sql_round(
           '(cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx)'
           ' + 4.0 * cxy * cxy)) / (2.0 * cxy)', 6)} AS deming_slope,
       {sql_round(
           '(1.0 - (cxy / cxx)'
           ' / ((cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx)'
           '     + 4.0 * cxy * cxy)) / (2.0 * cxy))) * 100.0', 4)}
         AS attenuation_pct
FROM cen
"""


@register("deming_regression", oracle=_B191_ORACLE)
def deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deming (orthogonal) regression of log quantity on log unit
    price over the brand-year panel, beside the OLS slope: when the
    REGRESSOR carries noise too (unit price is revenue/quantity —
    both measured), OLS attenuates toward zero and Deming's
    closed-form total-least-squares slope (lambda = 1) does not;
    the attenuation column is the bias B86/B175's OLS-family
    estimates silently carry. Same eigenvalue closed form as the
    2x2 PCA major axis.

    Exactness: centered second moments from one sufficient-stats
    reduction over the bounded panel; both slopes are O(1) algebra
    with identical IEEE shapes.
    """
    panel = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
            F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
            F.round(F.col("l_extendedprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("cents"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("pk"),
                    F.col("p_brand").alias("brand"),
                )
            ),
            "pk",
        )
        .groupBy("brand", "yr")
        .agg(
            F.log(
                F.sum("cents").cast("bigint") * 1.0
                / F.sum("qty").cast("bigint")
            ).alias("x"),
            F.log(F.sum("qty").cast("bigint") * 1.0).alias("y"),
        )
    )
    suff = panel.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    ols = cxy / cxx
    deming = (
        cyy - cxx + F.sqrt((cyy - cxx) * (cyy - cxx) + 4.0 * cxy * cxy)
    ) / (2.0 * cxy)
    return suff.select(
        n.alias("n_cells"),
        round_eps(ols, 6).alias("ols_slope"),
        round_eps(deming, 6).alias("deming_slope"),
        round_eps((1.0 - ols / deming) * 100.0, 4).alias(
            "attenuation_pct"
        ),
    )


# ---------------------------------------------------------------- B192

_B192_ORACLE = f"""
WITH part_rev AS (
  SELECT l_partkey AS p,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
curve AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, p) AS BIGINT) AS rk,
         CAST(SUM(rev) OVER (ORDER BY rev DESC, p
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(rev) OVER () AS BIGINT) AS tot
  FROM part_rev
),
gaps AS (
  SELECT rk, n,
         cum * 1.0 / tot AS rev_share,
         rk * 1.0 / n AS pop_share,
         cum * 1.0 / tot - rk * 1.0 / n AS gap,
         ROW_NUMBER() OVER (
           ORDER BY cum * 1.0 / tot - rk * 1.0 / n DESC, rk) AS grk
  FROM curve
)
SELECT n AS n_parts, rk AS knee_rank,
       {sql_round('pop_share * 100.0', 4)} AS knee_pop_share_pct,
       {sql_round('rev_share * 100.0', 4)} AS knee_rev_share_pct,
       {sql_round('gap', 6)} AS max_chord_gap
FROM gaps WHERE grk = 1
"""


@register("pareto_knee_point", oracle=_B192_ORACLE)
def pareto_knee_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knee-point (kneedle) detection on the part-revenue Pareto
    curve: rank parts by revenue, and the knee is the rank
    maximising the vertical gap between the cumulative-share curve
    and the y = x chord — the EMPIRICAL place where "the vital few"
    end, instead of B73's hardcoded 80% convention (and the same
    max-gap geometry as a KS statistic against uniform). Reports
    the knee's population and revenue shares.

    Exactness: revenue and cumulative sums are exact BIGINTs; the
    gap is one double expression; the argmax uses a deterministic
    (gap desc, rank) tiebreak.

    Scale shape: one fact aggregate to part grain, one global rank
    + cumulative window over part-grain rows, a 1-row argmax.
    """
    part_rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("p"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("rev")
        )
    )
    w_ord = Window.orderBy(F.col("rev").desc(), F.col("p"))
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    curve = part_rev.select(
        F.row_number().over(w_ord).cast("bigint").alias("rk"),
        F.sum("rev").over(w_cum).cast("bigint").alias("cum"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.sum("rev").over(w_all).cast("bigint").alias("tot"),
    )
    gap = F.col("cum") * 1.0 / F.col("tot") - F.col("rk") * 1.0 / F.col("n")
    gaps = curve.select(
        "rk",
        "n",
        (F.col("cum") * 1.0 / F.col("tot")).alias("rev_share"),
        (F.col("rk") * 1.0 / F.col("n")).alias("pop_share"),
        gap.alias("gap"),
    ).withColumn(
        "grk",
        F.row_number().over(Window.orderBy(F.col("gap").desc(), F.col("rk"))),
    )
    return gaps.where(F.col("grk") == 1).select(
        F.col("n").alias("n_parts"),
        F.col("rk").alias("knee_rank"),
        round_eps(F.col("pop_share") * 100.0, 4).alias(
            "knee_pop_share_pct"
        ),
        round_eps(F.col("rev_share") * 100.0, 4).alias(
            "knee_rev_share_pct"
        ),
        round_eps(F.col("gap"), 6).alias("max_chord_gap"),
    )


# ---------------------------------------------------------------- C179

SNM_WINDOW = 3
SNM_SHINGLE_K = 3
SNM_THRESHOLD = 0.5

_C179_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, text,
         {sql_shingles(sql_tokens('text'), SNM_SHINGLE_K)} AS sh
  FROM documents
),
ranked AS (
  SELECT doc_id, sh,
         ROW_NUMBER() OVER (ORDER BY lower(text), doc_id) AS rn
  FROM docs
),
cand AS (
  {" UNION ALL ".join(
      f'''SELECT a.doc_id AS ia, b.doc_id AS ib, a.sh AS sha, b.sh AS shb
  FROM ranked a JOIN ranked b ON b.rn = a.rn + {o}'''
      for o in range(1, SNM_WINDOW + 1))}
),
jac AS (
  SELECT LEAST(ia, ib) AS id_a, GREATEST(ia, ib) AS id_b,
         len(list_intersect(sha, shb)) * 1.0
           / len(list_distinct(sha || shb)) AS jac
  FROM cand
)
SELECT id_a, id_b, {sql_round('jac', 4)} AS jaccard
FROM jac WHERE jac >= {SNM_THRESHOLD}
ORDER BY id_a, id_b
"""


@register("sorted_neighborhood_dedup", oracle=_C179_ORACLE)
def sorted_neighborhood_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup (Hernandez-Stolfo SNM): sort the
    corpus ONCE on a blocking key (the lowercased text itself) and
    compare each document only to its next {SNM_WINDOW} neighbours,
    verifying with exact shingle Jaccard — the third blocking family
    beside C5's LSH (probabilistic, order-free) and C149's
    Levenshtein blocks (field-level): SNM is deterministic, its cost
    is one sort + O(n x w) comparisons, and it catches prefix-
    perturbed near-dups that hash bands can miss. Same pair schema
    and threshold as C5 so the outputs are directly comparable.

    Scale shape: one global sort (rank window — at cluster scale a
    range-partitioned sort), pair generation via {SNM_WINDOW}
    rank-shifted equi-joins of the ranked frame (no LSH shuffle, no
    candidate blowup by construction: exactly n x w pairs), exact
    verify on the pair frame.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Global positions via the range-partitioned two-phase rank — no
    # single-reducer window over the corpus (operators/rank.py). Only
    # the narrow (doc_id, blocking key) skeleton goes through the
    # rank's sample + sort passes; the heavy shingle arrays are
    # computed once and attached by one doc_id equi-join after.
    skel = docs.select("doc_id", F.lower(F.col("text")).alias("key"))
    rn = global_order_stats(skel, ["key", "doc_id"], rn_col="rn").select(
        "doc_id", "rn"
    )
    ranked = docs.select(
        "doc_id", shingles(tokens(F.col("text")), SNM_SHINGLE_K).alias("sh")
    ).join(rn, "doc_id")
    ranked = ranked.persist()
    cands = []
    for o in range(1, SNM_WINDOW + 1):
        a = ranked.select(
            F.col("doc_id").alias("ia"),
            F.col("sh").alias("sha"),
            (F.col("rn") + o).alias("rnb"),
        )
        b = ranked.select(
            F.col("doc_id").alias("ib"),
            F.col("sh").alias("shb"),
            F.col("rn").alias("rnb"),
        )
        cands.append(a.join(b, "rnb").select("ia", "ib", "sha", "shb"))
    cand = cands[0]
    for c in cands[1:]:
        cand = cand.unionAll(c)
    jac = cand.select(
        F.least("ia", "ib").alias("id_a"),
        F.greatest("ia", "ib").alias("id_b"),
        (
            F.size(F.array_intersect("sha", "shb"))
            * F.lit(1.0)
            / F.size(F.array_union("sha", "shb"))
        ).alias("jac"),
    )
    return (
        jac.where(F.col("jac") >= SNM_THRESHOLD)
        .select(
            "id_a", "id_b", round_eps(F.col("jac"), 4).alias("jaccard")
        )
        .orderBy("id_a", "id_b")
    )
