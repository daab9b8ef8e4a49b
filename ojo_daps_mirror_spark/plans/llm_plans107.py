"""Hundred-seventh sweep (SURVEY.md §2 B198-B199, C184).

Acceptance-sampling OC curves (P(accept lot) under (n, c) plans —
the QC decision calculus that connects B186's capability to an
actual inspect-or-ship rule), the bullwhip ratio (variance
amplification between ordered and shipped quantity series — supply
chain's signature instability number), and the near-duplicate
source matrix (WHICH feeds copy each other at C5 pair grain — the
lineage view C42's corpus-level shingle overlap blurs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register
from .text_plans import _C5_ORACLE, dedup_minhash_lsh

# ---------------------------------------------------------------- B198

AS_N = 50
AS_CS = (1, 2, 3)
AS_P_GRID = (0.01, 0.05, 0.10)


def _pa_terms_sql(c: int) -> str:
    terms = []
    for k in range(c + 1):
        coef = 1
        for i in range(k):
            coef = coef * (AS_N - i) // (i + 1)
        terms.append(
            f"{coef} * pow(p, {k}) * pow(1.0 - p, {AS_N - k})"
        )
    return " + ".join(terms)


def _b198_cell(c: int, p_expr: str, p_label: str) -> str:
    return f"""
  SELECT {c} AS c, '{p_label}' AS p_source, {p_expr} AS p FROM base"""


_B198_ORACLE = f"""
WITH base AS (
  SELECT SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.0
           / COUNT(*) AS p_obs
  FROM lineitem
),
grid AS (
  {" UNION ALL ".join(
      [_b198_cell(c, "p_obs", "observed") for c in AS_CS]
      + [_b198_cell(c, f"{p!r}", f"{p}") for c in AS_CS for p in AS_P_GRID]
  )}
),
oc AS (
  SELECT c, p_source, p,
         CASE {" ".join(
             f"WHEN c = {c} THEN {_pa_terms_sql(c)}" for c in AS_CS)}
         END AS pa
  FROM grid
)
SELECT CAST(c AS BIGINT) AS accept_number, p_source,
       {sql_round('p', 6)} AS defect_rate,
       {sql_round('pa', 6)} AS p_accept,
       {sql_round('p * pa', 6)} AS aoq
FROM oc ORDER BY accept_number, p_source
"""


@register("acceptance_sampling_oc", oracle=_B198_ORACLE)
def acceptance_sampling_oc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-characteristic curves for n = {AS_N} acceptance-
    sampling plans at accept numbers c = {AS_CS}: P(accept lot) and
    the average outgoing quality p x Pa, evaluated at the OBSERVED
    return rate and a defect-rate grid — the MIL-STD QC calculus
    that turns B186's "is the process capable" into "inspect 50,
    ship if <= c defects", with the c choice's consumer-risk
    visible across the grid. Exact binomial coefficients are
    generated as integer literals from the SAME Python constants in
    both engines.

    Scale shape: one fact aggregate for the observed rate; the OC
    grid is |plans| x |rates| dimension rows of closed-form
    polynomial arithmetic.
    """
    base = load_table(spark, sf_dir, "lineitem").agg(
        (
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1))
        ).alias("p_obs")
    )
    cells = []
    for c in AS_CS:
        cells.append(
            base.select(
                F.lit(c).alias("c"),
                F.lit("observed").alias("p_source"),
                F.col("p_obs").alias("p"),
            )
        )
        for p in AS_P_GRID:
            cells.append(
                base.select(
                    F.lit(c).alias("c"),
                    F.lit(f"{p}").alias("p_source"),
                    F.lit(p).alias("p"),
                )
            )
    grid = cells[0]
    for fr in cells[1:]:
        grid = grid.unionAll(fr)

    def pa_expr(c: int):
        total = None
        for k in range(c + 1):
            coef = 1
            for i in range(k):
                coef = coef * (AS_N - i) // (i + 1)
            term = (
                F.lit(float(coef))
                * F.pow(F.col("p"), F.lit(k))
                * F.pow(1.0 - F.col("p"), F.lit(AS_N - k))
            )
            total = term if total is None else total + term
        return total

    pa = None
    for c in AS_CS:
        cond = F.when(F.col("c") == c, pa_expr(c))
        pa = cond if pa is None else pa.when(F.col("c") == c, pa_expr(c))
    oc = grid.select("c", "p_source", "p", pa.alias("pa"))
    return oc.select(
        F.col("c").cast("bigint").alias("accept_number"),
        "p_source",
        round_eps(F.col("p"), 6).alias("defect_rate"),
        round_eps(F.col("pa"), 6).alias("p_accept"),
        round_eps(F.col("p") * F.col("pa"), 6).alias("aoq"),
    ).orderBy("accept_number", "p_source")


# ---------------------------------------------------------------- B199

_B199_ORACLE = f"""
WITH ordered_w AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o.o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
),
shipped_w AS (
  SELECT CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', l_shipdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1
),
merged AS (
  SELECT COALESCE(o.w, s.w) AS w,
         COALESCE(o.q, 0) AS oq, COALESCE(s.q, 0) AS sq
  FROM ordered_w o FULL OUTER JOIN shipped_w s ON o.w = s.w
),
lagged AS (
  SELECT w, oq, sq,
         LEAD(sq) OVER (ORDER BY w) AS sq_next,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM merged
),
red AS (
  SELECT MAX(n) AS n,
         CAST(SUM(oq) AS HUGEINT) AS so,
         CAST(SUM(CAST(oq AS HUGEINT) * oq) AS HUGEINT) AS soo,
         CAST(SUM(sq) AS HUGEINT) AS ss,
         CAST(SUM(CAST(sq AS HUGEINT) * sq) AS HUGEINT) AS sss,
         CAST(SUM(CAST(oq AS HUGEINT) * sq) AS HUGEINT) AS sos,
         CAST(SUM(CASE WHEN sq_next IS NULL THEN 0
                       ELSE CAST(oq AS HUGEINT) * sq_next END)
              AS HUGEINT) AS sol,
         CAST(SUM(CASE WHEN sq_next IS NULL THEN 0 ELSE oq END)
              AS HUGEINT) AS so_l,
         CAST(SUM(CASE WHEN sq_next IS NULL THEN 0 ELSE sq_next END)
              AS HUGEINT) AS ss_l,
         CAST(SUM(CASE WHEN sq_next IS NULL THEN 0
                       ELSE CAST(oq AS HUGEINT) * oq END)
              AS HUGEINT) AS soo_l,
         CAST(SUM(CASE WHEN sq_next IS NULL THEN 0
                       ELSE CAST(sq_next AS HUGEINT) * sq_next END)
              AS HUGEINT) AS sss_l,
         CAST(SUM(CASE WHEN sq_next IS NULL THEN 0 ELSE 1 END)
              AS BIGINT) AS nl
  FROM lagged
)
SELECT n AS n_weeks,
       {sql_round(
           '(CAST(n * soo - so * so AS DOUBLE))'
           ' / (CAST(n * sss - ss * ss AS DOUBLE))', 6)}
         AS bullwhip_var_ratio,
       {sql_round(
           'CAST(n * sos - so * ss AS DOUBLE)'
           ' / sqrt(CAST(n * soo - so * so AS DOUBLE)'
           '        * CAST(n * sss - ss * ss AS DOUBLE))', 6)}
         AS corr_lag0,
       {sql_round(
           'CAST(nl * sol - so_l * ss_l AS DOUBLE)'
           ' / sqrt(CAST(nl * soo_l - so_l * so_l AS DOUBLE)'
           '        * CAST(nl * sss_l - ss_l * ss_l AS DOUBLE))', 6)}
         AS corr_orders_lead_ship1
FROM red
"""


@register("bullwhip_ratio", oracle=_B199_ORACLE)
def bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip measurement: the variance of weekly ORDERED quantity
    over the variance of weekly SHIPPED quantity (ratio > 1 means
    the order signal is noisier than the fulfilment stream it
    drives — the supply-chain amplification Lee et al. named), with
    the contemporaneous correlation and the orders -> next-week-
    shipments lead correlation that shows the fulfilment delay.

    Exactness: both weekly series are exact BIGINT quantity sums
    (full-outer merged on week, absent weeks = 0); all second
    moments accumulate 128-bit; each statistic is one double
    expression over exact integers.

    Scale shape: two fact aggregates to |weeks| frames, one bounded
    full-outer merge, one lead window, one reduction.
    """
    wk = lambda col: (  # noqa: E731
        F.datediff(
            F.date_trunc("week", F.col(col)).cast("date"),
            F.lit("1970-01-05").cast("date"),
        )
        / 7
    ).cast("bigint")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_shipdate").alias("ship"),
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
    )
    ordered_w = (
        li.join(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("ok"),
                F.col("o_orderdate").alias("od"),
            ),
            "ok",
        )
        .groupBy(wk("od").alias("w"))
        .agg(F.sum("qty").cast("bigint").alias("oq"))
    )
    shipped_w = li.groupBy(wk("ship").alias("w")).agg(
        F.sum("qty").cast("bigint").alias("sq")
    )
    merged = (
        ordered_w.join(shipped_w, "w", "full_outer")
        .select(
            "w",
            F.coalesce(F.col("oq"), F.lit(0)).alias("oq"),
            F.coalesce(F.col("sq"), F.lit(0)).alias("sq"),
        )
    )
    w_all = Window.partitionBy()
    lagged = merged.select(
        "oq",
        "sq",
        F.lead("sq").over(Window.orderBy("w")).alias("sq_next"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    has_l = F.col("sq_next").isNotNull()
    red = lagged.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(d("oq")).cast("decimal(38,0)").alias("so"),
        F.sum(d("oq") * F.col("oq")).cast("decimal(38,0)").alias("soo"),
        F.sum(d("sq")).cast("decimal(38,0)").alias("ss"),
        F.sum(d("sq") * F.col("sq")).cast("decimal(38,0)").alias("sss"),
        F.sum(d("oq") * F.col("sq")).cast("decimal(38,0)").alias("sos"),
        F.sum(F.when(has_l, d("oq") * F.col("sq_next")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("sol"),
        F.sum(F.when(has_l, F.col("oq")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("so_l"),
        F.sum(F.when(has_l, F.col("sq_next")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("ss_l"),
        F.sum(F.when(has_l, d("oq") * F.col("oq")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("soo_l"),
        F.sum(F.when(has_l, d("sq_next") * F.col("sq_next")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("sss_l"),
        F.sum(F.when(has_l, 1).otherwise(0)).cast("bigint").alias("nl"),
    )
    n, nl = F.col("n"), F.col("nl")
    var_o = (n * F.col("soo") - F.col("so") * F.col("so")).cast("double")
    var_s = (n * F.col("sss") - F.col("ss") * F.col("ss")).cast("double")
    cov = (n * F.col("sos") - F.col("so") * F.col("ss")).cast("double")
    cov_l = (nl * F.col("sol") - F.col("so_l") * F.col("ss_l")).cast(
        "double"
    )
    var_ol = (
        nl * F.col("soo_l") - F.col("so_l") * F.col("so_l")
    ).cast("double")
    var_sl = (
        nl * F.col("sss_l") - F.col("ss_l") * F.col("ss_l")
    ).cast("double")
    return red.select(
        n.alias("n_weeks"),
        round_eps(var_o / var_s, 6).alias("bullwhip_var_ratio"),
        round_eps(cov / F.sqrt(var_o * var_s), 6).alias("corr_lag0"),
        round_eps(cov_l / F.sqrt(var_ol * var_sl), 6).alias(
            "corr_orders_lead_ship1"
        ),
    )


# ---------------------------------------------------------------- C184

_C184_ORACLE = f"""
WITH pairs AS (
  SELECT id_a, id_b FROM ( {_C5_ORACLE} )
),
src AS (SELECT doc_id, source FROM documents),
classed AS (
  SELECT LEAST(sa.source, sb.source) AS src_a,
         GREATEST(sa.source, sb.source) AS src_b
  FROM pairs
  JOIN src sa ON pairs.id_a = sa.doc_id
  JOIN src sb ON pairs.id_b = sb.doc_id
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM classed)
SELECT src_a, src_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(CASE WHEN src_a <> src_b THEN 1 ELSE 0 END AS BIGINT)
         AS is_cross_source,
       {sql_round('COUNT(*) * 100.0 / MAX(np)', 4)} AS pct_of_pairs
FROM classed CROSS JOIN tot
GROUP BY src_a, src_b ORDER BY src_a, src_b
"""


@register("near_dup_source_matrix", oracle=_C184_ORACLE)
def near_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5's confirmed near-duplicate pairs rolled up by source pair:
    the WHICH-feeds-copy-each-other lineage matrix at PAIR grain —
    C42's shingle overlap says two sources share vocabulary, this
    says actual documents were duplicated across them (the signal
    for dropping a mirrored feed before it double-weights training);
    within-source rows are template churn instead. C168's recipe
    with source labels in place of split labels.

    Scale shape: C5's pipeline does the work; two id joins attach
    sources to the small pair frame; the report is a
    |source-pairs|-row aggregate with a broadcast total.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    classed = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("sb")
            ),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
    )
    classed = classed.persist()
    w_all = Window.partitionBy()
    return (
        classed.withColumn(
            "np", F.count(F.lit(1)).over(w_all).cast("bigint")
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.max(
                F.when(F.col("src_a") != F.col("src_b"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("is_cross_source"),
            round_eps(
                F.count(F.lit(1)) * 100.0 / F.max("np"), 4
            ).alias("pct_of_pairs"),
        )
        .orderBy("src_a", "src_b")
    )
