"""Nineteenth sweep (SURVEY.md §2 B54, C76–C77).

Dedup-recall evaluation harness (MinHash-LSH vs distributed exact
ground truth), a one-pass table profiling report, and robust
median/IQR feature scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_shingles, sql_tokens
from ..sources import load_table
from .. import scale_mode as sm
from . import register
from .llm_plans11 import prefix_filter_pairs
from .text_plans import JACCARD_THRESHOLD, MH_SHINGLE_K, _C5_ORACLE

# ---------------------------------------------------------------- C76

_C76_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), MH_SHINGLE_K)} AS sh
  FROM documents
),
truth AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ROUND(len(list_intersect(a.sh, b.sh)) * 1.0
           / len(list_distinct(a.sh || b.sh)) + 1e-9, 4) AS jaccard
  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh)) * 1.0
          / len(list_distinct(a.sh || b.sh)) >= {JACCARD_THRESHOLD}
),
found AS (SELECT id_a, id_b FROM ({_C5_ORACLE})),
joined AS (
  SELECT truth.jaccard, found.id_a IS NOT NULL AS hit
  FROM truth LEFT JOIN found USING (id_a, id_b)
),
banded AS (
  SELECT floor(jaccard * 10 + 1e-9) / 10 AS band, hit FROM joined
)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       {sql_round('SUM(CASE WHEN hit THEN 1 ELSE 0 END) * 1.0 / COUNT(*)', 6)}
         AS recall
FROM banded GROUP BY band ORDER BY band
"""


@register("dedup_recall_eval", oracle=_C76_ORACLE)
def dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the MinHash-LSH dedup path (C5) against EXACT ground
    truth, broken down by Jaccard band — the quality-control harness a
    production dedup pipeline runs before trusting its banding config
    (8 perms × 2-row bands has real false negatives near threshold; the
    per-band table shows exactly where).

    Ground truth is NOT a driver-side quadratic: it's the C64
    prefix-filter machinery run at C5's threshold — distributed,
    lossless. The found set left-joins onto truth (C5's exact verify
    means found ⊆ truth, so recall is the whole story), then a
    band-grain aggregate. The oracle recomputes truth quadratically
    and embeds C5's oracle verbatim, so evaluator and evaluated cannot
    drift.
    """
    truth = prefix_filter_pairs(spark, sf_dir, JACCARD_THRESHOLD).select(
        "id_a", "id_b", "jaccard"
    )
    from .text_plans import dedup_minhash_lsh

    found = dedup_minhash_lsh(spark, sf_dir).select(
        "id_a", "id_b", F.lit(True).alias("hit")
    )
    joined = truth.join(F.broadcast(found), ["id_a", "id_b"], "left")
    return (
        joined.select(
            (F.floor(F.col("jaccard") * 10 + 1e-9) / 10).alias("band"),
            F.coalesce("hit", F.lit(False)).alias("hit"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.col("hit").cast("bigint")).alias("n_found"),
            round_eps(
                F.sum(F.col("hit").cast("bigint")) / F.count(F.lit(1)), 6
            ).alias("recall"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------- B54

_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]

_B54_ORACLE = """
WITH vals AS (
  SELECT 'o_orderstatus' AS c, o_orderstatus::VARCHAR AS v FROM orders
  UNION ALL SELECT 'o_orderpriority', o_orderpriority::VARCHAR FROM orders
  UNION ALL SELECT 'o_custkey', o_custkey::VARCHAR FROM orders
),
counts AS (SELECT c, v, COUNT(*) AS n FROM vals GROUP BY c, v),
agg AS (
  SELECT c, CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(COALESCE(SUM(n) FILTER (WHERE v IS NULL), 0) AS BIGINT) AS n_null,
         CAST(COUNT(*) FILTER (WHERE v IS NOT NULL) AS BIGINT) AS n_distinct
  FROM counts GROUP BY c
),
top AS (
  SELECT c, v AS top_value, n AS top_count,
         row_number() OVER (PARTITION BY c ORDER BY n DESC, v) AS rn
  FROM counts WHERE v IS NOT NULL
)
SELECT agg.c AS col_name, n_rows, n_null, n_distinct,
       top.top_value, top.top_count
FROM agg JOIN top ON agg.c = top.c AND top.rn = 1
ORDER BY col_name
"""


@register("data_profile_report", oracle=_B54_ORACLE)
def data_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling report (row count, nulls, exact
    distinct, mode value + its frequency per column) — the
    dqa-style table summary, computed for ALL profiled columns from a
    SINGLE scan: rows unpivot map-side to (column, value) pairs, one
    combined count aggregate produces the value-grain table, and every
    statistic derives from that (≪ fact-sized) frame. At 100 TB the
    exact distinct swaps per column to approx_count_distinct — the
    unpivot shape is unchanged. Executable via
    SPARK_GRAFT_SCALE_MODE=approx (scale_mode.py).
    """
    orders = load_table(spark, sf_dir, "orders")
    stack_expr = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_COLS)
    vals = orders.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_expr}) AS (c, v)"
    )
    # the value-grain table feeds both the per-column aggregate and the
    # mode pick — materialise it once (it is ≪ fact-sized)
    counts = vals.groupBy("c", "v").agg(F.count(F.lit(1)).alias("n")).persist()
    agg = counts.groupBy("c").agg(
        F.sum("n").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("v").isNull(), F.col("n"))), F.lit(0)
        ).alias("n_null"),
        F.count(F.when(F.col("v").isNotNull(), F.lit(1))).alias("n_distinct"),
    )
    if sm.is_approx():
        # HLL++ per column straight off the unpivot stream — the
        # value-grain counts frame is still needed for the mode pick,
        # but the distinct no longer rides its exact cardinality
        dis = (
            vals.where(F.col("v").isNotNull())
            .groupBy("c")
            .agg(sm.count_distinct("v").alias("n_distinct"))
        )
        # LEFT join: a column whose values are all NULL has no non-null
        # stream and hence no HLL row — it must keep its profile row
        # with n_distinct=0, exactly as the exact path reports it.
        agg = (
            agg.drop("n_distinct")
            .join(F.broadcast(dis), "c", "left")
            .withColumn(
                "n_distinct",
                F.coalesce("n_distinct", F.lit(0)).cast("bigint"),
            )
        )
    w = Window.partitionBy("c").orderBy(F.desc("n"), F.asc("v"))
    top = (
        counts.where(F.col("v").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c", F.col("v").alias("top_value"), F.col("n").alias("top_count"))
    )
    return (
        agg.join(F.broadcast(top), "c")
        .select(
            F.col("c").alias("col_name"),
            "n_rows",
            "n_null",
            "n_distinct",
            "top_value",
            "top_count",
        )
        .orderBy("col_name")
    )


# ---------------------------------------------------------------- C77

ROBUST_K = 1.5  # |x - median| / IQR beyond this is an outlier

_C77_ORACLE = f"""
WITH geo AS (
  SELECT o_totalprice AS x, c_mktsegment AS seg
  FROM orders JOIN customer ON o_custkey = c_custkey
),
stats AS (
  SELECT seg,
         quantile_cont(x, 0.5) AS med,
         quantile_cont(x, 0.75) - quantile_cont(x, 0.25) AS iqr
  FROM geo GROUP BY seg
)
SELECT geo.seg,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_round('ANY_VALUE(med)', 4)} AS median,
       {sql_round('ANY_VALUE(iqr)', 4)} AS iqr,
       CAST(SUM(CASE WHEN ABS(geo.x - med) / iqr > {ROBUST_K}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM geo JOIN stats ON geo.seg = stats.seg
GROUP BY geo.seg ORDER BY geo.seg
"""


@register("robust_scaling", oracle=_C77_ORACLE)
def robust_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/IQR) scaling stats per customer segment with the
    outlier count at |x−median|/IQR > {ROBUST_K} — the
    outlier-insensitive alternative to z-scores for feature prep
    (C59's z-gate breaks when the tail IS the signal).

    Segment stats are one exact-percentile aggregate to a |segments|-row
    frame, broadcast back onto a second scan for the outlier count —
    the same two-pass broadcast-cuts shape as C71 (approx_percentile is
    the documented 100 TB swap for the first pass — executable via
    SPARK_GRAFT_SCALE_MODE=approx, scale_mode.py).
    """
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    geo = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select(F.col("o_totalprice").alias("x"), F.col("c_mktsegment").alias("seg"))
    stats = geo.groupBy("seg").agg(
        sm.percentile("x", 0.5).alias("med"),
        (sm.percentile("x", 0.75) - sm.percentile("x", 0.25)).alias(
            "iqr"
        ),
    )
    return (
        geo.join(F.broadcast(stats), "seg")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_eps(F.first("med"), 4).alias("median"),
            round_eps(F.first("iqr"), 4).alias("iqr"),
            F.sum(
                (F.abs(F.col("x") - F.col("med")) / F.col("iqr") > ROBUST_K).cast(
                    "bigint"
                )
            ).alias("n_outliers"),
        )
        .orderBy("seg")
    )
