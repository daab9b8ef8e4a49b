"""Fifty-fourth sweep (SURVEY.md §2 B105-B106, C118).

Master-data-management survivorship (golden records over C66's
linkage clusters — the step that turns matched pairs into ONE
canonical entity), an accounting reconciliation audit (order header
totals vs line-item sums), and the warehouse date-dimension build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..operators.dedup import connected_components
from ..sources import load_table
from . import register
from .llm_plans12 import LINK_BLOCK_CAP, LINK_MAX_DIST

# ---------------------------------------------------------------- C118


def _c118_oracle() -> str:
    return f"""
WITH RECURSIVE
blocked AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal
  FROM customer
),
sized AS (
  SELECT c_nationkey, c_mktsegment FROM blocked
  GROUP BY 1, 2 HAVING COUNT(*) <= {LINK_BLOCK_CAP}
),
b AS (
  SELECT blocked.* FROM blocked JOIN sized USING (c_nationkey, c_mktsegment)
),
edges0 AS (
  SELECT x.c_custkey AS id_a, y.c_custkey AS id_b
  FROM b x JOIN b y
    ON x.c_nationkey = y.c_nationkey AND x.c_mktsegment = y.c_mktsegment
   AND x.c_custkey < y.c_custkey
  WHERE levenshtein(x.c_name, y.c_name) <= {LINK_MAX_DIST}
),
edges AS (
  SELECT id_a AS x, id_b AS y FROM edges0
  UNION ALL
  SELECT id_b AS x, id_a AS y FROM edges0
),
reach AS (
  SELECT c_custkey AS v, c_custkey AS w FROM customer
  UNION
  SELECT r.v, e.y FROM reach r JOIN edges e ON r.w = e.x
),
comp AS (
  SELECT v AS c_custkey, MIN(w) AS cluster_id FROM reach GROUP BY v
),
members AS (
  SELECT comp.cluster_id, c.c_custkey, c.c_name, c.c_nationkey,
         c.c_mktsegment, c.c_acctbal
  FROM comp JOIN customer c USING (c_custkey)
),
multi AS (
  SELECT cluster_id FROM members GROUP BY 1 HAVING COUNT(*) >= 2
)
SELECT m.cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MIN(struct_pack(neg_len := -len(c_name), nm := c_name)).nm
         AS canonical_name,
       {sql_round('MAX(c_acctbal)', 2)} AS max_acctbal,
       CAST(MIN(c_nationkey) AS BIGINT) AS nationkey,
       MIN(c_mktsegment) AS mktsegment
FROM members m JOIN multi USING (cluster_id)
GROUP BY m.cluster_id ORDER BY m.cluster_id
"""


@register("golden_record", oracle=_c118_oracle())
def golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDM survivorship: C66's blocked-linkage pairs → connected
    components → ONE golden record per multi-member cluster with
    field-level survivorship rules (longest-then-lexicographic name,
    max balance, min-id cluster key; nation/segment constant within a
    cluster because linkage blocks on them) — the step after entity
    RESOLUTION that master-data systems actually ship. Composes C66
    (pair scoring) with A11's distributed CC exactly as C16 composes
    C5 with it for text.

    Scale shape: the linkage edges are block-capped (C66's skew
    guard), CC carries only edge-incident vertices
    (operators/dedup.py), and survivorship is ONE cluster-grain
    aggregate with struct-argmin picks — no per-cluster sort. Oracle =
    the same edges + recursive closure + identical survivorship
    aggregates.
    """
    cust = load_table(spark, sf_dir, "customer")
    ok_blocks = (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= LINK_BLOCK_CAP)
        .select("c_nationkey", "c_mktsegment")
    )
    b = cust.join(F.broadcast(ok_blocks), ["c_nationkey", "c_mktsegment"])
    x = b.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        "c_nationkey",
        "c_mktsegment",
    )
    y = b.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        "c_nationkey",
        "c_mktsegment",
    )
    edges = (
        x.join(y, ["c_nationkey", "c_mktsegment"])
        .where(F.col("id_a") < F.col("id_b"))
        # threshold form returns -1 when the distance EXCEEDS the bound
        # (early-exit) — keep only 0 <= lev <= bound
        .where(F.levenshtein("name_a", "name_b", LINK_MAX_DIST) >= 0)
        .select(
            F.col("id_a").alias("first_id"), F.col("id_b").alias("second_id")
        )
    )
    comp = connected_components(
        edges, cust.select(F.col("c_custkey").alias("id")), id_col="id"
    ).select(F.col("id").alias("c_custkey"), F.col("component_id").alias("cluster_id"))
    members = comp.join(cust, "c_custkey")
    multi = (
        members.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("nm"))
        .where(F.col("nm") >= 2)
        .select("cluster_id")
    )
    return (
        members.join(F.broadcast(multi), "cluster_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(
                F.struct(
                    (-F.length("c_name")).alias("neg_len"),
                    F.col("c_name").alias("nm"),
                )
            )["nm"].alias("canonical_name"),
            round_eps(F.max("c_acctbal"), 2).alias("max_acctbal"),
            F.min("c_nationkey").cast("bigint").alias("nationkey"),
            F.min("c_mktsegment").alias("mktsegment"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------- B105

RECON_TOL_CENTS = (0, 100, 10_000)  # exact / ≤$1 / ≤$100 buckets


_B105_ORACLE = f"""
WITH line_sums AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
             * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS charge8
  FROM lineitem GROUP BY l_orderkey
),
joined AS (
  SELECT o.o_orderkey,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS header_cents,
         CAST(ROUND(ls.charge8 / 1e6) AS BIGINT) AS lines_cents
  FROM orders o LEFT JOIN line_sums ls ON o.o_orderkey = ls.l_orderkey
),
bucketed AS (
  SELECT *,
         CASE WHEN lines_cents IS NULL THEN 'no_lines'
              WHEN abs(header_cents - lines_cents) = {RECON_TOL_CENTS[0]}
                THEN 'exact'
              WHEN abs(header_cents - lines_cents) <= {RECON_TOL_CENTS[1]}
                THEN 'within_1'
              WHEN abs(header_cents - lines_cents) <= {RECON_TOL_CENTS[2]}
                THEN 'within_100'
              ELSE 'mismatch' END AS bucket
  FROM joined
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_round('SUM(abs(COALESCE(header_cents - lines_cents, '
                  'header_cents))) / 100.0', 2)} AS total_abs_diff
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


@register("order_reconciliation", oracle=_B105_ORACLE)
def order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounting reconciliation: per order, compare the HEADER total
    against the recomputed line-item charge Σ price·(1−disc)·(1+tax),
    bucketed by absolute difference (exact / ≤$1 / ≤$100 / mismatch /
    no-lines) — the books-balance audit every billing pipeline runs
    (A32 checks referential integrity; this checks the MONEY).

    Scale shape: one lineitem aggregate to order grain (map-side
    combined), one key join against headers, then a ≤5-row bucket
    aggregate. The charge is exact integer cents×pct×pct units
    (divided back once), so the comparison is integer math in any
    order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    charge8 = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
        * (100 + F.round(F.col("l_tax") * 100).cast("bigint"))
    )
    line_sums = li.groupBy("l_orderkey").agg(
        F.sum(charge8).alias("charge8")
    )
    joined = (
        load_table(spark, sf_dir, "orders")
        .join(
            line_sums,
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left",
        )
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
                "header_cents"
            ),
            F.round(F.col("charge8") / 1e6).cast("bigint").alias(
                "lines_cents"
            ),
        )
    )
    diff = F.abs(F.col("header_cents") - F.col("lines_cents"))
    bucket = (
        F.when(F.col("lines_cents").isNull(), "no_lines")
        .when(diff == RECON_TOL_CENTS[0], "exact")
        .when(diff <= RECON_TOL_CENTS[1], "within_1")
        .when(diff <= RECON_TOL_CENTS[2], "within_100")
        .otherwise("mismatch")
    )
    return (
        joined.select(
            bucket.alias("bucket"),
            F.coalesce(
                F.abs(F.col("header_cents") - F.col("lines_cents")),
                F.abs(F.col("header_cents")),
            ).alias("absdiff"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            round_eps(F.sum("absdiff") / 100.0, 2).alias("total_abs_diff"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------- B106

_B106_ORACLE = """
WITH bounds AS (
  SELECT MIN(o_orderdate)::DATE AS lo, MAX(o_orderdate)::DATE AS hi
  FROM orders
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
  FROM bounds
)
SELECT strftime(d, '%Y-%m-%d') AS date_key,
       CAST(year(d) AS BIGINT) AS year,
       CAST(quarter(d) AS BIGINT) AS quarter,
       CAST(month(d) AS BIGINT) AS month,
       CAST(isodow(d) AS BIGINT) AS iso_weekday,
       CAST(isoyear(d) AS BIGINT) AS iso_year,
       CAST(weekofyear(d) AS BIGINT) AS iso_week,
       CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS is_weekend,
       strftime(date_trunc('week', d), '%Y-%m-%d') AS week_start,
       strftime(date_trunc('month', d), '%Y-%m-%d') AS month_start,
       CAST(year(d) * 100 + quarter(d) AS BIGINT) AS fiscal_quarter_key
FROM spine ORDER BY date_key
"""


@register("date_dimension_build", oracle=_B106_ORACLE)
def date_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse date-dimension (calendar spine) build over the fact
    table's observed date range: ISO year/week/weekday (the A38
    year-boundary semantics), calendar hierarchy keys, weekend flag —
    the conformed dimension every BI layer joins first. Generated,
    never loaded: a sequence explode from a 2-scalar bounds row.

    Scale shape: the fact table reduces to ONE min/max row; the spine
    explodes map-side from it (|days| rows regardless of corpus
    size). D13's dynamic partition pruning is what makes fact joins
    against this dimension cheap at 100 TB.
    """
    bounds = load_table(spark, sf_dir, "orders").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    d = F.col("d")
    return spine.select(
        F.date_format(d, "yyyy-MM-dd").alias("date_key"),
        F.year(d).cast("bigint").alias("year"),
        F.quarter(d).cast("bigint").alias("quarter"),
        F.month(d).cast("bigint").alias("month"),
        (F.weekday(d) + 1).cast("bigint").alias("iso_weekday"),
        F.expr("extract(YEAROFWEEK FROM d)").cast("bigint").alias("iso_year"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        F.when(F.weekday(d) + 1 >= 6, 1).otherwise(0).alias("is_weekend"),
        F.date_format(F.date_trunc("week", d), "yyyy-MM-dd").alias(
            "week_start"
        ),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias(
            "month_start"
        ),
        (F.year(d) * 100 + F.quarter(d)).cast("bigint").alias(
            "fiscal_quarter_key"
        ),
    ).orderBy("date_key")
