"""OLAP breadth plans, fourth sweep (SURVEY.md §2 B23–B28).

The remaining classic decision-support shapes (adapted to the testdata
star schema, which has no partsupp/shipmode/commitdate): existential
semi-join aggregation (TPC-H Q4), bilateral volume flows (Q7), top-k
revenue by returned items (Q10), conditional share per month (Q14),
distinct-supplier variety counts (Q16), and per-group argmin selection
(Q2). Together with B1–B22 these give the query layer the reference's
warehouse consumers would expect from a full OLAP engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B23

LATE_DAYS = 30

_B23_ORACLE = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("priority_late_orders", oracle=_B23_ORACLE)
def priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existential aggregation (TPC-H Q4 shape): orders with at least
    one line shipped > LATE_DAYS after the order date, counted per
    priority — the reference's DQA "stale ad" check
    (dqa/data_getters.py filters ads whose latest snapshot lags).

    Scale shape: a LEFT SEMI join keyed on orderkey carries the
    ship-lag predicate as its join condition, so the fact table is
    never widened and the aggregate runs on orders only.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & F.expr(f"l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAYS"),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------- B24

_B24_ORACLE = f"""
SELECT cn.n_name AS cust_nation,
       sn.n_name AS supp_nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS trade_year,
       {sql_round("SUM(l_extendedprice * (1 - l_discount))", 2)} AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@register("nation_trade_flows", oracle=_B24_ORACLE)
def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume (TPC-H Q7 shape): yearly revenue between
    every distinct (customer-nation, supplier-nation) pair.

    Scale shape: the only big-big shuffle is lineitem⋈orders on
    orderkey; customer/supplier/nation all broadcast onto the fact
    stream, and the (c-nation, s-nation, year) aggregate is map-side
    combined to ~|nations|²·|years| rows.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cust_n = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    supp_n = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("o_orderdate").cast("bigint").alias("trade_year"),
        )
        .agg(round_eps(F.sum(rev), 2).alias("volume"))
        .orderBy("cust_nation", "supp_nation", "trade_year")
    )


# ---------------------------------------------------------------- B25

RETURNED_TOP_K = 20

_B25_ORACLE = f"""
WITH revenue AS (
  SELECT c_custkey, c_name,
         SUM(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name
)
SELECT c_custkey, c_name, {sql_round("rev", 2)} AS return_revenue
FROM revenue
ORDER BY rev DESC, c_custkey
LIMIT {RETURNED_TOP_K}
"""


@register("returned_top_customers", oracle=_B25_ORACLE)
def returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k customers by returned-item revenue (TPC-H Q10 shape) —
    the "who generates the most problem volume" report.

    Scale shape: the returnflag filter is pushed to the lineitem scan;
    one big-big join on orderkey; customer broadcast; global top-k is a
    TakeOrderedAndProject (per-partition heap + driver merge of k),
    never a full sort.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).alias("rev"))
        .orderBy(F.desc("rev"), F.asc("c_custkey"))
        .limit(RETURNED_TOP_K)
        .select(
            "c_custkey", "c_name", round_eps(F.col("rev"), 2).alias("return_revenue")
        )
    )


# ---------------------------------------------------------------- B26

PROMO_TYPE = "PROMO"

_B26_ORACLE = f"""
SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
       CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS ship_month,
       {sql_round(
           "100.0 * SUM(CASE WHEN p_type = '" + PROMO_TYPE + "' "
           "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
           "/ SUM(l_extendedprice * (1 - l_discount))", 4)} AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("promo_revenue_monthly", oracle=_B26_ORACLE)
def promo_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly promotional-revenue share (TPC-H Q14 shape) — the same
    share-of-total-within-period statistic as the reference's
    skill-demand percentages, over a broadcast dimension join.

    Scale shape: part broadcasts onto the fact scan (2 columns read),
    numerator and denominator come from ONE conditional-sum aggregate
    pass, map-side combined to |months| rows.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == PROMO_TYPE, rev).otherwise(0.0)
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
            F.month("l_shipdate").cast("bigint").alias("ship_month"),
        )
        .agg(
            round_eps(100.0 * F.sum(promo_rev) / F.sum(rev), 4).alias("promo_pct")
        )
        .orderBy("ship_year", "ship_month")
    )


# ---------------------------------------------------------------- B27

EXCLUDED_BRAND = "Brand#1"

_B27_ORACLE = f"""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{EXCLUDED_BRAND}'
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("supplier_part_variety", oracle=_B27_ORACLE)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier variety per part class (TPC-H Q16 shape), with the
    observed (part, supplier) pairs from lineitem standing in for
    partsupp.

    Scale shape: the pair-dedup is a map-side-combined distinct on
    exactly two int columns (the narrowest possible shuffle); the
    brand exclusion rides the broadcast part join; COUNT(DISTINCT)
    expands inside one aggregate, never a self-join.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") != EXCLUDED_BRAND
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    pairs = lineitem.distinct()
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------- B28

ARGMIN_SIZE = 10

_B28_ORACLE = f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ranked AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
         ROW_NUMBER() OVER (
           PARTITION BY p_partkey ORDER BY s_acctbal, s_suppkey
         ) AS rn
  FROM ps
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE p_size = {ARGMIN_SIZE}
)
SELECT p_partkey, p_name, s_suppkey, s_name,
       {sql_round("s_acctbal", 2)} AS best_acctbal
FROM ranked WHERE rn = 1
ORDER BY p_partkey
"""


@register("min_acctbal_supplier", oracle=_B28_ORACLE)
def min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmin selection (TPC-H Q2 shape): for every part of a
    given size, the supplier with the lowest account balance
    (deterministic tie-break on suppkey) among suppliers observed to
    ship it.

    Scale shape: the size filter broadcasts a pruned part dim that
    SHRINKS the pair set before the supplier attach; argmin is a
    row_number window over the per-part partitioning — one shuffle of
    the already-filtered pairs.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size") == ARGMIN_SIZE
    ).select("p_partkey", "p_name")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    pairs = lineitem.distinct()
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            round_eps(F.col("s_acctbal"), 2).alias("best_acctbal"),
        )
        .orderBy("p_partkey")
    )
