"""OLAP breadth plans, fifth sweep (SURVEY.md §2 B29–B37).

The last nine classic decision-support shapes, completing the TPC-H
query-shape lattice over the testdata star schema (which has no
partsupp / shipmode / receiptdate — stand-ins noted per query):
full-pushdown scan aggregate (Q6), profit by nation/year (Q9),
scalar-subquery share threshold (Q11), conditional lateness counts
(Q12), left-outer two-level histogram (Q13), argmax-by-scalar-subquery
(Q15), disjunctive OR-of-ANDs predicates (Q19), dominant-supplier
semi-join chain (Q20), and the sole-late-supplier exists/not-exists
combination (Q21) re-expressed as one aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B29

_B29_ORACLE = f"""
SELECT {sql_round("COALESCE(SUM(l_extendedprice * l_discount), 0)", 2)}
         AS discount_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
"""


@register("band_filtered_revenue", oracle=_B29_ORACLE)
def band_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-pushdown scan aggregate (TPC-H Q6 shape): revenue delta
    from a discount band over one ship-year, small quantities only.

    Scale shape: the entire query is ONE map-side-combined aggregate
    over a scan with every predicate pushed to parquet (date range,
    discount band, quantity cap) and a 3-column ReadSchema — the
    canonical "touch the least data possible" plan. No join, no wide
    shuffle, a single scalar out.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            round_eps(
                F.coalesce(
                    F.sum(F.col("l_extendedprice") * F.col("l_discount")),
                    F.lit(0.0),
                ),
                2,
            ).alias("discount_revenue")
        )
    )


# ---------------------------------------------------------------- B30

PROFIT_PART_PATTERN = "%widget%"
COST_FACTOR = 0.6  # retail-price fraction standing in for ps_supplycost

_B30_ORACLE = f"""
SELECT n_name AS supp_nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS profit_year,
       {sql_round(
           "SUM(l_extendedprice * (1 - l_discount)"
           f" - {COST_FACTOR} * p_retailprice * l_quantity)", 2)} AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '{PROFIT_PART_PATTERN}'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


@register("part_profit_by_nation", oracle=_B30_ORACLE)
def part_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line profit per supplier nation and year (TPC-H Q9
    shape), with ``COST_FACTOR * p_retailprice * l_quantity`` standing
    in for the missing partsupp supply cost.

    Scale shape: the part-name filter rides the broadcast part join and
    SHRINKS the fact stream before the one big-big join (orders on
    orderkey); supplier→nation broadcasts; the (nation, year) aggregate
    is map-side combined to ~|nations|·|years| rows.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like(PROFIT_PART_PATTERN)
    ).select("p_partkey", "p_retailprice")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp_n = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - COST_FACTOR * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "supp_nation",
            F.year("o_orderdate").cast("bigint").alias("profit_year"),
        )
        .agg(round_eps(F.sum(profit), 2).alias("profit"))
        .orderBy(F.asc("supp_nation"), F.desc("profit_year"))
    )


# ---------------------------------------------------------------- B31

VALUE_REGION = "EUROPE"
VALUE_FRACTION = 0.005

_B31_ORACLE = f"""
WITH part_value AS (
  SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{VALUE_REGION}'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, {sql_round("val", 2)} AS part_value
FROM part_value
WHERE val > (SELECT SUM(val) * {VALUE_FRACTION} FROM part_value)
ORDER BY part_value DESC, l_partkey
"""


@register("important_part_value", oracle=_B31_ORACLE)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-threshold part screening (TPC-H Q11 shape): parts whose
    shipped value from one region's suppliers exceeds a fixed fraction
    of that region's total shipped value.

    Scale shape: the region filter broadcasts a tiny supplier set onto
    the fact scan; ONE per-part aggregate feeds both sides — the global
    total is a second aggregate OF THE AGGREGATE (|parts| rows, not a
    fact rescan) attached as a broadcast scalar.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == VALUE_REGION
    ).select("r_regionkey")
    supp_in_region = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    part_value = (
        lineitem.join(
            F.broadcast(supp_in_region), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("val"))
    )
    total = part_value.agg(
        (F.sum("val") * VALUE_FRACTION).alias("threshold")
    )
    return (
        part_value.transform(scalars(total))
        .where(F.col("val") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            round_eps(F.col("val"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


# ---------------------------------------------------------------- B32

SHIP_LAG_DAYS = 60
HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")

_B32_ORACLE = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL {SHIP_LAG_DAYS} DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("late_lines_by_returnflag", oracle=_B32_ORACLE)
def late_lines_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateness-by-class counts (TPC-H Q12 shape), with l_returnflag
    standing in for the missing l_shipmode: per flag, how many
    late-shipped lines belonged to high- vs low-priority orders.

    Scale shape: the shipdate window is pushed to the scan; one big-big
    join on orderkey carries the ship-lag predicate; both counts come
    from ONE conditional aggregate pass (3 output rows).
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    ).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    is_high = F.col("o_orderpriority").isin(*HIGH_PRIORITIES)
    return (
        lineitem.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & F.expr(
                f"l_shipdate > o_orderdate + INTERVAL {SHIP_LAG_DAYS} DAYS"
            ),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------- B33

EXCLUDED_PRIORITY = "4-NOT SPECIFIED"

_B33_ORACLE = f"""
WITH per_cust AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '{EXCLUDED_PRIORITY}'
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("customer_order_histogram", oracle=_B33_ORACLE)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-distribution histogram (TPC-H Q13 shape): how many
    customers placed exactly N qualifying orders — including the
    zero-order customers a plain inner join would silently drop.

    Scale shape: the priority exclusion lives in the LEFT JOIN
    condition (not a post-filter, which would turn the join inner);
    level 1 aggregates to |customers| rows, level 2 to |distinct
    counts| rows — both map-side combined, no fact rescan.
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != EXCLUDED_PRIORITY),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------- B34

TOP_SUPP_START = "1998-01-01"
TOP_SUPP_END = "1998-04-01"

_B34_ORACLE = f"""
WITH supp_rev AS (
  SELECT l_suppkey,
         {sql_round("SUM(l_extendedprice * (1 - l_discount))", 2)}
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOP_SUPP_START}'
    AND l_shipdate <  TIMESTAMP '{TOP_SUPP_END}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM supp_rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM supp_rev)
ORDER BY s_suppkey
"""


@register("top_revenue_supplier", oracle=_B34_ORACLE)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-revenue supplier selection (TPC-H Q15 shape): the
    supplier(s) whose quarterly revenue equals the global maximum —
    ties preserved, matching the view-plus-scalar-subquery semantics.

    Scale shape: the quarter filter is pushed to the scan; per-supplier
    revenue is one map-side-combined aggregate (|suppliers| rows); the
    max attaches as a GLOBAL WINDOW over that already-tiny frame, so
    the fact table is scanned exactly once by construction (the
    broadcast-scalar formulation plans two scans that only AQE
    exchange-reuse collapses). Revenue is rounded BEFORE the equality
    so cross-engine ulp noise cannot flip tie membership.
    """
    from pyspark.sql.window import Window

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    supp_rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(TOP_SUPP_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(TOP_SUPP_END).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(round_eps(F.sum(rev), 2).alias("total_rev"))
    )
    best = F.max("total_rev").over(Window.partitionBy(F.lit(1)))
    return (
        supp_rev.withColumn("best_rev", best)
        .where(F.col("total_rev") == F.col("best_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------- B35

_B35_BANDS = (
    ("Brand#1", 1, 10, 1, 20),
    ("Brand#2", 11, 20, 10, 30),
    ("Brand#3", 21, 30, 20, 40),
)

_B35_PRED_SQL = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {s0} AND {s1}"
    f" AND l_quantity BETWEEN {q0} AND {q1})"
    for b, s0, s1, q0, q1 in _B35_BANDS
)

_B35_ORACLE = f"""
SELECT {sql_round("COALESCE(SUM(l_extendedprice * (1 - l_discount)), 0)", 2)}
         AS band_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_B35_PRED_SQL}
"""


@register("disjunctive_brand_revenue", oracle=_B35_ORACLE)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive OR-of-ANDs predicate aggregate (TPC-H Q19 shape):
    revenue from three (brand, size-band, quantity-band) clauses that
    each mix part attributes with lineitem attributes.

    Scale shape: the brand/size half of every clause is pre-filtered
    into the broadcast part build (part rows outside ALL bands never
    enter the hash table); the mixed OR evaluates post-join inside
    codegen; one scalar aggregate out, fact scanned once.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part_any_band = None
    for b, s0, s1, _q0, _q1 in _B35_BANDS:
        clause = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s0, s1)
        )
        part_any_band = clause if part_any_band is None else (part_any_band | clause)
    part = load_table(spark, sf_dir, "part").where(part_any_band).select(
        "p_partkey", "p_brand", "p_size"
    )
    full_pred = None
    for b, s0, s1, q0, q1 in _B35_BANDS:
        clause = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s0, s1)
            & F.col("l_quantity").between(q0, q1)
        )
        full_pred = clause if full_pred is None else (full_pred | clause)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(full_pred)
        .agg(
            round_eps(
                F.coalesce(F.sum(rev), F.lit(0.0)), 2
            ).alias("band_revenue")
        )
    )


# ---------------------------------------------------------------- B36

DOMINANT_PART_PATTERN = "cold%"
DOMINANT_YEAR = 1997
DOMINANT_SHARE = 0.5

_B36_ORACLE = f"""
WITH pair_qty AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{DOMINANT_PART_PATTERN}'
    AND EXTRACT(YEAR FROM l_shipdate) = {DOMINANT_YEAR}
  GROUP BY l_partkey, l_suppkey
),
part_total AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM pair_qty GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name, n_name AS supp_nation
FROM pair_qty
JOIN part_total USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE qty > {DOMINANT_SHARE} * total_qty
ORDER BY s_suppkey
"""


@register("dominant_part_shippers", oracle=_B36_ORACLE)
def dominant_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-supplier screening (TPC-H Q20 shape): suppliers who
    shipped more than half of some filtered part's yearly volume —
    the availqty-vs-half-demand semi-join chain, with observed shipped
    quantity standing in for ps_availqty.

    Scale shape: name filter rides the broadcast part join and the
    year predicate is pushed to the scan; per-(part, supplier) totals
    are ONE aggregate; the per-part denominator is an aggregate OF that
    aggregate (never a fact rescan) broadcast back onto it; the final
    distinct is over |suppliers| rows.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    ).where(F.year("l_shipdate") == DOMINANT_YEAR)
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like(DOMINANT_PART_PATTERN)
    ).select("p_partkey")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    pair_qty = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = pair_qty.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty")
    )
    supp_n = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    return (
        pair_qty.join(F.broadcast(part_total), "l_partkey")
        .where(F.col("qty") > DOMINANT_SHARE * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "supp_nation")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------- B37

SOLE_LATE_DAYS = 90

_B37_ORACLE = f"""
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_shipdate >
                 o_orderdate + INTERVAL {SOLE_LATE_DAYS} DAY
               THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN l_shipdate >
                 o_orderdate + INTERVAL {SOLE_LATE_DAYS} DAY
             THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register("sole_late_supplier", oracle=_B37_ORACLE)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sole-blame lateness attribution (TPC-H Q21 shape): for finished
    multi-supplier orders, count per supplier the orders where THEY
    were the only late shipper — the classic EXISTS(other supplier)
    AND NOT EXISTS(other late supplier) pair.

    Scale shape: the reference formulation needs two correlated
    self-joins of lineitem; here both existentials collapse into ONE
    per-order aggregate (distinct suppliers, distinct late suppliers,
    and the argmax late supplier in the same pass), so lineitem is
    scanned and shuffled exactly once. `MAX(CASE...)` is exact when
    n_late = 1 — the only rows kept.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    late = F.expr(
        f"l_shipdate > o_orderdate + INTERVAL {SOLE_LATE_DAYS} DAYS"
    )
    per_order = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(
                F.when(late, F.col("l_suppkey"))
            ).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supplier), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )
