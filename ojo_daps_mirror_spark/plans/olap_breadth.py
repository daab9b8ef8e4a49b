"""OLAP breadth plans (SURVEY.md §2 B9–B13).

The reference's MySQL query layer gives its users the full relational
toolbox (EXISTS/NOT EXISTS filters in dqa/data_getters.py, grouped
rollup-style indicator tables in flows/aggregate/*). These plans cover
the join/aggregation shapes the B1–B8 set didn't: semi join, anti join,
ROLLUP grouping sets, an equi-key banded range join, and sketch-based
approximate distinct counting (the only sane COUNT(DISTINCT) at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B9

BIG_LINE_QTY = 45

_B9_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= {BIG_LINE_QTY}
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("orders_with_big_lines", oracle=_B9_ORACLE)
def orders_with_big_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style filter: orders having at least one high-quantity
    line, counted by priority (TPC-H Q4 shape). A LEFT SEMI join keeps
    the probe side unduplicated — no post-join distinct, and the filter
    on lineitem is pushed to its scan before the shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = lineitem.where(F.col("l_quantity") >= BIG_LINE_QTY).select("l_orderkey")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------- B10

_B10_ORACLE = """
SELECT p_partkey, p_name
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
)
ORDER BY p_partkey
"""


@register("parts_never_ordered", oracle=_B10_ORACLE)
def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS: parts that never appear in lineitem, as a LEFT ANTI
    join. part is the small side, so AQE turns this into a broadcast
    anti join — lineitem streams through once, nothing materialises."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    return (
        part.join(lineitem, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------- B11

_B11_ORACLE = """
SELECT COALESCE(r_name, 'ALL') AS region,
       COALESCE(n_name, 'ALL') AS nation,
       GROUPING(r_name, n_name) AS grp,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY grp, region, nation
"""


@register("revenue_rollup", oracle=_B11_ORACLE)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) revenue with subtotal + grand-total rows
    (the multi-grain indicator tables flows/aggregate/* publish, in one
    pass). Spark expands the grouping sets map-side, so lineitem is
    scanned and partially aggregated once for all three grains."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        lineitem.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().alias("grp"),
            round_eps(F.sum(rev), 2).alias("revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "grp",
            "revenue",
        )
        .orderBy("grp", "region", "nation")
    )


# ---------------------------------------------------------------- B12

FOLLOW_DAYS = 30

_B12_ORACLE = f"""
SELECT a.o_orderkey, COUNT(b.o_orderkey) AS n_follow
FROM orders a
LEFT JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate > a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL {FOLLOW_DAYS} DAY
GROUP BY a.o_orderkey
ORDER BY a.o_orderkey
"""


@register("repeat_orders_30d", oracle=_B12_ORACLE)
def repeat_orders_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: per order, how many follow-up orders the same
    customer placed within 30 days. The equi key (custkey) drives the
    shuffle; the date band is a post-join filter within each key group,
    so this stays a sort-merge join — never a cartesian. Skewed
    customers are AQE's problem (skew-join split), not a plan rewrite."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.alias("a")
    b = orders.alias("b")
    cond = (
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("b.o_orderdate") > F.col("a.o_orderdate"))
        & (
            F.col("b.o_orderdate")
            <= F.col("a.o_orderdate") + F.expr(f"INTERVAL {FOLLOW_DAYS} DAYS")
        )
    )
    return (
        a.join(b, cond, "left")
        .groupBy(F.col("a.o_orderkey").alias("o_orderkey"))
        .agg(F.count(F.col("b.o_orderkey")).alias("n_follow"))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------- B13


@register("approx_distinct_users")  # rows-only: sketch is approximate by design
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type
    (approx_count_distinct, rsd 1%). At 100 TB an exact COUNT(DISTINCT)
    is a full shuffle of every key; the HLL sketch is fixed-size,
    map-side mergeable, and one pass. Accuracy vs the exact count is
    asserted in tests/test_olap_breadth.py."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- B14

SALT_BUCKETS = 8

_B14_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice) + 1e-9, 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("skew_salted_join", oracle=_B14_ORACLE)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-proof join: explicit salting, verified against the plain
    join's result.

    The skew pattern for when AQE's runtime skew-join split isn't
    available (e.g. a non-shuffle-joinable build side, or deterministic
    partitioning requirements): replicate each dimension row into
    SALT_BUCKETS copies keyed (key, salt), give each fact row a
    deterministic salt from a hash of its own row, and join on the
    composite key — a hot customer's orders now spread over
    SALT_BUCKETS partitions instead of one straggler task. The
    aggregate is salt-invariant, so the DuckDB oracle is simply the
    unsalted join: correctness of the rewrite is what's being tested.

    At 100 TB: salt only the keys the stats call hot (here all keys for
    test determinism); partial aggregation still combines map-side, so
    the extra dimension copies cost |dim| × SALT_BUCKETS broadcast
    bytes, not a shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    salted_dim = customer.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    salted_fact = orders.withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(SALT_BUCKETS)).cast("int")
    )
    return (
        salted_fact.join(
            salted_dim,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (salted_fact["salt"] == salted_dim["salt"]),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice") + 1e-9, 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------- B15

_B15_ORACLE = """
SELECT COALESCE(r_name, 'ALL') AS region,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice) + 1e-9, 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, o_orderpriority)
ORDER BY region, priority
"""


@register("revenue_cube", oracle=_B15_ORACLE)
def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(region, priority): all four grouping grains in ONE pass —
    one shuffle produces total, per-region, per-priority and per-cell
    aggregates simultaneously (Expand + single hash aggregate), where
    naive re-aggregation would scan the fact table four times. The
    companion of B11's ROLLUP with the full grain lattice.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.cube("r_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice") + 1e-9, 2).alias("revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
        .orderBy("region", "priority")
    )


# ---------------------------------------------------------------- B16

ROLLING_DAYS = 28

_B16_ORACLE = f"""
WITH daily AS (
  SELECT o_orderpriority AS priority, o_orderdate::DATE AS d, COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT priority, strftime(d, '%Y-%m-%d') AS d, n_orders,
       ROUND(AVG(n_orders) OVER (
         PARTITION BY priority ORDER BY d
         RANGE BETWEEN INTERVAL {ROLLING_DAYS - 1} DAY PRECEDING AND CURRENT ROW
       ) + 1e-9, 4) AS avg_{ROLLING_DAYS}d
FROM daily
ORDER BY priority, d
"""


@register("rolling_28d_volume", oracle=_B16_ORACLE)
def rolling_28d_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """28-day rolling average of daily ad volume per priority group —
    the reference's "4-week average" indicator smoothing
    (flows/aggregate/weekly_stock.py index window) generalised to a
    time-RANGE window frame.

    Scale shape: the fact table collapses to (priority, day) partials
    in one map-side-combined shuffle FIRST; the RANGE window then runs
    over ~|priorities|×|days| rows — window state never touches raw
    facts. A rows-frame would be wrong (gaps in days); the range frame
    is gap-correct by construction.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = (
        Window.partitionBy("priority")
        .orderBy(F.unix_date(F.col("d")))
        .rangeBetween(-(ROLLING_DAYS - 1), 0)
    )
    return daily.select(
        "priority",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n_orders",
        F.round(F.avg("n_orders").over(w) + 1e-9, 4).alias(f"avg_{ROLLING_DAYS}d"),
    ).orderBy("priority", "d")
