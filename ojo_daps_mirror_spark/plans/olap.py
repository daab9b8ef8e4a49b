"""Core OLAP breadth (SURVEY.md §2.B).

The reference's query layer was a MySQL database queried through
SQLAlchemy (ojd_daps/dqa/data_getters.py); these plans prove the same
relational capability — multi-way joins, aggregate batteries, windowed
ranking, sessionization — as Catalyst-optimized DataFrame plans.

Scale notes: small dimensions (region, nation, supplier, customer at low
SF) are explicitly broadcast; aggregations are partial (map-side combine)
by construction of groupBy; date filters sit directly on the scan so
parquet row-group pruning applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import register

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                  AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                             AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                  AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                             AS avg_price,
  ROUND(AVG(l_discount), 4)                                  AS avg_disc,
  COUNT(*)                                                   AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: aggregate battery with a pushed-down date filter."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q3_ORACLE = """
SELECT
  l_orderkey,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d')                 AS o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-03-15'
  AND l_shipdate  > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-way join, aggregate, top-10.

    customer is the small side → broadcast; lineitem⨝orders shuffles on
    the order key only after both sides are filtered.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit("1998-03-15").cast("date")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q5_ORACLE = """
SELECT
  n_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate <  DATE '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier", oracle=_Q5_ORACLE)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the region dimension.

    region/nation/supplier/customer are broadcast; only
    lineitem⨝orders is a shuffle join.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    asia_nations = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        lineitem.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


_TOP_PARTS_ORACLE = """
WITH part_rev AS (
  SELECT p_brand, p_partkey, p_name,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey, p_name
), ranked AS (
  SELECT p_brand, p_partkey, p_name, revenue,
         ROW_NUMBER() OVER (
           PARTITION BY p_brand ORDER BY revenue DESC, p_partkey
         ) AS rank_in_brand
  FROM part_rev
)
SELECT p_brand, p_partkey, p_name, revenue, rank_in_brand
FROM ranked
WHERE rank_in_brand <= 3
ORDER BY p_brand, rank_in_brand
"""


@register("top_parts_by_revenue", oracle=_TOP_PARTS_ORACLE)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function ranking: top-3 parts by revenue within each brand."""
    from pyspark.sql.window import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    part_rev = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        part_rev.withColumn("rank_in_brand", F.row_number().over(w))
        .where(F.col("rank_in_brand") <= 3)
        .orderBy("p_brand", "rank_in_brand")
    )


_PIVOT_ORACLE = """
SELECT
  strftime(ts, '%Y-%m-%d') AS day,
  COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
  COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
  COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
  ROUND(SUM(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase_value
FROM events
GROUP BY day
ORDER BY day
"""


@register("events_pivot_daily", oracle=_PIVOT_ORACLE)
def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily × event_type pivot as conditional aggregation.

    Conditional agg instead of ``.pivot()`` keeps the column set static
    (plan-stable at 100 TB; no driver-side distinct-values scan).
    """
    events = load_table(spark, sf_dir, "events")
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")  # noqa: E731
    return (
        events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .agg(
            cnt("click"),
            cnt("view"),
            cnt("purchase"),
            cnt("signup"),
            cnt("error"),
            F.round(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 2
            ).alias("purchase_value"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------- B5

_SESSIONIZE_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM ordered
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1e6 + 1e-9, 3)
         AS duration_secs
FROM sessions
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


@register("events_sessionize", oracle=_SESSIONIZE_ORACLE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessionization → per-session rollup.

    One (user, time) shuffle feeds both window functions and the final
    aggregation (same partitioning reused across stages).
    """
    from ..functions.rounding import round_eps
    from ..operators.sessionize import sessionize

    events = load_table(spark, sf_dir, "events")
    sess = sessionize(events)
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            round_eps(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1e6, 3
            ).alias("duration_secs"),
        )
        .orderBy("user_id", "session_idx")
    )


# ---------------------------------------------------------------- B7

_ASOF_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
ORDER BY e.event_id
"""


@register("as_of_join", oracle=_ASOF_ORACLE)
def as_of_join_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the most recent order of the same user at/before
    the event time — the custom as-of operator (operators/asof.py),
    verified against DuckDB's native ASOF JOIN."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    from ..operators.asof import asof_join

    joined = asof_join(
        probe=events,
        build=orders,
        key="user_id",
        build_key="o_custkey",
        probe_time="ts",
        build_time="o_orderdate",
        build_values=["o_orderkey", "o_orderdate"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
    ).orderBy("event_id")


# ---------------------------------------------------------------- B8

_RETENTION_ORACLE = """
WITH weeks AS (
  SELECT user_id, date_trunc('week', ts)::DATE AS week FROM events GROUP BY ALL
),
cohorts AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       (week - cohort_week) // 7 AS week_offset,
       COUNT(*) AS n_users
FROM weeks JOIN cohorts USING (user_id)
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@register("user_retention", oracle=_RETENTION_ORACLE)
def user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users active in week (cohort + offset).
    Two narrow aggregations; the cohort lookup is a broadcast join."""
    events = load_table(spark, sf_dir, "events")
    weeks = (
        events.select(
            "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
        )
        .distinct()
    )
    cohorts = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(F.broadcast(cohorts), "user_id")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
