"""OLAP breadth plans, third sweep (SURVEY.md §2 B17–B20).

Classic decision-support shapes the B1–B16 set didn't cover, each the
skeleton of a reference query pattern (dqa/data_getters.py filters ads
against per-group statistics; flows/aggregate/* compute share-of-total
indicators): correlated aggregate filter (TPC-H Q17), group-HAVING join
chain (Q18), scalar-subquery + anti join (Q22), and share-of-total
conditional aggregation across a 5-way join (Q8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B17

SMALL_QTY_FRAC = 0.5  # "small" = below half the part's average quantity

_B17_ORACLE = f"""
WITH pa AS (
  SELECT l_partkey, AVG(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_small_lines,
       {sql_round("SUM(l_extendedprice)", 2)} AS small_qty_revenue
FROM lineitem l
JOIN pa ON l.l_partkey = pa.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < {SMALL_QTY_FRAC} * pa.avg_qty
GROUP BY p_brand
ORDER BY p_brand
"""


@register("small_qty_part_revenue", oracle=_B17_ORACLE)
def small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate filter (TPC-H Q17 shape): revenue carried by
    lineitems whose quantity is below half their part's average, per
    brand.

    The correlated subquery decorrelates to one aggregate of the fact
    table keyed by part — |parts| rows, orders of magnitude smaller
    than the facts — joined back on the same key. At test scale AQE
    broadcasts the aggregate; at 100 TB both sides shuffle on
    l_partkey, and the fact scan reads only 3 columns (checked in the
    plan audits). The part dimension joins broadcast either way.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = lineitem.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        lineitem.join(per_part, "l_partkey")
        .where(F.col("l_quantity") < SMALL_QTY_FRAC * F.col("avg_qty"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            round_eps(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------- B18

BIG_ORDER_QTY = 250  # ~p99 of per-order total quantity on the testdata

_B18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) >= {BIG_ORDER_QTY}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       {sql_round("o.o_totalprice", 2)} AS total_price,
       {sql_round("big.total_qty", 2)} AS total_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_orderkey
"""


@register("large_volume_customers", oracle=_B18_ORACLE)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-HAVING join chain (TPC-H Q18 shape): customers behind
    orders whose total line quantity clears a high threshold.

    The HAVING filter runs on the first aggregate's output, so only
    ~1% of orderkeys survive into the joins: the surviving set is
    broadcast to orders, and that (still tiny) result is broadcast to
    customer — after the one fact-table aggregate, nothing else
    shuffles at any scale.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") >= BIG_ORDER_QTY)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            round_eps(F.col("o_totalprice"), 2).alias("total_price"),
            round_eps(F.col("total_qty"), 2).alias("total_qty"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------- B19

DORMANT_CUTOFF = "2001-01-01"  # dormant = no orders on/after this date

_B19_ORACLE = f"""
WITH thr AS (
  SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {sql_round("SUM(c_acctbal)", 2)} AS total_bal
FROM customer c, thr
WHERE c.c_acctbal > thr.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= '{DORMANT_CUTOFF}')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("dormant_rich_customers", oracle=_B19_ORACLE)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + anti join (TPC-H Q22 shape): above-average-
    balance customers with no orders since the cutoff, aggregated by
    segment.

    The scalar threshold is a 1-row aggregate cross-joined in (a
    broadcast, never a shuffle). The NOT EXISTS is a LEFT ANTI join
    against the date-filtered orders custkey projection: the date
    predicate and column pruning both reach the orders scan, and the
    anti join shuffles both sides on custkey at full scale — the
    customer side already cut down by the balance predicate before it
    moves.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= DORMANT_CUTOFF)
        .select("o_custkey")
    )
    thr = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.transform(scalars(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            round_eps(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------- B20

SHARE_REGION = "EUROPE"
SHARE_NATION = "NATION_3"  # a EUROPE member on the testdata geography

_B20_ORACLE = f"""
SELECT EXTRACT(year FROM o.o_orderdate)::BIGINT AS order_year,
       {sql_round(
           "SUM(CASE WHEN sn.n_name = '" + SHARE_NATION + "' "
           "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) "
           "/ SUM(l.l_extendedprice * (1 - l.l_discount))", 4)}
         AS mkt_share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = '{SHARE_REGION}'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
GROUP BY order_year
ORDER BY order_year
"""


@register("nation_market_share", oracle=_B20_ORACLE)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total conditional aggregation (TPC-H Q8 shape): one
    nation's yearly share of revenue sold into a region — the same
    share-within-group statistic as flows/aggregate/
    skill_demand_snapshot.py, computed across a 5-way join.

    Join order is chosen for scale: nation⋈region prunes customers
    region-side before the orders join; supplier⋈nation is broadcast
    onto the fact table; the only big-big shuffle is lineitem⋈orders
    on orderkey (bucketing both on orderkey removes even that — see
    tests/test_sources_sinks.py D3). Numerator and denominator come
    out of ONE aggregate pass via conditional sum, not two scans.
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
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )

    eur_nations = nation.join(
        F.broadcast(region.where(F.col("r_name") == SHARE_REGION)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    eur_custs = customer.join(
        F.broadcast(eur_nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("c_custkey")
    supn = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(
            orders.join(eur_custs, F.col("o_custkey") == F.col("c_custkey"), "left_semi"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            round_eps(
                F.sum(F.when(F.col("supp_nation") == SHARE_NATION, rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------- B21

FUNNEL_STEPS = ("view", "click", "purchase")

_B21_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT '1_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
UNION ALL
SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM s2
UNION ALL
SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM s3
ORDER BY step
"""


@register("funnel_conversion", oracle=_B21_ORACLE)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion counts: users who viewed, then clicked
    strictly after their first view, then purchased strictly after that
    first qualifying click — the sequential-pattern query behind every
    product-analytics funnel.

    Each stage is a conditional MIN aggregate of the event stream keyed
    by user, joined to the previous stage's frontier. The per-stage
    frames shrink monotonically (stage N ⊆ stage N−1) and carry 2
    columns, so stages 2 and 3 broadcast their frontier into a filtered
    re-scan of events: the event table is never shuffled, only
    aggregated with map-side combine per stage. At 100 TB the frontier
    frames (≤ |users|) shuffle-join instead — still ~0.1% of the fact
    bytes.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = (
        events.where(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.where(F.col("event_type") == FUNNEL_STEPS[1])
        .join(F.broadcast(s1), "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.where(F.col("event_type") == FUNNEL_STEPS[2])
        .join(F.broadcast(s2), "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [
        s.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(label).alias("step"), "n_users"
        )
        for label, s in (("1_view", s1), ("2_click", s2), ("3_purchase", s3))
    ]
    return counts[0].unionByName(counts[1]).unionByName(counts[2]).orderBy("step")


# ---------------------------------------------------------------- B22

_B22_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_type AS state, ts, event_id
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, state,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       COALESCE(strftime(LEAD(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id),
                         '%Y-%m-%d %H:%M:%S'), 'open') AS valid_to
FROM changes
ORDER BY user_id, valid_from
"""


@register("scd2_user_state", oracle=_B22_ORACLE)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event log:
    compress each user's event-type run-lengths into validity intervals
    [valid_from, valid_to), open-ended on the current state — the
    standard warehouse dimension-history pattern.

    One window partitioning (user_id, ordered by ts with the unique
    event_id as tiebreak) serves both the change detection (LAG) and
    the interval close (LEAD on the change rows): a single shuffle by
    user_id, already required by the semantics, and the second window
    reuses the first's partitioning — Catalyst plans no extra exchange
    (asserted in tests/test_plans.py).
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    )
    return (
        changes.withColumn("next_ts", F.lead("ts").over(w))
        .select(
            "user_id",
            "state",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.coalesce(
                F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("open")
            ).alias("valid_to"),
        )
        .orderBy("user_id", "valid_from")
    )
