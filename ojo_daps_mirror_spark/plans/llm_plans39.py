"""Thirty-ninth sweep (SURVEY.md §2 B78–B81).

Spark 4 SQL surfaces — recursive CTE graph reachability and SQL pipe
syntax — plus two classical distribution statistics: the two-sample
Kolmogorov–Smirnov test and per-segment Gini concentration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.lineage import cut_lineage
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B78

REACH_SEED = 0  # seed nationkey
REACH_DEPTH = 3

_B78_RECURSIVE = f"""
WITH RECURSIVE w(node, depth) AS (
  SELECT CAST({REACH_SEED} AS BIGINT), 0
  UNION ALL
  SELECT e.dst, w.depth + 1
  FROM w JOIN trade_edges e ON e.src = w.node
  WHERE w.depth < {REACH_DEPTH}
)
SELECT node, CAST(MIN(depth) AS INT) AS level
FROM w GROUP BY node ORDER BY node
"""

_B78_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
),
trade_edges AS (SELECT src, dst FROM pairs),
w AS (
  WITH RECURSIVE r(node, depth) AS (
    SELECT CAST({REACH_SEED} AS BIGINT), 0
    UNION ALL
    SELECT e.dst, r.depth + 1
    FROM r JOIN trade_edges e ON e.src = r.node
    WHERE r.depth < {REACH_DEPTH}
  ) SELECT node, depth FROM r
)
SELECT node, CAST(MIN(depth) AS INT) AS level
FROM w GROUP BY node ORDER BY node
"""


@register("recursive_nation_reach", oracle=_B78_ORACLE)
def recursive_nation_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-graph reachability via Spark 4's RECURSIVE CTE
    (SPARK-24497) — min-hop levels from a seed nation over the
    distinct supplier-nation→customer-nation edge list. The
    DECLARATIVE twin of C89's Pregel-style DataFrame loop: the engine
    schedules the fixed point, no driver iteration.

    Scale shape: the edge list reduces at nation grain (≤25² rows)
    from one 4-way join, so recursion runs on a dimension-scale
    frame; Spark only supports UNION ALL recursion, so the depth
    guard bounds path re-expansion and MIN(depth) collapses paths to
    levels — the identical formulation the DuckDB oracle runs.
    """
    for t in ("lineitem", "orders", "customer", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"b78_{t}")
    edges = spark.sql(
        """
        SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        FROM b78_lineitem l
        JOIN b78_orders o ON l.l_orderkey = o.o_orderkey
        JOIN b78_customer c ON o.o_custkey = c.c_custkey
        JOIN b78_supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey <> c.c_nationkey
        """
    )
    # Materialise the edge list before recursing: the recursive CTE
    # joins the view per iteration step, and an unmaterialised view
    # re-executes the 4-way fact join each time (4× the scan work at
    # depth 3). The checkpointed 25²-row frame makes recursion free.
    edges.transform(cut_lineage).createOrReplaceTempView("trade_edges")
    return spark.sql(_B78_RECURSIVE)


# ---------------------------------------------------------------- B79

_B79_PIPE = """
FROM b79_orders
|> WHERE o_orderdate >= DATE '1994-01-01'
|> EXTEND year(o_orderdate) AS yr
|> AGGREGATE COUNT(*) AS n_orders,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
   GROUP BY yr, o_orderpriority
|> EXTEND ROUND(cents / 100.0 / n_orders + 1e-9, 4) AS avg_price
|> SELECT yr, o_orderpriority AS priority, n_orders, avg_price
|> ORDER BY yr, priority
"""

_B79_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_round(
           "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 / COUNT(*)",
           4)} AS avg_price
FROM orders
WHERE o_orderdate >= DATE '1994-01-01'
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("pipe_syntax_summary", oracle=_B79_ORACLE)
def pipe_syntax_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same filter→derive→aggregate→derive→project chain written
    in Spark 4's SQL PIPE syntax (|>, SPARK-49555) — the linear query
    form that compiles to the identical Catalyst plan as nested SQL,
    proving the new surface end-to-end against a classic-SQL oracle.
    Cents-sum math keeps the mean exact up to one division.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("b79_orders")
    out = spark.sql(_B79_PIPE)
    return out.select(
        F.col("yr").cast("bigint").alias("yr"),
        "priority",
        "n_orders",
        "avg_price",
    )


# ---------------------------------------------------------------- B80

# KS critical scaling at alpha=0.05: c = 1.358 (literal spec)
KS_C_ALPHA = 1.358


_B80_ORACLE = f"""
WITH samples AS (
  SELECT (user_id % 2 = 1) AS treated,
         CAST(ROUND(value * 10000) AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
),
counts AS (
  SELECT v,
         CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM samples GROUP BY v
),
tot AS (
  SELECT v, c1, c2,
         CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS f1,
         CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS f2,
         CAST(SUM(c1) OVER () AS BIGINT) AS n1,
         CAST(SUM(c2) OVER () AS BIGINT) AS n2
  FROM counts
),
stat AS (
  SELECT MAX(abs(f1 * 1.0 / n1 - f2 * 1.0 / n2)) AS d,
         MAX(n1) AS n1, MAX(n2) AS n2
  FROM tot
)
SELECT n1, n2, {sql_round('d', 6)} AS d_stat,
       {sql_round(f'{KS_C_ALPHA!r} * sqrt((n1 + n2) * 1.0 / (n1 * n2))', 6)}
         AS d_crit,
       CASE WHEN d > {KS_C_ALPHA!r} * sqrt((n1 + n2) * 1.0 / (n1 * n2))
            THEN 1 ELSE 0 END AS reject
FROM stat
"""


@register("ks_test_two_sample", oracle=_B80_ORACLE)
def ks_test_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test on purchase values between
    the treated/control split: D = max |F̂₁ − F̂₂| with the α=0.05
    rejection threshold — the distribution-shift detector that
    complements the mean-only A/B z-test (B61).

    Scale shape: the stream collapses to DISTINCT-VALUE grain in one
    conditional aggregate; the two empirical CDFs are ordered
    cumulative windows over that (bounded) frame; integer cumulative
    counts make both CDFs exact, with one division per row and a max.
    """
    samples = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % 2 == 1).alias("treated"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v"),
        )
    )
    counts = samples.groupBy("v").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(F.col("treated"), 0).otherwise(1)).cast("bigint").alias("c2"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    tot = counts.select(
        F.sum("c1").over(w_cum).cast("bigint").alias("f1"),
        F.sum("c2").over(w_cum).cast("bigint").alias("f2"),
        F.sum("c1").over(w_all).cast("bigint").alias("n1"),
        F.sum("c2").over(w_all).cast("bigint").alias("n2"),
    )
    stat = tot.agg(
        F.max(
            F.abs(F.col("f1") * 1.0 / F.col("n1") - F.col("f2") * 1.0 / F.col("n2"))
        ).alias("d"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    crit = F.lit(KS_C_ALPHA) * F.sqrt(
        (F.col("n1") + F.col("n2")) * 1.0 / (F.col("n1") * F.col("n2"))
    )
    return stat.select(
        "n1",
        "n2",
        round_eps(F.col("d"), 6).alias("d_stat"),
        round_eps(crit, 6).alias("d_crit"),
        F.when(F.col("d") > crit, 1).otherwise(0).alias("reject"),
    )


# ---------------------------------------------------------------- B81

_B81_ORACLE = f"""
WITH rev AS (
  SELECT c.c_mktsegment AS segment, c.c_custkey,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT segment, cents,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY cents, c_custkey) AS i,
         COUNT(*) OVER (PARTITION BY segment) AS n,
         CAST(SUM(cents) OVER (PARTITION BY segment) AS BIGINT) AS s
  FROM rev
)
SELECT segment,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       {sql_round('MAX(s) / 100.0', 2)} AS total_revenue,
       {sql_round(
           'SUM((2 * i - n - 1) * cents) * 1.0 / (MAX(n) * MAX(s))', 6)}
         AS gini
FROM ranked GROUP BY segment ORDER BY segment
"""


@register("gini_concentration", oracle=_B81_ORACLE)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Gini coefficient of customer revenue — the
    inequality/concentration measure behind "do a few whales carry
    the segment" (the Lorenz-curve complement of C50's HHI, which
    measures source shares, not within-group skew). Uses the exact
    sorted-sample identity G = Σ(2i−n−1)xᵢ / (n·Σx).

    Scale shape: one fact-side aggregate to customer grain, rank and
    sums as SEGMENT-partitioned windows (distributes on the segment
    key), and the whole numerator in integer cents — exact bigint
    math until the single final division.
    """
    rev = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("c_custkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.partitionBy("segment")
    w_rank = Window.partitionBy("segment").orderBy("cents", "c_custkey")
    ranked = rev.select(
        "segment",
        "cents",
        F.row_number().over(w_rank).alias("i"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).cast("bigint").alias("s"),
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            round_eps(F.max("s") / 100.0, 2).alias("total_revenue"),
            round_eps(
                F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("cents"))
                * 1.0
                / (F.max("n") * F.max("s")),
                6,
            ).alias("gini"),
        )
        .orderBy("segment")
    )
