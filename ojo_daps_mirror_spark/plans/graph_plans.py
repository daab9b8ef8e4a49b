"""Graph-analytics plans (SURVEY.md §2 C26).

Random-walk centrality over the trade graph the star schema implies.
The reference's graph layer is driver-side networkx over duplicate
links (dqa/data_getters.py:get_duplicate_subgraphs) — covered by
dedup_components; this adds the weighted-centrality statistic on the
same distributed-loop machinery (operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps
from ..operators.graph import PAGERANK_ALPHA, PAGERANK_ITERS, pagerank
from ..sources import load_table
from . import register


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected customer↔supplier trade edges weighted by lineitem
    count, as two directed edge sets (random walk crosses both ways).

    One lineitem⋈orders join (the only big-big shuffle; bucketing both
    on orderkey removes it) then a count aggregate keyed by the pair —
    map-side combined, output ~|customers|·avg-degree rows, far smaller
    than the facts.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cust"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("supp"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    # Both directions via a map-side explode, NOT a union of two reads:
    # a union re-executes the join+aggregate pipeline per branch.
    both = F.explode(
        F.array(
            F.struct(
                F.col("cust").alias("src"),
                F.col("supp").alias("dst"),
                F.col("weight"),
            ),
            F.struct(
                F.col("supp").alias("src"),
                F.col("cust").alias("dst"),
                F.col("weight"),
            ),
        )
    )
    return pairs.select(both.alias("e")).select("e.*")


def _pagerank_oracle() -> str:
    """Unrolled power iteration as chained CTEs — PAGERANK_ITERS is a
    fixed constant, so the loop is finitely SQL-expressible. The trade
    graph is symmetric (both edge directions exist), so every node has
    out-edges and the dangling-mass term is identically zero."""
    a = PAGERANK_ALPHA
    sql = f"""
WITH pairs AS (
  SELECT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT cust AS src, supp AS dst, w FROM pairs
  UNION ALL
  SELECT supp AS src, cust AS dst, w FROM pairs
),
out_deg AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY src),
trans AS (
  SELECT e.src, e.dst, e.w / o.wout AS p
  FROM edges e JOIN out_deg o USING (src)
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT id, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
"""
    for i in range(PAGERANK_ITERS):
        sql += f"""r{i + 1} AS (
  SELECT nodes.id,
         (1.0 - {a!r}) / nn.n + {a!r} * COALESCE(c.c, 0) AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (SELECT t.dst AS id, SUM(t.p * r.rank) AS c
             FROM trans t JOIN r{i} r ON t.src = r.id GROUP BY t.dst) c
    ON c.id = nodes.id
),
"""
    sql = sql.rstrip().rstrip(",")
    sql += f"""
SELECT id, ROUND(rank + 1e-9, 6) AS rank
FROM r{PAGERANK_ITERS}
ORDER BY rank DESC, id
"""
    return sql


@register("trade_pagerank", oracle=_pagerank_oracle())
def trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer↔supplier trade graph —
    which sellers sit at the centre of purchasing flow. Fixed 10
    iterations, deterministic up to float-sum order; exactness vs a
    numpy power iteration on the same edges is asserted to 1e-9 in
    tests/test_graph.py, and the same unrolled iteration is the DuckDB
    oracle (_pagerank_oracle)."""
    ranks = pagerank(trade_edges(spark, sf_dir))
    return ranks.select(
        "id", round_eps(F.col("rank"), 6).alias("rank")
    ).orderBy(F.desc("rank"), "id")
