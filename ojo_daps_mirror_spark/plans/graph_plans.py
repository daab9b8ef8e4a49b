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
from ..operators.graph import pagerank
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


@register("trade_pagerank")  # rows-only: iterative fixed point, not SQL
def trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer↔supplier trade graph —
    which sellers sit at the centre of purchasing flow. Fixed 10
    iterations, deterministic up to float-sum order; exactness vs a
    numpy power iteration on the same edges is asserted to 1e-9 in
    tests/test_graph.py (the rows-only analog of an oracle).
    """
    ranks = pagerank(trade_edges(spark, sf_dir))
    return ranks.select(
        "id", round_eps(F.col("rank"), 6).alias("rank")
    ).orderBy(F.desc("rank"), "id")
