"""Iterative graph analytics as DataFrame loops.

The reference does its graph work (duplicate subgraphs) on the driver
with networkx (dqa/data_getters.py:get_duplicate_subgraphs); this
package already distributes that as connected components
(operators/dedup.py). PageRank here extends the same pattern —
fixed-point iteration over an edge DataFrame with per-round
localCheckpoint to keep the loop plan flat — to weighted random-walk
centrality, the other graph statistic a corpus/marketplace pipeline
routinely needs (authority scores for sources, seller centrality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_ALPHA = 0.85
PAGERANK_ITERS = 10


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    alpha: float = PAGERANK_ALPHA,
    iterations: int = PAGERANK_ITERS,
) -> DataFrame:
    """Weighted PageRank with teleport, fixed iteration count.

    Returns (id, rank) for every node appearing as src or dst; ranks
    sum to 1. Dangling mass (nodes with no out-edges) is redistributed
    uniformly each round, so the result is a proper distribution.

    Scale shape: the transition matrix is materialised ONCE as
    (src, dst, p) with p = w/out-degree — the loop never re-derives it.
    Each round is one join + one groupBy shuffle over the edge set,
    plus a 1-row dangling-mass aggregate that stays a broadcast (never
    a collect); per-round localCheckpoint cuts lineage so round k's
    plan doesn't replay rounds 1..k-1. Everything is keyed by node id —
    hot nodes (a supplier on every order) skew one reducer, which AQE
    splits; salting the contribution sum is the 1000-executor escape
    hatch, noted rather than built because rank sums are associative.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out = e.groupBy("src").agg(F.sum("w").alias("wout"))
    trans = (
        e.join(out, "src")
        .select("src", "dst", (F.col("w") / F.col("wout")).alias("p"))
        .localCheckpoint(eager=True)
    )
    has_out = trans.select("src").distinct().localCheckpoint(eager=True)

    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            trans.join(ranks, trans.src == ranks.id)
            .select("dst", (F.col("p") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        dangling = (
            ranks.join(has_out, ranks.id == has_out.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - alpha) / n)
                    + alpha
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
