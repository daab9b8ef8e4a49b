"""Twenty-ninth sweep (SURVEY.md §2 C88–C89).

Spatial proximity join via grid-cell bucketing, and multi-hop BFS
levels over the trade graph — the two remaining classic "join that
Spark lacks a native operator for" shapes (distance join, recursive
traversal), each re-expressed as hash joins.

Reference anchor: the jobs observatory joins ads to locations by
lat/long lookup (``ojd_daps/flows/enrich/labs/locations``); pairing
*nearby* entities is the natural extension, and the reference's
duplicate-subgraph walk (``dqa/data_getters.py:get_duplicate_subgraphs``)
is a driver-side BFS that C89 distributes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..operators.lineage import cut_lineage
from ..sources import load_table
from . import register
from .graph_plans import trade_edges

# ---------------------------------------------------------------- C88
#
# Synthetic-but-deterministic coordinates: md5-derived lat in [50,55),
# lon in [-5,5) (a UK-sized region, matching the reference's corpus).
# Grid cell = 0.5 degree (~55.5 km N-S; ~34 km E-W at lat 52), strictly
# larger than the 25 km match radius, so a 3x3 neighbourhood of the
# query point's cell provably contains every candidate.

GEO_RADIUS_KM = 25.0
GEO_CELL_DEG = 0.5
_EARTH_R = 6371.0

_C88_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS id,
         50.0 + (('0x' || substr(md5('g' || c_custkey), 1, 8))::BIGINT
                 % 5000) / 1000.0 AS lat,
         -5.0 + (('0x' || substr(md5('h' || c_custkey), 1, 8))::BIGINT
                 % 10000) / 1000.0 AS lon
  FROM customer
),
pairs AS (
  SELECT a.id AS id1, b.id AS id2,
         2.0 * {_EARTH_R!r} * ASIN(SQRT(
             POW(SIN(RADIANS(b.lat - a.lat) / 2), 2)
             + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
               * POW(SIN(RADIANS(b.lon - a.lon) / 2), 2))) AS d
  FROM pts a JOIN pts b
    ON a.id < b.id
   AND ABS(FLOOR(a.lat / {GEO_CELL_DEG!r}) - FLOOR(b.lat / {GEO_CELL_DEG!r})) <= 1
   AND ABS(FLOOR(a.lon / {GEO_CELL_DEG!r}) - FLOOR(b.lon / {GEO_CELL_DEG!r})) <= 1
)
SELECT id1, id2, {sql_round('d', 2)} AS dist_km
FROM pairs
WHERE {sql_round('d', 2)} <= {GEO_RADIUS_KM!r}
ORDER BY id1, id2
"""


def _hash_frac(prefix: str, key_col, modulus: int):
    """First 8 md5 hex digits of ``prefix || key`` as an int mod
    ``modulus`` — identical in Spark (conv) and DuckDB ('0x' cast)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), key_col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % modulus
    )


@register("geo_grid_join", oracle=_C88_ORACLE)
def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance self-join (all customer pairs within 25 km) executed as
    an equi-join on grid cells — the standard way to make a spatial
    join shuffle-friendly when the engine has no native range join.

    One side explodes its 3x3 neighbouring cells map-side (9x row
    blow-up of the POINTS table, not the pair space); the join is then
    a plain hash equi-join on the cell id, and the exact haversine
    predicate is evaluated only on co-cell candidates. At 100 TB the
    pair space never materialises — each task sees one cell
    neighbourhood, and cell granularity (vs the match radius) is the
    skew dial: dense cities can shrink the cell and re-bucket.

    The id1 < id2 ordering dedups the symmetric pair; applying it at
    candidate-generation time also halves the join output.
    """
    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        (50.0 + _hash_frac("g", F.col("c_custkey"), 5000) / 1000.0).alias("lat"),
        (-5.0 + _hash_frac("h", F.col("c_custkey"), 10000) / 1000.0).alias("lon"),
    )
    cell = lambda c: F.floor(c / GEO_CELL_DEG).cast("long")  # noqa: E731
    home = pts.select(
        "id", "lat", "lon", cell(F.col("lat")).alias("cy"), cell(F.col("lon")).alias("cx")
    )
    # 3x3 neighbourhood explode on the left side only.
    probe = home.select(
        F.col("id").alias("id1"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
        F.explode(
            F.array(*[F.struct(
                (F.col("cy") + dy).alias("cy"), (F.col("cx") + dx).alias("cx"))
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
        ).alias("cell"),
    ).select("id1", "lat1", "lon1", "cell.cy", "cell.cx")
    build = home.select(
        F.col("id").alias("id2"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        "cy",
        "cx",
    )
    dphi = F.radians(F.col("lat2") - F.col("lat1")) / 2
    dlmb = F.radians(F.col("lon2") - F.col("lon1")) / 2
    d = 2.0 * _EARTH_R * F.asin(
        F.sqrt(
            F.pow(F.sin(dphi), 2)
            + F.cos(F.radians("lat1")) * F.cos(F.radians("lat2"))
            * F.pow(F.sin(dlmb), 2)
        )
    )
    # Cheap bounding-box prefilter ahead of the haversine: 25 km is
    # ≤ 0.23° of latitude and ≤ 0.36° of longitude at 55°N, so the
    # coarse |Δ| cut (with slack) drops most co-cell candidates before
    # any trig runs. The exact predicate below is unchanged.
    bbox = (
        (F.abs(F.col("lat2") - F.col("lat1")) <= GEO_RADIUS_KM / 110.0)
        & (F.abs(F.col("lon2") - F.col("lon1")) <= GEO_RADIUS_KM / 55.0)
    )
    return (
        probe.join(build, ["cy", "cx"])
        .where((F.col("id1") < F.col("id2")) & bbox)
        .select("id1", "id2", round_eps(d, 2).alias("dist_km"))
        .where(F.col("dist_km") <= GEO_RADIUS_KM)
    )


# ---------------------------------------------------------------- C89

BFS_MAX_HOPS = 3
BFS_SEED_MOD = 50  # seed customers: c_custkey % 50 == 0


def _bfs_oracle() -> str:
    sql = f"""
WITH pairs AS (
  SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS (
  SELECT cust AS src, supp AS dst FROM pairs
  UNION ALL
  SELECT supp AS src, cust AS dst FROM pairs
),
l0 AS (
  SELECT DISTINCT 'c' || c_custkey AS node FROM customer
  WHERE c_custkey % {BFS_SEED_MOD} = 0
    AND 'c' || c_custkey IN (SELECT src FROM e)
),
"""
    seen = "SELECT node FROM l0"
    for i in range(1, BFS_MAX_HOPS + 1):
        sql += f"""l{i} AS (
  SELECT DISTINCT e.dst AS node
  FROM e JOIN l{i - 1} f ON e.src = f.node
  WHERE e.dst NOT IN ({seen})
),
"""
        seen += f" UNION ALL SELECT node FROM l{i}"
    sql = sql.rstrip().rstrip(",")
    parts = [
        f"SELECT node, CAST({i} AS INT) AS level FROM l{i}"
        for i in range(BFS_MAX_HOPS + 1)
    ]
    sql += "\n" + "\nUNION ALL\n".join(parts) + "\nORDER BY level, node"
    return sql


@register("bfs_levels", oracle=_bfs_oracle())
def bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first hop distance (<= 3 hops) from a seed set of
    customers over the trade graph — the distributed form of the
    reference's driver-side duplicate-subgraph walk
    (``dqa/data_getters.py:get_duplicate_subgraphs``, networkx BFS).

    Frontier-expansion Pregel shape: per hop, one join of the (small)
    frontier against the edge list plus an anti-join against the
    visited set. The edge list is the only big table and is persisted
    once; the frontier and visited sets are node-grain (<< edges).
    Each round's result is localCheckpointed to cut the growing
    lineage, exactly like operators/dedup.py's component loop. Hop
    count is a constant, so the oracle unrolls the same traversal as
    chained CTEs with NOT IN (visited) per level.

    Seeds are restricted to nodes present in the graph (isolated seeds
    would be level-0 rows with no reachable frontier — the oracle
    filters them identically).
    """
    edges = trade_edges(spark, sf_dir).select("src", "dst").distinct()
    edges = edges.persist()
    try:
        seeds = (
            load_table(spark, sf_dir, "customer")
            .where(F.col("c_custkey") % BFS_SEED_MOD == 0)
            .select(F.concat(F.lit("c"), F.col("c_custkey")).alias("node"))
            .join(
                edges.select(F.col("src").alias("node")).distinct(),
                "node",
                "left_semi",
            )
            .withColumn("level", F.lit(0).cast("int"))
        )
        visited = seeds.transform(cut_lineage)
        frontier = visited
        for hop in range(1, BFS_MAX_HOPS + 1):
            nxt = (
                frontier.join(edges, frontier["node"] == edges["src"])
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .withColumn("level", F.lit(hop).cast("int"))
                .transform(cut_lineage)
            )
            visited = visited.unionByName(nxt)
            frontier = nxt
        return visited.transform(cut_lineage)
    finally:
        edges.unpersist()
