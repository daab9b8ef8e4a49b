"""Fifty-sixth sweep (SURVEY.md §2 B109, C120-C121).

ABC/Pareto inventory classification (exact integer boundary math), a
longest-processing-time index-shard planner over C119's tile cells
(the balanced k-way assignment an ANN serving tier needs), and a
dedup-threshold sensitivity audit over C7's candidate machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register
from .llm_plans55 import QK_BITS, _morton_sql, quadkey_cells
from .text_plans import NG_BLOCK_K, NG_DF_CAP, MH_SHINGLE_K, _jaccard_verify
from ..functions.text import shingles, sql_shingles, sql_tokens, tokens

# ---------------------------------------------------------------- B109

ABC_A_PCT = 80  # cumulative-revenue boundary for class A
ABC_B_PCT = 95  # class B boundary

_B109_ORACLE = f"""
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev4
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(rev4) AS t FROM rev),
cum AS (
  SELECT l_partkey, rev4,
         SUM(rev4) OVER (ORDER BY rev4 DESC, l_partkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum4,
         tot.t
  FROM rev CROSS JOIN tot
)
SELECT l_partkey AS partkey,
       {sql_round('rev4 / 1e4', 2)} AS revenue,
       {sql_round('cum4 * 1.0 / t', 6)} AS cum_share,
       CASE WHEN cum4 * 100 <= t * {ABC_A_PCT} THEN 'A'
            WHEN cum4 * 100 <= t * {ABC_B_PCT} THEN 'B'
            ELSE 'C' END AS abc_class
FROM cum ORDER BY revenue DESC, partkey
"""


@register("abc_classification", oracle=_B109_ORACLE)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto inventory classification: parts ranked by revenue,
    class A = the head covering {ABC_A_PCT}% of cumulative revenue,
    B to {ABC_B_PCT}%, C the tail — the 80/20 working-capital
    classifier (B66's Pareto frontier is multi-objective; this is the
    single-measure concentration cut, B81's Gini turned into a
    per-item label).

    Scale shape: fact → part grain in one aggregate; the ordered
    cumulative window runs at part grain (range-partitioned two-pass
    cumsum at 100 TB, B91's note). Class boundaries compare
    cum·100 ≤ total·pct in EXACT integers — no float ever decides a
    boundary row.
    """
    rev4 = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(rev4).alias("rev4"))
    )
    tot = rev.agg(F.sum("rev4").alias("t"))
    w_cum = Window.orderBy(F.desc("rev4"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rev.transform(scalars(tot)).select(
        "l_partkey",
        "rev4",
        F.sum("rev4").over(w_cum).alias("cum4"),
        "t",
    )
    return cum.select(
        F.col("l_partkey").alias("partkey"),
        round_eps(F.col("rev4") / 1e4, 2).alias("revenue"),
        round_eps(F.col("cum4") * 1.0 / F.col("t"), 6).alias("cum_share"),
        F.when(F.col("cum4") * 100 <= F.col("t") * ABC_A_PCT, "A")
        .when(F.col("cum4") * 100 <= F.col("t") * ABC_B_PCT, "B")
        .otherwise("C")
        .alias("abc_class"),
    ).orderBy(F.desc("revenue"), "partkey")


# ---------------------------------------------------------------- C120

SHARD_N = 4  # target index shards
SHARD_ZOOM = 4  # tile grain to assign (≤ 256 cells — bounded state)


def _c120_oracle() -> str:
    loads = (
        "coalesce(list_sum(list_transform("
        "list_filter(acc, a -> a.shard = j), a -> a.n)), 0)"
    )
    pick = (
        f"(list_sort(list_transform(range(1, {SHARD_N + 1}), "
        f"j -> struct_pack(ld := {loads}, j := j)))[1]).j"
    )
    step = (
        f"acc || [struct_pack(cell := pl[1].cell, shard := {pick}, "
        f"n := pl[1].n)]"
    )
    return f"""
WITH pts AS (
  SELECT c_custkey AS id,
         50.0 + (('0x' || substr(md5('g' || c_custkey), 1, 8))::BIGINT
                 % 5000) / 1000.0 AS lat,
         -5.0 + (('0x' || substr(md5('h' || c_custkey), 1, 8))::BIGINT
                 % 10000) / 1000.0 AS lon
  FROM customer
),
cells0 AS (
  SELECT id,
         LEAST(CAST(FLOOR((lon + 5.0) / 10.0 * {1 << QK_BITS}) AS BIGINT),
               {(1 << QK_BITS) - 1}) AS xi,
         LEAST(CAST(FLOOR((lat - 50.0) / 5.0 * {1 << QK_BITS}) AS BIGINT),
               {(1 << QK_BITS) - 1}) AS yi
  FROM pts
),
agg AS (
  SELECT ({_morton_sql('xi', 'yi')}) >> (2 * ({QK_BITS} - {SHARD_ZOOM}))
           AS cell,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM cells0 GROUP BY 1
),
ordered AS (
  SELECT list(struct_pack(cell := cell, n := n) ORDER BY n DESC, cell)
    AS cs
  FROM agg
),
folded AS (
  SELECT list_reduce(
    [[]::STRUCT(cell BIGINT, shard BIGINT, n BIGINT)[]]
      || list_transform(cs, c ->
           [struct_pack(cell := c.cell, shard := 0::BIGINT, n := c.n)]),
    (acc, pl) -> {step}) AS asg
  FROM ordered
),
assigned AS (SELECT unnest(asg) AS a FROM folded),
tot AS (SELECT SUM(a.n) AS t FROM assigned)
SELECT a.shard,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(a.n) AS BIGINT) AS n_points,
       {sql_round('SUM(a.n) * 1.0 / tot.t', 6)} AS load_share
FROM assigned CROSS JOIN tot
GROUP BY a.shard, tot.t ORDER BY a.shard
"""


@register("index_shard_plan", oracle=_c120_oracle())
def index_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced index sharding by longest-processing-time (LPT)
    greedy: C119's zoom-{SHARD_ZOOM} tiles, largest first, each to the
    currently-lightest of {SHARD_N} shards (ties to the lowest shard
    id) — the placement plan an ANN/search serving tier computes
    before loading (LPT guarantees ≤ 4/3·OPT makespan; the serving
    sibling of C49's row-level sharding, which balances ROWS but
    can't keep a tile on one server).

    Scale shape: the cell-size table is bounded by the tile grid
    (≤{(1 << (2 * SHARD_ZOOM))} cells regardless of corpus size), so
    the inherently-sequential greedy folds INSIDE one array expression
    over the collapsed cell row — B98's no-driver-loop recipe; shard
    loads re-derive from the accumulator per step in exact integers.
    """
    cells = quadkey_cells(spark, sf_dir, SHARD_ZOOM)
    ordered = cells.agg(
        F.array_sort(
            F.collect_list(
                F.struct((-F.col("n")).alias("o"), "cell", "n")
            )
        ).alias("cs0")
    ).select(
        F.transform(
            "cs0", lambda s: F.struct(s["cell"].alias("cell"), s["n"].alias("n"))
        ).alias("cs")
    )

    def step(acc, c):
        def load(j):
            return F.coalesce(
                F.aggregate(
                    F.filter(acc, lambda a: a["shard"] == j),
                    F.lit(0).cast("bigint"),
                    lambda s, a: s + a["n"],
                ),
                F.lit(0).cast("bigint"),
            )

        pick = F.array_min(
            F.transform(
                F.sequence(F.lit(1).cast("bigint"), F.lit(SHARD_N).cast("bigint")),
                lambda j: F.struct(load(j).alias("ld"), j.alias("j")),
            )
        )["j"]
        return F.concat(
            acc,
            F.array(
                F.struct(
                    c["cell"].alias("cell"),
                    pick.alias("shard"),
                    c["n"].alias("n"),
                )
            ),
        )

    empty = F.expr(
        "CAST(array() AS array<struct<cell:bigint,shard:bigint,n:bigint>>)"
    )
    folded = ordered.select(
        F.aggregate(F.col("cs"), empty, step).alias("asg")
    )
    assigned = folded.select(F.explode("asg").alias("a")).select(
        F.col("a.shard").alias("shard"), F.col("a.n").alias("n")
    )
    tot = assigned.agg(F.sum("n").alias("t"))
    return (
        assigned.transform(scalars(tot))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n").cast("bigint").alias("n_points"),
            round_eps(F.sum("n") * 1.0 / F.first("t"), 6).alias("load_share"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------- C121

TSA_MIN_BAND = 3  # report bands 0.3, 0.4, ... 1.0


def _c121_oracle() -> str:
    return f"""
WITH blocks AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), NG_BLOCK_K)} AS bh
  FROM documents
),
docs AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), MH_SHINGLE_K)} AS sh
  FROM documents
),
ex AS (SELECT doc_id, unnest(bh) AS s FROM blocks),
df AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= {NG_DF_CAP}),
indexed AS (SELECT ex.doc_id, ex.s FROM ex JOIN df USING (s)),
cand AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM indexed a JOIN indexed b ON a.s = b.s AND a.doc_id < b.doc_id
),
jac AS (
  SELECT ROUND(len(list_intersect(da.sh, db.sh)) * 1.0
           / len(list_distinct(da.sh || db.sh)) + 1e-9, 4) AS jac
  FROM cand
  JOIN docs da ON i = da.doc_id
  JOIN docs db ON j = db.doc_id
),
banded AS (
  SELECT LEAST(CAST(FLOOR(jac * 10) AS BIGINT), 9) AS band10 FROM jac
  WHERE jac * 10 >= {TSA_MIN_BAND}
),
counts AS (
  SELECT band10, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM banded GROUP BY band10
)
SELECT {sql_round('band10 / 10.0', 1)} AS band,
       n_pairs,
       CAST(SUM(n_pairs) OVER (ORDER BY band10 DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_at_or_above
FROM counts ORDER BY band
"""


@register("threshold_sensitivity_audit", oracle=_c121_oracle())
def threshold_sensitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold sensitivity audit: exact Jaccard of EVERY C7
    candidate pair, histogrammed into 0.1 bands with a
    cumulative-from-above column — "how many pairs would a 0.7
    threshold keep vs 0.8" read directly off one table, the tuning
    report run BEFORE committing a corpus-wide dedup threshold (the
    pair-level complement of C76's recall eval and C112's bucket
    stats).

    Scale shape: identical candidate generation to C7 (DF-capped rare
    5-gram blocking, map-side pair expansion) with the verify
    threshold dropped to 0 — the band histogram then reduces the pair
    table to ≤8 rows; the 0.5+ mass is exactly C7's output size.
    """
    raw = load_table(spark, sf_dir, "documents")
    ex = raw.select(
        "doc_id",
        F.explode(shingles(tokens(F.col("text")), NG_BLOCK_K)).alias("s"),
    )
    posts = (
        ex.groupBy("s")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= NG_DF_CAP))
    )
    ds = F.col("ds")
    pair_arr = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("i"), y.alias("j")),
            ),
        )
    )
    cand = (
        posts.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .distinct()
    )
    pairs = _jaccard_verify(raw, cand, MH_SHINGLE_K, threshold=0.0)
    banded = pairs.select(
        F.least(
            F.floor(F.col("jaccard") * 10).cast("bigint"), F.lit(9)
        ).alias("band10")
    ).where(F.col("jaccard") * 10 >= TSA_MIN_BAND)
    counts = banded.groupBy("band10").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    w_above = Window.orderBy(F.desc("band10")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return counts.select(
        round_eps(F.col("band10") / 10.0, 1).alias("band"),
        "n_pairs",
        F.sum("n_pairs").over(w_above).cast("bigint").alias("n_at_or_above"),
    ).orderBy("band")
