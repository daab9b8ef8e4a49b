"""Twentieth sweep (SURVEY.md §2 C78–C79).

k-core decomposition of the trade graph (iterative peeling with a
finitely-unrolled oracle) and a deterministic stratified
train/val/test split report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.lineage import cut_lineage
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C78

KCORE_K = 3
KCORE_ROUNDS = 8  # fixed unroll: both engines run the SAME rounds


def _kcore_oracle() -> str:
    sql = """
WITH pairs AS (
  SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e0 AS MATERIALIZED (
  SELECT cust AS src, supp AS dst FROM pairs
  UNION ALL
  SELECT supp AS src, cust AS dst FROM pairs
),
"""
    for i in range(KCORE_ROUNDS):
        sql += f"""d{i} AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e{i} GROUP BY src),
k{i} AS MATERIALIZED (SELECT src FROM d{i} WHERE deg >= {KCORE_K}),
e{i + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i} e
  JOIN k{i} a ON e.src = a.src
  JOIN k{i} b ON e.dst = b.src
),
"""
    sql = sql.rstrip().rstrip(",")
    sql += f"""
SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
FROM e{KCORE_ROUNDS}
GROUP BY src
HAVING COUNT(*) >= {KCORE_K}
ORDER BY node
"""
    return sql


@register("kcore_trade_graph", oracle=_kcore_oracle())
def kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core of the customer↔supplier trade graph: iteratively
    peel nodes of degree < {KCORE_K} until (a fixed {KCORE_ROUNDS}
    rounds of) stability — the dense-backbone extraction behind
    community seeds and spam-ring detection, and the third member of
    the engine's iterative-graph family (CC, PageRank).

    Each round is one degree aggregate of the surviving edge list plus
    two semi-joins (src kept, dst kept) — degree-bound work that
    shrinks monotonically; the edge list is localCheckpoint-ed per
    round to keep the loop's lineage flat (the C26 pattern). The round
    count is a FIXED constant so the peeling is finitely
    SQL-expressible: the oracle unrolls the identical {KCORE_ROUNDS}
    rounds as chained CTEs — equality proves the distributed loop
    matches exact peeling round-for-round.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cust"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
        .union(pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst")))
        .transform(cut_lineage)
    )
    for _ in range(KCORE_ROUNDS):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= KCORE_K).select("src")
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .transform(cut_lineage)
        )
    return (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .where(F.col("degree") >= KCORE_K)
        .orderBy("node")
    )


# ---------------------------------------------------------------- C79

SPLIT_TRAIN = 80  # md5 bucket < 80 → train
SPLIT_VAL = 90  # 80–89 → val, else test

_C79_ORACLE = f"""
WITH assigned AS (
  SELECT lang,
         CASE WHEN {sql_hash64("doc_id::VARCHAR || ':split'")} % 100
                   < {SPLIT_TRAIN} THEN 'train'
              WHEN {sql_hash64("doc_id::VARCHAR || ':split'")} % 100
                   < {SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
lang_n AS (SELECT lang, COUNT(*) AS ln FROM assigned GROUP BY lang)
SELECT assigned.lang AS lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       {sql_round('COUNT(*) * 100.0 / ANY_VALUE(ln)', 6)} AS pct_of_lang
FROM assigned JOIN lang_n ON assigned.lang = lang_n.lang
GROUP BY assigned.lang, split
ORDER BY lang, split
"""


@register("train_val_test_split", oracle=_C79_ORACLE)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment with the
    per-language proportion report — the split must be reproducible
    under resharding and JOIN-FREE per row (md5 of doc_id, never
    rand()), and the report is how you verify no language ended up
    starved in val/test.

    Assignment is a pure map expression; the report is one combined
    (lang, split) aggregate with the per-language total as a window
    over the ≤|langs|·3-row frame.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket = hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_VAL, "val")
        .otherwise("test")
    )
    counts = (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    ln = F.sum("n_docs").over(Window.partitionBy("lang"))
    return (
        counts.select(
            "lang",
            "split",
            "n_docs",
            round_eps(F.col("n_docs") * 100.0 / ln, 6).alias("pct_of_lang"),
        )
        .orderBy("lang", "split")
    )
