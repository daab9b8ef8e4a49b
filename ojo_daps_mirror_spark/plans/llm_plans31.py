"""Thirty-first sweep (SURVEY.md §2 B66, C90).

Pareto-frontier (skyline) query as windows instead of the quadratic
NOT-EXISTS, and CCNet-style unigram-LM perplexity bucketing — the
quality-stratification stage of a web-corpus pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_tokens, tokens
from ..operators.attach import scalars
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- B66
#
# Skyline: parts minimising retail price while maximising total
# quantity sold. Domination: q dominates p iff q.price <= p.price AND
# q.qty >= p.qty with at least one strict. The oracle states the
# definition directly (quadratic NOT EXISTS — fine for an oracle); the
# Spark plan is the O(n log n) sweep: a part is on the frontier iff it
# holds its price-group's max qty AND beats the running max qty of all
# strictly cheaper groups.

_B66_ORACLE = f"""
WITH sold AS (
  SELECT l_partkey AS p_partkey, SUM(l_quantity) AS qty_sold
  FROM lineitem GROUP BY l_partkey
),
pts AS (
  SELECT p.p_partkey, p.p_retailprice AS price, s.qty_sold
  FROM part p JOIN sold s USING (p_partkey)
)
SELECT p_partkey, {sql_round('price', 2)} AS price,
       {sql_round('qty_sold', 2)} AS qty_sold
FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.price <= a.price AND b.qty_sold >= a.qty_sold
    AND (b.price < a.price OR b.qty_sold > a.qty_sold)
)
ORDER BY price
"""


@register("pareto_frontier", oracle=_B66_ORACLE)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of parts on (price asc, quantity-sold desc).

    The naive formulation is an all-pairs anti-join (the oracle keeps
    it as the spec); the plan here is the sweep-line equivalence: on
    the frontier iff qty == max(qty) within the same price AND
    qty > max(qty) over every strictly lower price. Both are windows
    over ONE sort of the part-grain frame — part grain is already
    ~1000x smaller than the fact, and the only fact-grain work is the
    qty aggregate (map-side combined). Ties on both axes stay on the
    frontier, exactly as the domination definition demands.
    """
    sold = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum("l_quantity").alias("qty_sold"))
    )
    pts = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", F.col("p_retailprice").alias("price"))
        .join(sold, "p_partkey")
    )
    group_max = F.max("qty_sold").over(Window.partitionBy("price"))
    # Running max over strictly cheaper price groups: per-group max,
    # then the lagged running max over the price order.
    groups = pts.groupBy("price").agg(F.max("qty_sold").alias("gmax"))
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    groups = groups.select(
        "price", F.max("gmax").over(w).alias("prev_max")
    )
    return (
        pts.withColumn("gmax", group_max)
        .join(groups, "price")
        .where(
            (F.col("qty_sold") == F.col("gmax"))
            & (F.col("prev_max").isNull() | (F.col("qty_sold") > F.col("prev_max")))
        )
        .select(
            "p_partkey",
            round_eps(F.col("price"), 2).alias("price"),
            round_eps(F.col("qty_sold"), 2).alias("qty_sold"),
        )
    )


# ---------------------------------------------------------------- C90
#
# CCNet (Wenzek et al., LREC'20) buckets web documents into
# head/middle/tail by LM perplexity and keeps the head. Stand-in LM:
# the corpus's own add-one-smoothed unigram model.

CCNET_T1 = 1.0 / 3.0
CCNET_T2 = 2.0 / 3.0

_C90_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
),
lm AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
),
tot AS (
  SELECT SUM(c) AS n, COUNT(*) AS v FROM lm
),
ce AS (
  SELECT t.doc_id,
         ROUND(-AVG(LN((lm.c + 1.0) / (tot.n + tot.v))) + 1e-9, 6) AS ce
  FROM toks t JOIN lm ON t.tok = lm.tok CROSS JOIN tot
  GROUP BY t.doc_id
),
cuts AS (
  SELECT QUANTILE_CONT(ce, {CCNET_T1!r}) AS c1,
         QUANTILE_CONT(ce, {CCNET_T2!r}) AS c2
  FROM ce
)
SELECT CASE WHEN ce.ce <= cuts.c1 THEN 'head'
            WHEN ce.ce <= cuts.c2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       {sql_round('AVG(ce.ce)', 6)} AS avg_ce
FROM ce CROSS JOIN cuts
GROUP BY 1 ORDER BY 1
"""


@register("ccnet_perplexity_buckets", oracle=_C90_ORACLE)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality stratification: score every document by
    cross-entropy under a background unigram LM (add-one smoothed;
    here the corpus's own counts — production swaps in the Wikipedia
    LM exactly like the reference swaps its trained models in), then
    split the corpus into head/middle/tail terciles.

    Two token-grain shuffles total (LM counts; per-doc mean log-prob
    after the token→LM join — broadcast at test SF, plain hash join
    at 100 TB since the LM is vocabulary-grain). Per-doc CE rounds to
    6 dp BEFORE the tercile cut on both engines, so cutoff
    comparisons see identical doubles. Exact percentile cutoffs for
    oracle parity; approx_percentile is the documented 100 TB swap —
    executable via SPARK_GRAFT_SCALE_MODE=approx (scale_mode.py).
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    )
    lm = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = lm.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v"))
    ce = (
        toks.join(F.broadcast(lm), "tok")
        .transform(scalars(tot))
        .groupBy("doc_id")
        .agg(
            round_eps(
                -F.avg(F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v")))), 6
            ).alias("ce")
        )
    )
    cuts = ce.agg(
        sm.percentile("ce", CCNET_T1).alias("c1"),
        sm.percentile("ce", CCNET_T2).alias("c2"),
    )
    bucket = (
        F.when(F.col("ce") <= F.col("c1"), "head")
        .when(F.col("ce") <= F.col("c2"), "middle")
        .otherwise("tail")
    )
    return (
        ce.transform(scalars(cuts))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round_eps(F.avg("ce"), 6).alias("avg_ce"),
        )
    )
