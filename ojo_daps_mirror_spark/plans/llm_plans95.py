"""Ninety-fifth sweep (SURVEY.md §2 B176-B177, C170).

Kendall's W concordance (do the years agree on the brand ranking —
the multi-judge ranking-stability coefficient; C145's RBO compares
two lists, W tests m of them at once), the backlog aging waterfall
(open orders bucketed by age at a snapshot — the ops report behind
every "what's stuck" standup), and the pairwise Jensen-Shannon
divergence matrix between sources (the symmetric, always-finite
distribution distance C93's KL-vs-corpus can't give, computed from
the shared-vocabulary join alone via the closed form for one-sided
mass).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B176

_B176_ORACLE = f"""
WITH by AS (
  SELECT p.p_brand AS brand, CAST(year(l.l_shipdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
m AS (SELECT CAST(COUNT(DISTINCT yr) AS BIGINT) AS m FROM by),
complete AS (
  SELECT brand FROM by GROUP BY brand
  HAVING COUNT(*) = (SELECT m FROM m)
),
cells AS (SELECT by.* FROM by JOIN complete USING (brand)),
ranked AS (
  SELECT brand, yr,
         CAST(2 * RANK() OVER (PARTITION BY yr ORDER BY rev DESC)
              + COUNT(*) OVER (PARTITION BY yr, rev) - 1 AS BIGINT) AS r2
  FROM cells
),
ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tt FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS t FROM cells GROUP BY yr, rev
  )
),
ri AS (
  SELECT brand, CAST(SUM(r2) AS BIGINT) AS r2i,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM ranked GROUP BY brand
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(m) AS m,
         SUM((r2i / 2.0) * (r2i / 2.0)) AS s2
  FROM ri
)
SELECT n AS n_brands, m AS n_years,
       {sql_round(
           '(12.0 * s2 - 3.0 * m * m * n * (n + 1.0) * (n + 1.0))'
           ' / ((m * 1.0) * m * n * ((n * 1.0) * n - 1) - m * tt)',
           6)} AS kendall_w
FROM red CROSS JOIN ties
"""


@register("kendall_w_concordance", oracle=_B176_ORACLE)
def kendall_w_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W coefficient of concordance across ship years
    ranking brands by revenue (tie-corrected): W = 1 means every
    year produces the identical brand ranking, W ~ 0 means the
    ranking reshuffles annually — the multi-judge stability test
    behind "is our category structure durable" (C145's RBO compares
    two rankings; W tests all m at once, and 12S/(m^2 n(n^2-1)) is
    its classical core). Brands missing a year are excluded — the
    complete-panel design, decided by an exact count.

    Exactness: within-year average ranks carried as exact doubled
    integers (B158's recipe); rank sums, tie terms, and the W
    numerator/denominator are exact until one double division.

    Scale shape: one fact aggregate to the brand x year frame;
    ranks are windows over <=|brands|-row partitions; reductions at
    brand grain.
    """
    by = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
            F.round(F.col("l_extendedprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("cents"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    F.col("p_partkey").alias("pk"),
                    F.col("p_brand").alias("brand"),
                )
            ),
            "pk",
        )
        .groupBy("brand", "yr")
        .agg(F.sum("cents").cast("bigint").alias("rev"))
    )
    by = by.persist()
    m_frame = by.agg(F.countDistinct("yr").cast("bigint").alias("m"))
    complete = (
        by.groupBy("brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(m_frame), F.col("cnt") == F.col("m"))
        .select("brand")
    )
    cells = by.join(F.broadcast(complete), "brand")
    cells = cells.persist()
    w_rank = Window.partitionBy("yr").orderBy(F.col("rev").desc())
    w_tie = Window.partitionBy("yr", "rev")
    ranked = cells.select(
        "brand",
        (
            2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1
        )
        .cast("bigint")
        .alias("r2"),
    )
    ties = (
        cells.groupBy("yr", "rev")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("tt")
        )
    )
    ri = ranked.groupBy("brand").agg(
        F.sum("r2").cast("bigint").alias("r2i"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    red = ri.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("m").cast("bigint").alias("m"),
        F.sum((F.col("r2i") / 2.0) * (F.col("r2i") / 2.0)).alias("s2"),
    )
    n, m = F.col("n"), F.col("m")
    w = (
        12.0 * F.col("s2") - 3.0 * m * m * n * (n + 1.0) * (n + 1.0)
    ) / ((m * 1.0) * m * n * ((n * 1.0) * n - 1) - m * F.col("tt"))
    return (
        red.transform(scalars(ties))
        .select(
            n.alias("n_brands"),
            m.alias("n_years"),
            round_eps(w, 6).alias("kendall_w"),
        )
    )


# ---------------------------------------------------------------- B177

BA_SNAPSHOT = "1997-06-01"

_B177_ORACLE = f"""
WITH open_orders AS (
  SELECT o.o_orderkey, o.o_orderpriority AS priority,
         CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT) AS cents,
         datediff('day', o.o_orderdate, DATE '{BA_SNAPSHOT}') AS age
  FROM orders o
  WHERE o.o_orderdate <= DATE '{BA_SNAPSHOT}'
    AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > DATE '{BA_SNAPSHOT}'
    )
),
bucketed AS (
  SELECT priority,
         CASE WHEN age <= 30 THEN '0-30'
              WHEN age <= 60 THEN '31-60'
              WHEN age <= 90 THEN '61-90'
              ELSE '90+' END AS age_bucket,
         cents
  FROM open_orders
)
SELECT priority, age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_round('SUM(cents) / 100.0', 2)} AS open_value
FROM bucketed GROUP BY priority, age_bucket
ORDER BY priority, age_bucket
"""


@register("backlog_aging", oracle=_B177_ORACLE)
def backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging waterfall at the {BA_SNAPSHOT} snapshot: orders
    placed by then with at least one line still unshipped, bucketed
    0-30 / 31-60 / 61-90 / 90+ days old, by priority with open value
    — the "what's stuck and how stuck" ops report that B149's
    aggregate WIP number cannot break down (and the age tail is
    where B19's dormant-customer logic starts).

    Scale shape: the still-open test is a left-semi join against
    the post-snapshot lineitem slice (predicate pushed to the ship
    date column); ages and buckets are map expressions; one
    (priority, bucket) aggregate.
    """
    snap = F.lit(BA_SNAPSHOT).cast("date")
    still_open = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > snap)
        .select(F.col("l_orderkey").alias("ok"))
        .distinct()
    )
    open_orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") <= snap)
        .select(
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderpriority").alias("priority"),
            F.round(F.col("o_totalprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("cents"),
            F.datediff(snap, F.col("o_orderdate")).alias("age"),
        )
        .join(still_open, "ok", "left_semi")
    )
    bucket = (
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 60, "31-60")
        .when(F.col("age") <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        open_orders.select("priority", bucket.alias("age_bucket"), "cents")
        .groupBy("priority", "age_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            round_eps(F.sum("cents") / 100.0, 2).alias("open_value"),
        )
        .orderBy("priority", "age_bucket")
    )


# ---------------------------------------------------------------- C170

_C170_ORACLE = f"""
WITH tf AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) GROUP BY source, tok
),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM tf GROUP BY 1),
prob AS (
  SELECT tf.source, tf.tok, tf.c * 1.0 / tot.t AS p
  FROM tf JOIN tot USING (source)
),
inner_terms AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS shared_vocab,
         SUM(a.p * ln(2.0 * a.p / (a.p + b.p))
             + b.p * ln(2.0 * b.p / (a.p + b.p))) AS s_in,
         SUM(a.p) AS pa_in, SUM(b.p) AS pb_in
  FROM prob a JOIN prob b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, shared_vocab,
       {sql_round(
           '(0.5 * s_in + 0.5 * ln(2.0) * (2.0 - pa_in - pb_in))'
           f' / {math.log(2.0)!r}', 6)} AS js_divergence_bits
FROM inner_terms ORDER BY src_a, src_b
"""


@register("source_js_divergence_matrix", oracle=_C170_ORACLE)
def source_js_divergence_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (bits) between every two
    sources' unigram distributions — the symmetric, always-finite
    distance matrix for source redundancy (C42 measures shingle
    overlap; JS measures distributional SHAPE, so two sources can
    share no documents yet be distributionally identical). Uses the
    identity that one-sided tokens contribute exactly p ln 2, so the
    whole matrix computes from the SHARED-vocabulary join alone:
    JS = 1/2 sum_shared[...] + (ln2/2)(2 - P_shared - Q_shared) —
    no full-outer join, no per-pair vocabulary union pass.

    Scale shape: one token aggregate (C30's shuffle) to
    (source, token) grain, one vocabulary-grain equi self-join on
    the token key, a |source-pairs|-row reduction.
    """
    tf = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = tf.groupBy("source").agg(F.sum("c").cast("bigint").alias("t"))
    prob = tf.join(tot, "source").select(
        "source", "tok", (F.col("c") * 1.0 / F.col("t")).alias("p")
    )
    prob = prob.persist()
    a = prob.select(
        F.col("source").alias("src_a"), "tok", F.col("p").alias("pa")
    )
    b = prob.select(
        F.col("source").alias("src_b"), "tok", F.col("p").alias("pb")
    )
    inner = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("shared_vocab"),
            F.sum(
                F.col("pa")
                * F.log(2.0 * F.col("pa") / (F.col("pa") + F.col("pb")))
                + F.col("pb")
                * F.log(2.0 * F.col("pb") / (F.col("pa") + F.col("pb")))
            ).alias("s_in"),
            F.sum("pa").alias("pa_in"),
            F.sum("pb").alias("pb_in"),
        )
    )
    js = (
        0.5 * F.col("s_in")
        + 0.5 * math.log(2.0) * (2.0 - F.col("pa_in") - F.col("pb_in"))
    ) / math.log(2.0)
    return inner.select(
        "src_a",
        "src_b",
        "shared_vocab",
        round_eps(js, 6).alias("js_divergence_bits"),
    ).orderBy("src_a", "src_b")
