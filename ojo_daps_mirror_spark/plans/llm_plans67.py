"""Sixty-seventh sweep (SURVEY.md §2 B124, C138-C139).

Qini uplift curve (the causal-targeting eval that closes the
experimentation family: B60 tests, B102 adjusts, B64 ranks — this
asks WHO to treat), the pass@k unbiased estimator (the LLM-eval
staple for success-under-k-samples), and degree assortativity (do
hub nations trade with hubs? — the one-number topology summary of
the graph family's edge list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B124

QINI_BINS = 10

_B124_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y,
         CAST({sql_hash64("user_id::VARCHAR || ':assign'")} % 2
              AS BIGINT) AS t,
         CAST({sql_hash64("user_id::VARCHAR || ':score'")} % 100000
              AS BIGINT) AS s5
  FROM events GROUP BY user_id
),
binned AS (
  SELECT LEAST(s5 * {QINI_BINS} // 100000, {QINI_BINS - 1}) AS k,
         CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS yt,
         CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS yc
  FROM users GROUP BY 1
),
cum AS (
  SELECT k,
         SUM(nt) OVER w AS cnt, SUM(yt) OVER w AS cyt,
         SUM(nc) OVER w AS cnc, SUM(yc) OVER w AS cyc
  FROM binned
  WINDOW w AS (ORDER BY k DESC ROWS UNBOUNDED PRECEDING)
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(cnt AS BIGINT) AS cum_nt, CAST(cyt AS BIGINT) AS cum_yt,
       CAST(cnc AS BIGINT) AS cum_nc, CAST(cyc AS BIGINT) AS cum_yc,
       {sql_round(
           '(cyt * 1.0 / cnt - cyc * 1.0 / cnc) * (cnt + cnc)', 6)}
         AS qini_uplift
FROM cum ORDER BY k DESC
"""


@register("qini_uplift_curve", oracle=_B124_ORACLE)
def qini_uplift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve: users ranked by the targeting score, and at
    each score decile (cumulating from the top) the incremental
    conversions a treatment-targeting policy would have bought —
    (Ȳ_t − Ȳ_c)·N among the targeted prefix. The WHO-to-treat eval
    that completes the experimentation family (B60 measures IF the
    treatment works on average, this measures whether the SCORE finds
    the users it works ON); with the stub's independent score and
    assignment, the correct curve hovers near zero — the harness must
    say so. Deterministic hash assignment = the replayable A/B split.

    Scale shape: users collapse once; everything after lives on the
    10-row decile frame (conditional partials in ONE aggregate, one
    descending cumulative window, broadcast-free).
    """
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("y")
        )
        .select(
            "y",
            (
                hash64(
                    F.concat(F.col("user_id").cast("string"), F.lit(":assign"))
                )
                % 2
            ).alias("t"),
            (
                hash64(
                    F.concat(F.col("user_id").cast("string"), F.lit(":score"))
                )
                % 100000
            ).alias("s5"),
        )
    )
    binned = users.groupBy(
        F.least(
            F.floor(F.col("s5") * QINI_BINS / 100000).cast("bigint"),
            F.lit(QINI_BINS - 1),
        ).alias("k")
    ).agg(
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0)).cast("bigint").alias("nt"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("yt"),
        F.sum(F.when(F.col("t") == 0, 1).otherwise(0)).cast("bigint").alias("nc"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("yc"),
    )
    w = Window.orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = binned.select(
        "k",
        F.sum("nt").over(w).cast("bigint").alias("cum_nt"),
        F.sum("yt").over(w).cast("bigint").alias("cum_yt"),
        F.sum("nc").over(w).cast("bigint").alias("cum_nc"),
        F.sum("yc").over(w).cast("bigint").alias("cum_yc"),
    )
    return cum.select(
        F.col("k").cast("bigint").alias("k"),
        "cum_nt",
        "cum_yt",
        "cum_nc",
        "cum_yc",
        round_eps(
            (
                F.col("cum_yt") * 1.0 / F.col("cum_nt")
                - F.col("cum_yc") * 1.0 / F.col("cum_nc")
            )
            * (F.col("cum_nt") + F.col("cum_nc")),
            6,
        ).alias("qini_uplift"),
    ).orderBy(F.col("k").desc())


# ---------------------------------------------------------------- C138

PASS_KS = (1, 3, 5)


def _pass_product_sql(k: int) -> str:
    terms = " * ".join(
        f"((n - c - {i}) * 1.0 / (n - {i}))" for i in range(k)
    )
    return (
        f"CASE WHEN n - c < {k} THEN 1.0 ELSE 1.0 - ({terms}) END"
    )


def _c138_oracle() -> str:
    selects = []
    for k in PASS_KS:
        selects.append(
            f"""
  SELECT CAST({k} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_users,
         {sql_round(f'AVG({_pass_product_sql(k)})', 6)} AS avg_pass_at_k
  FROM attempts WHERE n >= {k}"""
        )
    u = "\n  UNION ALL".join(selects)
    return f"""
WITH attempts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM events GROUP BY user_id
)
{u}
ORDER BY k
"""


def _pass_product(k: int) -> F.Column:
    prod = F.lit(1.0)
    for i in range(k):
        prod = prod * (
            (F.col("n") - F.col("c") - i) * 1.0 / (F.col("n") - i)
        )
    return F.when(F.col("n") - F.col("c") < k, F.lit(1.0)).otherwise(
        1.0 - prod
    )


@register("pass_at_k", oracle=_c138_oracle())
def pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k estimator (Chen et al. 2021, the HumanEval
    formula): per problem (user) with n sampled attempts (events) and
    c successes (purchases), pass@k = 1 − C(n−c,k)/C(n,k) computed as
    the stable telescoping product Π(n−c−i)/(n−i) — NOT the naive
    (c/n)^k-style plug-in, which is biased — averaged over problems
    for k = 1, 3, 5. The standard eval for sampled-generation
    success; identical term order in both engines keeps the float
    product bit-equal.

    Scale shape: one problem-grain aggregate; the per-k products are
    pure projections of (n, c) and each k's average is a 1-row
    reduction over the problem frame (problems with n < k excluded,
    per the estimator's validity condition).
    """
    attempts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("c"),
        )
    )
    attempts = attempts.persist()
    frames = []
    for k in PASS_KS:
        frames.append(
            attempts.where(F.col("n") >= k).agg(
                F.lit(k).cast("bigint").alias("k"),
                F.count(F.lit(1)).cast("bigint").alias("n_users"),
                round_eps(F.avg(_pass_product(k)), 6).alias(
                    "avg_pass_at_k"
                ),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.select("k", "n_users", "avg_pass_at_k").orderBy("k")


# ---------------------------------------------------------------- C139

_C139_ORACLE = f"""
WITH allpairs AS (
  SELECT LEAST(c_nationkey, s_nationkey) AS a,
         GREATEST(c_nationkey, s_nationkey) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
  GROUP BY 1, 2
),
thr AS (SELECT quantile_cont(cnt, 0.75) AS q FROM allpairs),
cnts AS (
  SELECT a, b FROM allpairs CROSS JOIN thr WHERE cnt >= q
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM cnts UNION ALL SELECT b FROM cnts
  ) GROUP BY node
),
dir AS (
  SELECT a AS u, b AS v FROM cnts UNION ALL SELECT b, a FROM cnts
),
pairs AS (
  SELECT da.d AS x, db.d AS y
  FROM dir JOIN deg da ON dir.u = da.node JOIN deg db ON dir.v = db.node
),
suff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs
)
SELECT CAST(m / 2 AS BIGINT) AS n_edges,
       {sql_round(
           '(m * sxy - sx * sy) * 1.0'
           ' / sqrt((m * sxx - sx * sx) * 1.0 * (m * syy - sy * sy))',
           6)} AS assortativity
FROM suff
WHERE m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
"""


@register("degree_assortativity", oracle=_C139_ORACLE)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman's r) of the undirected nation
    trade graph: the Pearson correlation of endpoint degrees over all
    edges (both orientations, the standard symmetrisation) — positive
    means hubs trade with hubs (social-network-like), negative means
    hub-and-spoke (internet-like). The one-number topology summary
    that tells you whether C26's PageRank mass and C78's cores sit on
    an assortative backbone or a star — and therefore whether hot-key
    mitigation (salting) targets a few hubs or a tier.

    Scale shape: ONE volume-bound aggregate to the edge list; degrees
    derive from the edge frame itself (no second fact scan), the
    degree attach is a broadcast join at edge grain, and r comes from
    exact BIGINT sufficient statistics in a single reduction. The
    post-aggregate tail is nation-grain (≤ |nations|² rows), so both
    unions collapse: deg explodes array(a, b) instead of unioning two
    projections, and the both-orientations Pearson stats are symmetric
    functions of ONE undirected pass — m = 2·|edges|, sx = sy =
    Σ(dₐ+d_b), sxx = syy = Σ(dₐ²+d_b²), sxy = 2·Σ dₐ·d_b — exact BIGINT
    identities, so the result is bit-identical to the directed union.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    allpairs = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").cast("bigint").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").cast("bigint").alias("b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    allpairs = allpairs.persist()
    # The raw pair graph is near-complete (every nation trades with
    # every other), where degrees are constant and r is undefined —
    # threshold to the top-quartile trade volumes to expose topology.
    thr = allpairs.agg(F.percentile("cnt", F.lit(0.75)).alias("q"))
    edges = (
        allpairs.transform(scalars(thr))
        .where(F.col("cnt") >= F.col("q"))
        .select("a", "b")
        .persist()  # ≤ |nations|² rows; feeds the deg agg and the stats join
    )
    deg = (
        edges.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    xy = (
        edges.join(
            F.broadcast(deg.select(F.col("node").alias("a"), F.col("d").alias("x"))),
            "a",
        )
        .join(
            F.broadcast(
                deg.select(F.col("node").alias("b"), F.col("d").alias("y"))
            ),
            "b",
        )
        .select("x", "y")
    )
    suff = xy.agg(
        (F.count(F.lit(1)) * 2).cast("bigint").alias("m"),
        F.sum(F.col("x") + F.col("y")).cast("bigint").alias("sx"),
        F.sum(F.col("x") + F.col("y")).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x") + F.col("y") * F.col("y"))
        .cast("bigint")
        .alias("sxx"),
        (F.sum(F.col("x") * F.col("y")) * 2).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x") + F.col("y") * F.col("y"))
        .cast("bigint")
        .alias("syy"),
    )
    return (
        suff.where(
            (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
            & (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
        )
        .select(
            (F.col("m") / 2).cast("bigint").alias("n_edges"),
            round_eps(
                (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
                * 1.0
                / F.sqrt(
                    (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * 1.0
                    * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
                ),
                6,
            ).alias("assortativity"),
        )
    )
