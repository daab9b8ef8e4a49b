"""Eighty-fifth sweep (SURVEY.md §2 B156-B157, C160).

Wilson score intervals for per-group proportions (the binomial CI
that actually behaves at small n and extreme p, unlike the Wald
interval dashboards default to), Chapman capture-recapture (estimate
the size of a population you can only sample twice — ecology's
estimator, pointed at "how many customers exist that we ever see"),
and the KMV bottom-k distinct sketch (the ORDER-STATISTICS
distinct-count estimator: deterministic given the hash, so unlike
C13's HLL it gets a bit-exact oracle and a measurable error-vs-k
curve).
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

# ---------------------------------------------------------------- B156

WILSON_Z = 1.959963984540054  # 95%

_B156_ORACLE = f"""
WITH grp AS (
  SELECT o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM orders GROUP BY 1
),
wil AS (
  SELECT priority, n, k,
         k * 1.0 / n AS p,
         {WILSON_Z!r} * {WILSON_Z!r} AS z2
  FROM grp
)
SELECT priority, n, k,
       {sql_round('p', 6)} AS p_hat,
       {sql_round(
           '(p + z2 / (2 * n) - {z} * sqrt(p * (1 - p) / n'
           ' + z2 / (4.0 * n * n))) / (1 + z2 / n)'.format(z=WILSON_Z),
           6)} AS ci_lo,
       {sql_round(
           '(p + z2 / (2 * n) + {z} * sqrt(p * (1 - p) / n'
           ' + z2 / (4.0 * n * n))) / (1 + z2 / n)'.format(z=WILSON_Z),
           6)} AS ci_hi
FROM wil ORDER BY priority
"""


@register("wilson_ci", oracle=_B156_ORACLE)
def wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% interval for the fulfilled-order share per
    priority class — the binomial CI that stays inside [0,1] and
    keeps coverage at small n / extreme p where the Wald interval
    (p +- z sqrt(pq/n)) that B77-style dashboards default to
    collapses; the correct error bar for every proportion this
    engine reports.

    Exactness: n and k are exact BIGINTs from one aggregate; the
    Wilson algebra is O(1) per group with identical IEEE shapes.

    Scale shape: one map-side-combined aggregate to |priorities|
    rows; nothing else touches data volume.
    """
    grp = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("k"),
        )
    )
    n = F.col("n")
    p = F.col("k") * 1.0 / n
    z2 = WILSON_Z * WILSON_Z
    half = WILSON_Z * F.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
    centre = p + z2 / (2 * n)
    denom = 1 + z2 / n
    return grp.select(
        "priority",
        "n",
        "k",
        round_eps(p, 6).alias("p_hat"),
        round_eps((centre - half) / denom, 6).alias("ci_lo"),
        round_eps((centre + half) / denom, 6).alias("ci_hi"),
    ).orderBy("priority")


# ---------------------------------------------------------------- B157

CR_YEAR_1 = 1996
CR_YEAR_2 = 1997

_B157_ORACLE = f"""
WITH flags AS (
  SELECT o_custkey,
         MAX(CASE WHEN year(o_orderdate) = {CR_YEAR_1} THEN 1 ELSE 0 END)
           AS in1,
         MAX(CASE WHEN year(o_orderdate) = {CR_YEAR_2} THEN 1 ELSE 0 END)
           AS in2,
         1 AS ever
  FROM orders GROUP BY 1
),
red AS (
  SELECT CAST(SUM(in1) AS BIGINT) AS n1,
         CAST(SUM(in2) AS BIGINT) AS n2,
         CAST(SUM(in1 * in2) AS BIGINT) AS m,
         CAST(SUM(ever) AS BIGINT) AS n_true
  FROM flags
),
est AS (
  SELECT n1, n2, m, n_true,
         (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0 AS n_hat,
         (n1 + 1.0) * (n2 + 1.0) * (n1 - m * 1.0) * (n2 - m * 1.0)
           / (((m + 1.0) * (m + 1.0)) * (m + 2.0)) AS var_hat
  FROM red
)
SELECT n1 AS captured_y1, n2 AS captured_y2, m AS recaptured,
       n_true AS ever_active,
       {sql_round('n_hat', 4)} AS chapman_estimate,
       {sql_round('sqrt(var_hat)', 4)} AS chapman_se,
       {sql_round('(n_hat - n_true) * 100.0 / n_true', 4)} AS bias_pct
FROM est
"""


@register("capture_recapture", oracle=_B157_ORACLE)
def capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the active-customer
    universe: customers ordering in {CR_YEAR_1} are the first
    capture, {CR_YEAR_2} the second, the overlap is the recapture —
    N_hat = (n1+1)(n2+1)/(m+1) - 1 with its closed-form SE, compared
    to the directly-observed ever-active count. The ecology
    estimator that answers "how big is the population we only ever
    sample" — the same mark-recapture logic dedup-rate extrapolation
    (C121) leans on.

    Exactness: all four counts come from ONE customer-grain
    conditional aggregate (no distinct-per-year passes, no join);
    the estimator is O(1) algebra.

    Scale shape: one fact scan to customer grain with MAX flags, one
    4-counter reduction — the population estimate at 100 TB costs
    one shuffle at customer cardinality.
    """
    flags = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.when(F.year("o_orderdate") == CR_YEAR_1, 1).otherwise(0)
            ).alias("in1"),
            F.max(
                F.when(F.year("o_orderdate") == CR_YEAR_2, 1).otherwise(0)
            ).alias("in2"),
        )
    )
    red = flags.agg(
        F.sum("in1").cast("bigint").alias("n1"),
        F.sum("in2").cast("bigint").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
    )
    n1, n2, m, nt = F.col("n1"), F.col("n2"), F.col("m"), F.col("n_true")
    n_hat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    var_hat = (
        (n1 + 1.0)
        * (n2 + 1.0)
        * (n1 - m * 1.0)
        * (n2 - m * 1.0)
        / (((m + 1.0) * (m + 1.0)) * (m + 2.0))
    )
    return red.select(
        n1.alias("captured_y1"),
        n2.alias("captured_y2"),
        m.alias("recaptured"),
        nt.alias("ever_active"),
        round_eps(n_hat, 4).alias("chapman_estimate"),
        round_eps(F.sqrt(var_hat), 4).alias("chapman_se"),
        round_eps((n_hat - nt) * 100.0 / nt, 4).alias("bias_pct"),
    )


# ---------------------------------------------------------------- C160

KMV_KS = (64, 128, 256)
KMV_HASH_MAX = float(2**60)  # hash64 is 15 hex chars = 60 bits

_C160_ORACLE = f"""
WITH hashes AS (
  SELECT DISTINCT {sql_hash64('text')} AS h FROM documents
),
ranked AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM hashes
),
exact AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM hashes),
grid AS (
  SELECT rk AS k, h AS h_k FROM ranked
  WHERE rk IN ({", ".join(str(k) for k in KMV_KS)})
)
SELECT CAST(k AS BIGINT) AS k, n_exact,
       {sql_round(f'(k - 1.0) * {KMV_HASH_MAX!r} / h_k', 4)}
         AS kmv_estimate,
       {sql_round(
           f'((k - 1.0) * {KMV_HASH_MAX!r} / h_k - n_exact)'
           ' * 100.0 / n_exact', 4)} AS rel_err_pct
FROM grid CROSS JOIN exact ORDER BY k
"""


@register("kmv_distinct_sketch", oracle=_C160_ORACLE)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k / k-minimum-values) distinct-count sketch over
    document content hashes, at k = {KMV_KS}: N_hat = (k-1) * H / h_(k)
    from the k-th smallest 60-bit hash, reported against the exact
    distinct count as an error-vs-k curve. The order-statistics
    sketch is DETERMINISTIC given the hash function — so unlike
    C13's HLL (rows-only, tolerance-tested) it gets a bit-exact
    cross-engine oracle; it is also mergeable (union = k smallest of
    the union), which is what makes it the distributed-sketch
    workhorse for distinct counts under shuffle constraints.

    Scale shape: content hashing is map-side; the bottom-k selection
    is a global ascending rank consumed at rk <= max(k) —
    TakeOrdered at scale, only max(k) rows survive; the exact count
    (the audit side) is one aggregate; the k-grid report is 3 rows.
    """
    hashes = (
        load_table(spark, sf_dir, "documents")
        .select(hash64(F.col("text")).alias("h"))
        .distinct()
    )
    hashes = hashes.persist()
    ranked = hashes.withColumn(
        "rk", F.row_number().over(Window.orderBy("h"))
    ).where(F.col("rk") <= max(KMV_KS))
    grid = ranked.where(F.col("rk").isin(*KMV_KS)).select(
        F.col("rk").alias("k"), F.col("h").alias("h_k")
    )
    exact = hashes.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    est = (F.col("k") - 1.0) * KMV_HASH_MAX / F.col("h_k")
    return (
        grid.transform(scalars(exact))
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_exact",
            round_eps(est, 4).alias("kmv_estimate"),
            round_eps(
                (est - F.col("n_exact")) * 100.0 / F.col("n_exact"), 4
            ).alias("rel_err_pct"),
        )
        .orderBy("k")
    )
