"""Hundred-thirty-eighth sweep (SURVEY.md §2 B254-B255, C225).

Cohen's d / Hedges' g standardized effect sizes for the two-sample
comparison (welch_t_test says WHETHER the urgent and low priority
tiers differ; at corpus n it always rejects, and the standardized
difference says by HOW MUCH in units everyone shares), the Cucconi
location-scale rank test (one statistic that catches a shift in
EITHER mean or spread — the classic pre-test before choosing between
Mann-Whitney and Ansari-Bradley, and older than Lepage), and an AMS
tug-of-war F2 sketch (the Alon-Matias-Szegedy second-moment
estimator — the O(1)-memory answer to 'how skewed is the token
frequency vector' — audited against the exact F2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.stats import normal_cdf, sql_normal_cdf
from ..functions.text import sql_tokens, tokens
from ..operators.attach import attach_scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B254

_Z975 = 1.959963984540054
_SQRT2 = 1.4142135623730951

_B254_ORACLE = f"""
WITH samp AS (
  SELECT (o_orderpriority = '1-URGENT') AS hi,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
m AS (
  SELECT CAST(COUNT(*) FILTER (WHERE hi) AS BIGINT) AS n1,
         CAST(COUNT(*) FILTER (WHERE NOT hi) AS BIGINT) AS n2,
         CAST(SUM(x) FILTER (WHERE hi) AS BIGINT) AS s1,
         CAST(SUM(x) FILTER (WHERE NOT hi) AS BIGINT) AS s2,
         CAST(SUM(CAST(x AS HUGEINT) * x) FILTER (WHERE hi) AS DOUBLE)
           AS q1,
         CAST(SUM(CAST(x AS HUGEINT) * x) FILTER (WHERE NOT hi) AS DOUBLE)
           AS q2
  FROM samp
),
stat AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS diff,
         (q1 - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS v1,
         (q2 - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) AS v2
  FROM m
),
d AS (
  SELECT n1, n2, diff, v2,
         diff / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)) AS d,
         sqrt((n1 + n2 * 1.0) / (n1 * 1.0 * n2)) AS base_se
  FROM stat
)
SELECT n1 AS n_urgent, n2 AS n_low,
       {sql_round('diff / 100.0', 2)} AS mean_diff,
       {sql_round('d', 6)} AS cohens_d,
       {sql_round('(1.0 - 3.0 / (4.0 * (n1 + n2 - 2) - 1.0)) * d', 6)}
         AS hedges_g,
       {sql_round('diff / sqrt(v2)', 6)} AS glass_delta,
       {sql_round(
           f'd - {_Z975!r} * sqrt(base_se * base_se'
           '                      + d * d / (2.0 * (n1 + n2)))', 6)}
         AS d_lo,
       {sql_round(
           f'd + {_Z975!r} * sqrt(base_se * base_se'
           '                      + d * d / (2.0 * (n1 + n2)))', 6)}
         AS d_hi,
       {sql_round(sql_normal_cdf(f'd / {_SQRT2!r}'), 6)} AS cles,
       CASE WHEN ABS(d) >= 0.8 THEN 'large'
            WHEN ABS(d) >= 0.5 THEN 'medium'
            WHEN ABS(d) >= 0.2 THEN 'small'
            ELSE 'negligible' END AS magnitude
FROM d
"""


@register("cohens_d_effect", oracle=_B254_ORACLE)
def cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized two-sample effect sizes for urgent-vs-low order
    value: Cohen's d (pooled SD), Hedges' g (the 1 - 3/(4df-1)
    small-sample bias correction), Glass's delta (control-group SD —
    right when the treatment also changes spread), the d +/- z*SE
    large-sample CI, and the common-language effect size
    Phi(d/sqrt(2)) = P(random urgent order > random low order). The
    inference half lives in welch_t_test; this is the MAGNITUDE half
    that survives corpus-scale n, where every p-value underflows.

    Exactness: per-group moments are exact 128-bit integer sums; the
    effect-size tree is one double expression on six exact numbers.

    Scale shape: ONE map-side-combinable conditional aggregate over
    the fact scan to a single 6-number row — free at any scale.
    """
    samp = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        (F.col("o_orderpriority") == "1-URGENT").alias("hi"),
        F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint").alias("x"),
    )
    dec = "decimal(38,0)"
    x, hi = F.col("x"), F.col("hi")
    m = samp.agg(
        F.count(F.when(hi, 1)).cast("bigint").alias("n1"),
        F.count(F.when(~hi, 1)).cast("bigint").alias("n2"),
        F.sum(F.when(hi, x)).cast("bigint").alias("s1"),
        F.sum(F.when(~hi, x)).cast("bigint").alias("s2"),
        F.sum(F.when(hi, x.cast(dec) * x)).cast("double").alias("q1"),
        F.sum(F.when(~hi, x.cast(dec) * x)).cast("double").alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    stat = m.select(
        n1,
        n2,
        (F.col("s1").cast("double") / n1 - F.col("s2").cast("double") / n2)
        .alias("diff"),
        ((F.col("q1") - F.col("s1").cast("double") * F.col("s1") / n1)
         / (n1 - 1)).alias("v1"),
        ((F.col("q2") - F.col("s2").cast("double") * F.col("s2") / n2)
         / (n2 - 1)).alias("v2"),
    )
    diff = F.col("diff")
    d_expr = diff / F.sqrt(
        ((n1 - 1) * F.col("v1") + (n2 - 1) * F.col("v2")) / (n1 + n2 - 2)
    )
    dd = stat.select(
        n1,
        n2,
        diff,
        F.col("v2"),
        d_expr.alias("d"),
        F.sqrt((n1 + n2 * 1.0) / (n1 * 1.0 * n2)).alias("base_se"),
    )
    d = F.col("d")
    se = F.sqrt(
        F.col("base_se") * F.col("base_se") + d * d / (2.0 * (n1 + n2))
    )
    return dd.select(
        n1.alias("n_urgent"),
        n2.alias("n_low"),
        round_eps(diff / 100.0, 2).alias("mean_diff"),
        round_eps(d, 6).alias("cohens_d"),
        round_eps((1.0 - 3.0 / (4.0 * (n1 + n2 - 2) - 1.0)) * d, 6)
        .alias("hedges_g"),
        round_eps(diff / F.sqrt(F.col("v2")), 6).alias("glass_delta"),
        round_eps(d - _Z975 * se, 6).alias("d_lo"),
        round_eps(d + _Z975 * se, 6).alias("d_hi"),
        round_eps(normal_cdf(d / _SQRT2), 6).alias("cles"),
        F.when(F.abs(d) >= 0.8, "large")
        .when(F.abs(d) >= 0.5, "medium")
        .when(F.abs(d) >= 0.2, "small")
        .otherwise("negligible")
        .alias("magnitude"),
    )


# ---------------------------------------------------------------- B255

_B255_ORACLE = f"""
WITH samp AS (
  SELECT (o_orderstatus = 'O') AS s2,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
  WHERE o_orderstatus IN ('F', 'O')
),
ranked AS (
  SELECT s2,
         2 * RANK() OVER (ORDER BY x)
           + COUNT(*) OVER (PARTITION BY x) - 1 AS r2
  FROM samp
),
agg AS (
  SELECT t.nn AS n,
         CAST(COUNT(*) FILTER (WHERE s2) AS BIGINT) AS n2,
         CAST(SUM(CAST(r2 AS HUGEINT) * r2) FILTER (WHERE s2) AS DOUBLE)
           / 4 AS sr2,
         CAST(SUM(CAST(2 * (t.nn + 1) - r2 AS HUGEINT)
                  * (2 * (t.nn + 1) - r2)) FILTER (WHERE s2) AS DOUBLE)
           / 4 AS sc2
  FROM ranked, (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM samp) t
  GROUP BY t.nn
),
uv AS (
  SELECT n, n2, n - n2 AS n1,
         (6.0 * sr2 - n2 * (n + 1.0) * (2 * n + 1.0))
           / sqrt((n - n2) * 1.0 * n2 * (n + 1.0) * (2 * n + 1.0)
                  * (8 * n + 11.0) / 5.0) AS u,
         (6.0 * sc2 - n2 * (n + 1.0) * (2 * n + 1.0))
           / sqrt((n - n2) * 1.0 * n2 * (n + 1.0) * (2 * n + 1.0)
                  * (8 * n + 11.0) / 5.0) AS v,
         2.0 * (n * n - 4.0) / ((2 * n + 1.0) * (8 * n + 3.0)) - 1.0 AS rho
  FROM agg
),
c AS (
  SELECT n1, n2, u, v, rho,
         (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho))
           AS cstat
  FROM uv
)
SELECT n1 AS n_f, n2 AS n_o,
       {sql_round('u', 6)} AS u_stat,
       {sql_round('v', 6)} AS v_stat,
       {sql_round('rho', 6)} AS rho,
       {sql_round('cstat', 6)} AS c_stat,
       {sql_round('exp(-cstat)', 6)} AS p_value,
       (exp(-cstat) < 0.05) AS reject_05
FROM c
"""


@register("cucconi_test", oracle=_B255_ORACLE)
def cucconi_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cucconi (1968) two-sample location-scale rank test on order
    value, fulfilled vs open: U standardises the sum of squared ranks
    of sample 2, V the sum of squared CONTRA-ranks (N+1-R), and
    C = (U^2+V^2-2 rho UV)/(2(1-rho^2)) is asymptotically exponential
    (p = e^-C). One statistic with power against a shift in mean OR
    spread — what you run before choosing between mann_whitney_u
    (location only) and fligner_killeen (scale only). Midranks handle
    the 2-dp price ties.

    Exactness: doubled midranks 2R = 2*rank + ties - 1 are exact
    integers; BOTH squared-rank sums (direct and contra) are exact
    128-bit integers cast to double once, at the same point as the
    oracle, then divided by 4; the U/V/rho/C tree is one double
    expression on those two numbers.

    Scale shape: ranks come from the VALUE LADDER — one groupBy to
    (price, sample) cells, one cumulative window over the tiny
    distinct-price frame (mann_whitney_u's shape) — so no window ever
    sees the order-grain rows; then ONE map-side-combinable aggregate
    to a single row.
    """
    samp = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus").isin("F", "O")
    ).select(
        (F.col("o_orderstatus") == "O").alias("s2"),
        F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint").alias("x"),
    )
    # Doubled midranks off the VALUE LADDER, not a global rank window:
    # group to (price, sample) cells, cumulative-count the distinct-
    # price frame (a dimension-scale window), and read
    # 2R = 2*below + ties + 1 per price — identical integers to the
    # oracle's 2*RANK + COUNT - 1, with no single-reducer pass over
    # the order-grain frame.
    cells = samp.groupBy("x", "s2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_x = cells.groupBy("x").agg(F.sum("c").cast("bigint").alias("cx"))
    w_lad = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    ladder = per_x.select(
        "x",
        (
            2 * F.coalesce(F.sum("cx").over(w_lad), F.lit(0))
            + F.col("cx")
            + 1
        ).cast("bigint").alias("r2"),
    )
    keyed = cells.join(ladder, "x")
    dec = "decimal(38,0)"
    r2, s2, c = F.col("r2"), F.col("s2"), F.col("c")
    agg = keyed.agg(
        F.sum(c).cast("bigint").alias("n"),
        F.sum(F.when(s2, c)).cast("bigint").alias("n2"),
        F.sum(F.when(s2, c.cast(dec) * (r2.cast(dec) * r2)))
        .cast(dec)
        .alias("sr4d"),
        F.sum(F.when(s2, c.cast(dec) * r2)).cast(dec).alias("sr1d"),
    )
    # Contra-rank sum of squares via the expansion
    #   sum (2(N+1) - r2)^2 = n2*(2(N+1))^2 - 2*(2(N+1))*sum r2
    #                         + sum r2^2
    # evaluated ENTIRELY in decimal(38,0): it is exactly the oracle's
    # HUGEINT integer, so the single cast to double below is
    # bit-identical cross-engine at any scale (a double-path expansion
    # on rounded sr1/sr4 drifts once sr4 passes 2^53).
    n, n2 = F.col("n"), F.col("n2")
    two_np1_d = (2 * (n + 1)).cast(dec)
    sc4d = (
        n2.cast(dec) * two_np1_d * two_np1_d
        - 2 * two_np1_d * F.col("sr1d")
        + F.col("sr4d")
    )
    sr2 = F.col("sr4d").cast("double") / 4.0
    sc2 = sc4d.cast("double") / 4.0
    denom = F.sqrt(
        (n - n2) * 1.0 * n2 * (n + 1.0) * (2 * n + 1.0) * (8 * n + 11.0) / 5.0
    )
    uv = agg.select(
        n,
        n2,
        (n - n2).alias("n1"),
        ((6.0 * sr2 - n2 * (n + 1.0) * (2 * n + 1.0)) / denom).alias("u"),
        ((6.0 * sc2 - n2 * (n + 1.0) * (2 * n + 1.0)) / denom).alias("v"),
        (2.0 * (n * n - 4.0) / ((2 * n + 1.0) * (8 * n + 3.0)) - 1.0)
        .alias("rho"),
    )
    u, v, rho = F.col("u"), F.col("v"), F.col("rho")
    c = uv.select(
        F.col("n1"),
        F.col("n2"),
        u,
        v,
        rho,
        ((u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho)))
        .alias("cstat"),
    )
    cs = F.col("cstat")
    return c.select(
        F.col("n1").alias("n_f"),
        F.col("n2").alias("n_o"),
        round_eps(u, 6).alias("u_stat"),
        round_eps(v, 6).alias("v_stat"),
        round_eps(rho, 6).alias("rho"),
        round_eps(cs, 6).alias("c_stat"),
        round_eps(F.exp(-cs), 6).alias("p_value"),
        (F.exp(-cs) < 0.05).alias("reject_05"),
    )


# ---------------------------------------------------------------- C225

AMS_K = 32  # independent tug-of-war estimators
AMS_G = 4  # median-of-means groups (8 estimators each)

_C225_ORACLE = f"""
WITH tf AS (
  SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS f
  FROM documents,
       UNNEST(list_filter({sql_tokens('lower(text)')}, t -> t <> ''))
         AS u(t)
  GROUP BY t
),
exact AS (
  SELECT CAST(SUM(f) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(CAST(f AS HUGEINT) * f) AS BIGINT) AS exact_f2
  FROM tf
),
signed AS (
  SELECT k,
         CAST(SUM(CASE WHEN substr(md5(token || '#' || CAST(k AS VARCHAR)),
                              1, 1) < '8'
                       THEN f ELSE -f END) AS BIGINT) AS s
  FROM tf CROSS JOIN generate_series(0, {AMS_K - 1}) AS g(k)
  GROUP BY k
),
grouped AS (
  SELECT k // ({AMS_K // AMS_G}) AS grp,
         CAST(SUM(CAST(s AS HUGEINT) * s) AS DOUBLE) / COUNT(*) AS gmean
  FROM signed GROUP BY 1
),
est AS (
  SELECT (SUM(gmean) - MIN(gmean) - MAX(gmean)) / 2.0 AS est_f2
  FROM grouped
)
SELECT n_tokens, vocab, exact_f2,
       {sql_round('est_f2', 2)} AS est_f2,
       {sql_round('ABS(est_f2 - exact_f2) / exact_f2', 6)} AS rel_err
FROM exact CROSS JOIN est
"""


@register("ams_f2_sketch", oracle=_C225_ORACLE)
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alon-Matias-Szegedy tug-of-war sketch of the token-frequency
    second moment F2 = sum f^2 (the self-join size / collision mass
    of the vocabulary — the number behind repetitiveness and
    heavy-hitter skew), audited against the exact value. Each of
    {AMS_K} estimators projects the frequency vector onto a +/-1
    hash-sign vector and squares the sum; median-of-{AMS_G}-means
    tames the heavy-tailed estimator exactly as the paper prescribes
    (median of 4 = mean of the middle two = (sum-min-max)/2, branch-
    free in both engines). The sketch is O(K) memory regardless of
    vocabulary size — the streaming answer when the exact groupBy is
    too wide.

    Exactness: signs come from the first md5 nibble (< '8' = +1), so
    both engines compute identical integer sign-sums; each group mean
    divides one exactly-summed 128-bit integer by the group size and
    casts to double at the same point in both engines, so the median
    is bit-identical at any scale.

    Scale shape: token counts are one shuffle (shared with every
    vocabulary op); the K-way expansion is over the VOCAB frame, not
    the corpus, and collapses to K rows map-side. Exact F2 rides the
    same frame.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(
                F.filter(tokens(F.lower(F.col("text"))), lambda t: t != "")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    tf = tf.persist()
    dec = "decimal(38,0)"
    exact = tf.agg(
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.col("f").cast(dec) * F.col("f")).cast("bigint")
        .alias("exact_f2"),
    )
    ks = F.array([F.lit(k) for k in range(AMS_K)])
    signed = (
        tf.select("token", "f", F.explode(ks).alias("k"))
        .select(
            "k",
            F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("token"),
                            F.lit("#"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    1,
                )
                < "8",
                F.col("f"),
            )
            .otherwise(-F.col("f"))
            .alias("sf"),
        )
        .groupBy("k")
        .agg(F.sum("sf").cast("bigint").alias("s"))
    )
    grouped = (
        signed.groupBy(
            (F.col("k") / (AMS_K // AMS_G)).cast("int").alias("grp")
        )
        .agg(
            F.sum(F.col("s").cast(dec) * F.col("s")).cast(dec).alias("ss"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
        # exact 128-bit integer sum divided by the group size, cast to
        # double at the SAME point as the oracle's CAST(SUM(..) AS
        # DOUBLE)/COUNT(*): bit-identical in both engines at any scale
        # (a per-engine AVG would round along different paths once the
        # group sum passes 2^53).
        .select((F.col("ss").cast("double") / F.col("cnt")).alias("gmean"))
    )
    est = grouped.agg(
        ((F.sum("gmean") - F.min("gmean") - F.max("gmean")) / 2.0)
        .alias("est_f2")
    )
    out = attach_scalars(exact, est)
    return out.select(
        "n_tokens",
        "vocab",
        "exact_f2",
        round_eps(F.col("est_f2"), 2).alias("est_f2"),
        round_eps(
            F.abs(F.col("est_f2") - F.col("exact_f2")) / F.col("exact_f2"), 6
        ).alias("rel_err"),
    )
