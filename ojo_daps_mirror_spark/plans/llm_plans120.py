"""Hundred-twentieth sweep (SURVEY.md §2 B226-B227, C198).

Engle-Granger cointegration on two segments' CUMULATIVE volumes (two
trending books can be spuriously correlated — B224/B225 read the
increments, this asks whether the LEVELS share one stochastic trend),
Mood's k-sample median test (the most assumption-free location test in
the family, closing KW/Brown-Forsythe's block), and bottom-k MinHash
Jaccard estimates judged cell-by-cell against C193's exact vocabulary
overlap matrix (the sketch-accuracy audit for the size the engine
would actually ship at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.attach import attach_scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B226

EG_SEG_A = "BUILDING"
EG_SEG_B = "MACHINERY"
EG_CRIT_5 = -3.34  # Engle-Granger 5% critical value, 2 variables
# (MacKinnon 1991/2010 response-surface tables — public constants).

_B226_ORACLE = f"""
WITH weekly AS (
  SELECT c.c_mktsegment AS seg,
         CAST(datediff('day', DATE '1970-01-05',
                       date_trunc('week', o.o_orderdate)::DATE) / 7
              AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{EG_SEG_A}', '{EG_SEG_B}')
  GROUP BY 1, 2
),
pivoted AS (
  SELECT w,
         CAST(SUM(CASE WHEN seg = '{EG_SEG_A}' THEN y ELSE 0 END)
              AS BIGINT) AS xa,
         CAST(SUM(CASE WHEN seg = '{EG_SEG_B}' THEN y ELSE 0 END)
              AS BIGINT) AS yb
  FROM weekly GROUP BY w
),
levels AS (
  SELECT w,
         CAST(SUM(xa) OVER (ORDER BY w
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS xc,
         CAST(SUM(yb) OVER (ORDER BY w
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS yc
  FROM pivoted
),
lsum AS (
  SELECT w, xc, yc,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(xc) OVER () AS BIGINT) AS sx,
         CAST(SUM(yc) OVER () AS BIGINT) AS sy,
         CAST(SUM(CAST(xc AS HUGEINT) * xc) OVER () AS DOUBLE) AS sxx,
         CAST(SUM(CAST(xc AS HUGEINT) * yc) OVER () AS DOUBLE) AS sxy
  FROM levels
),
resid AS (
  SELECT w, n,
         yc - (sy * 1.0 / n)
            - ((n * sxy - CAST(sx AS DOUBLE) * sy)
               / (n * sxx - CAST(sx AS DOUBLE) * sx))
              * (xc - sx * 1.0 / n) AS z
  FROM lsum
),
df AS (
  SELECT z, LAG(z) OVER (ORDER BY w) AS z1 FROM resid
),
dfsum AS (
  SELECT CAST(COUNT(z1) AS BIGINT) AS m,
         SUM(CASE WHEN z1 IS NOT NULL THEN z1 * (z - z1) ELSE 0 END)
           AS szd,
         SUM(CASE WHEN z1 IS NOT NULL THEN z1 * z1 ELSE 0 END) AS szz,
         SUM(CASE WHEN z1 IS NOT NULL THEN (z - z1) * (z - z1)
             ELSE 0 END) AS sdd
  FROM df
),
tested AS (
  SELECT m, szd / szz AS rho,
         (szd / szz)
           / sqrt(((sdd - (szd / szz) * szd) / (m - 1.0)) / szz)
           AS adf_t
  FROM dfsum
)
SELECT m AS n_diffs,
       {sql_round('rho', 6)} AS resid_ar_coef,
       {sql_round('adf_t', 4)} AS adf_t_stat,
       {EG_CRIT_5!r} AS crit_5pct,
       CASE WHEN adf_t < {EG_CRIT_5!r} THEN 1 ELSE 0 END AS cointegrated_5pct
FROM tested
"""


@register("engle_granger_coint", oracle=_B226_ORACLE)
def engle_granger_coint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger two-step cointegration between the CUMULATIVE
    weekly volumes of {EG_SEG_A} and {EG_SEG_B}: OLS the levels,
    then Dickey-Fuller the residual (Delta-z on z_1, no constant)
    against MacKinnon's 5% critical value for two variables. Two
    integrated series correlate near 1 whether or not anything links
    them — the spurious-regression trap B56-style correlations fall
    into on trending data; cointegration is the non-spurious
    version: a stationary residual means one stochastic trend is
    SHARED, so a spread-based monitor (alert when the gap leaves its
    band) is statistically sound. B224/B225 read the increments;
    this reads the levels.

    Exactness: cumulative levels and the OLS moment sums are exact
    128-bit integers; residuals, the AR coefficient, and the ADF t
    are identical double trees (the residual is evaluated per-row
    from sufficient statistics, not from per-engine regression
    internals).

    Scale shape: one fact collapse to the week grid, two ordered
    windows (cumulation, lag), 1-row sufficient statistics — the
    whole test is dimension-scale after the first shuffle.
    """
    weekly = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"), F.col("o_orderdate").alias("d")
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    F.col("c_custkey").alias("ck"),
                    F.col("c_mktsegment").alias("seg"),
                )
            ),
            "ck",
        )
        .where(F.col("seg").isin(EG_SEG_A, EG_SEG_B))
        .groupBy(
            "seg",
            (
                F.datediff(
                    F.date_trunc("week", F.col("d")).cast("date"),
                    F.lit("1970-01-05").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("w"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    pivot = weekly.groupBy("w").agg(
        F.sum(F.when(F.col("seg") == EG_SEG_A, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("xa"),
        F.sum(F.when(F.col("seg") == EG_SEG_B, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("yb"),
    )
    w_cum = Window.orderBy("w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    levels = pivot.select(
        "w",
        F.sum("xa").over(w_cum).cast("bigint").alias("xc"),
        F.sum("yb").over(w_cum).cast("bigint").alias("yc"),
    )
    w_all = Window.partitionBy()
    dec = "decimal(38,0)"
    lsum = levels.select(
        "w",
        "xc",
        "yc",
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.sum("xc").over(w_all).cast("bigint").alias("sx"),
        F.sum("yc").over(w_all).cast("bigint").alias("sy"),
        F.sum(F.col("xc").cast(dec) * F.col("xc"))
        .over(w_all)
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("xc").cast(dec) * F.col("yc"))
        .over(w_all)
        .cast("double")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    beta = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    resid = lsum.select(
        "w",
        "n",
        (
            F.col("yc")
            - (F.col("sy") * 1.0 / F.col("n"))
            - beta * (F.col("xc") - F.col("sx") * 1.0 / F.col("n"))
        ).alias("z"),
    )
    df = resid.select(
        "z", F.lag("z").over(Window.orderBy("w")).alias("z1")
    )
    has = F.col("z1").isNotNull()
    dfsum = df.agg(
        F.count("z1").cast("bigint").alias("m"),
        F.sum(
            F.when(has, F.col("z1") * (F.col("z") - F.col("z1"))).otherwise(
                0.0
            )
        ).alias("szd"),
        F.sum(F.when(has, F.col("z1") * F.col("z1")).otherwise(0.0)).alias(
            "szz"
        ),
        F.sum(
            F.when(
                has, (F.col("z") - F.col("z1")) * (F.col("z") - F.col("z1"))
            ).otherwise(0.0)
        ).alias("sdd"),
    )
    rho = F.col("szd") / F.col("szz")
    adf_t = rho / F.sqrt(
        ((F.col("sdd") - rho * F.col("szd")) / (F.col("m") - 1.0))
        / F.col("szz")
    )
    tested = dfsum.select(
        "m", rho.alias("rho"), adf_t.alias("adf_t")
    )
    return tested.select(
        F.col("m").alias("n_diffs"),
        round_eps(F.col("rho"), 6).alias("resid_ar_coef"),
        round_eps(F.col("adf_t"), 4).alias("adf_t_stat"),
        F.lit(EG_CRIT_5).alias("crit_5pct"),
        (F.col("adf_t") < EG_CRIT_5).cast("int").alias("cointegrated_5pct"),
    )


# ---------------------------------------------------------------- B227

_B227_ORACLE = f"""
WITH cents AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
),
vals AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM cents GROUP BY x
),
med AS (
  SELECT MIN(x) AS m FROM (
    SELECT x,
           SUM(c) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(c) OVER () AS n
    FROM vals
  ) WHERE cum >= CAST(ceil(n / 2.0) AS BIGINT)
),
cells AS (
  SELECT grp,
         CAST(SUM(CASE WHEN x > (SELECT m FROM med)
                       THEN 1 ELSE 0 END) AS BIGINT) AS above,
         CAST(SUM(CASE WHEN x <= (SELECT m FROM med)
                       THEN 1 ELSE 0 END) AS BIGINT) AS at_below
  FROM cents GROUP BY grp
),
tot AS (
  SELECT CAST(SUM(above) AS BIGINT) AS ta,
         CAST(SUM(at_below) AS BIGINT) AS tb,
         CAST(SUM(above + at_below) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM cells
),
chi AS (
  SELECT t.k, t.n,
         SUM(
           (c.above - (c.above + c.at_below) * 1.0 * t.ta / t.n)
           * (c.above - (c.above + c.at_below) * 1.0 * t.ta / t.n)
           / ((c.above + c.at_below) * 1.0 * t.ta / t.n)
           + (c.at_below - (c.above + c.at_below) * 1.0 * t.tb / t.n)
           * (c.at_below - (c.above + c.at_below) * 1.0 * t.tb / t.n)
           / ((c.above + c.at_below) * 1.0 * t.tb / t.n)
         ) AS chi2
  FROM cells c CROSS JOIN tot t
  GROUP BY t.k, t.n
)
SELECT n AS n_orders, k AS n_groups,
       {sql_round('chi2', 4)} AS chi2_stat,
       9.488 AS crit_5pct_df4,
       CASE WHEN chi2 > 9.488 THEN 1 ELSE 0 END AS reject_5pct
FROM chi
"""


@register("mood_median_test", oracle=_B227_ORACLE)
def mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's k-sample median test on order values across the five
    priorities: dichotomise every order at the POOLED median
    (rank-selected exactly on the value-grain ladder — no
    approximate percentile) and chi-square the resulting k x 2
    table. The most assumption-free location test in the family —
    Kruskal-Wallis needs comparable shapes for a location reading,
    ANOVA needs variances (Brown-Forsythe's precondition); Mood's
    only asks 'above the common median or not', so it survives
    arbitrary heavy tails and is the honest first screen before the
    sharper tests spend their assumptions.

    Exactness: the pooled median is an exact order statistic off the
    value-grain cumulative ladder; all cells are exact integers and
    the chi-square is one identical double expression.

    Scale shape: one value-grain aggregate for the median ladder
    (dimension-scale: |distinct cents| rows), the 1-row median
    broadcast back onto one fact-grain conditional aggregate to
    k x 2 cells.
    """
    cents = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100 + 1e-9)
        .cast("bigint")
        .alias("x"),
    )
    cents = cents.persist()
    vals = cents.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    med = (
        vals.select(
            "x",
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_all).alias("n"),
        )
        .where(F.col("cum") >= F.ceil(F.col("n") / 2.0).cast("bigint"))
        .agg(F.min("x").alias("m"))
    )
    cells = (
        attach_scalars(cents, med)
        .groupBy("grp")
        .agg(
            F.sum(F.when(F.col("x") > F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("above"),
            F.sum(F.when(F.col("x") <= F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("at_below"),
        )
    )
    tot = cells.agg(
        F.sum("above").cast("bigint").alias("ta"),
        F.sum("at_below").cast("bigint").alias("tb"),
        F.sum(F.col("above") + F.col("at_below")).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    joined = attach_scalars(cells, tot)
    row = F.col("above") + F.col("at_below")
    ea = row * 1.0 * F.col("ta") / F.col("n")
    eb = row * 1.0 * F.col("tb") / F.col("n")
    chi = joined.groupBy("k", "n").agg(
        F.sum(
            (F.col("above") - ea) * (F.col("above") - ea) / ea
            + (F.col("at_below") - eb) * (F.col("at_below") - eb) / eb
        ).alias("chi2")
    )
    return chi.select(
        F.col("n").alias("n_orders"),
        F.col("k").alias("n_groups"),
        round_eps(F.col("chi2"), 4).alias("chi2_stat"),
        F.lit(9.488).alias("crit_5pct_df4"),
        (F.col("chi2") > 9.488).cast("int").alias("reject_5pct"),
    )


# ---------------------------------------------------------------- C198

MH_SKETCH_K = 128  # bottom-k sketch size per source

_C198_ORACLE = f"""
WITH types AS (
  SELECT DISTINCT source,
         unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
hashed AS (
  SELECT source, tok, {sql_hash64('tok')} AS h FROM types
),
sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {MH_SKETCH_K}
),
pairs AS (
  SELECT a.source AS s1, b.source AS s2
  FROM (SELECT DISTINCT source FROM types) a
  JOIN (SELECT DISTINCT source FROM types) b ON a.source < b.source
),
u AS (
  SELECT p.s1, p.s2, x.h,
         MAX(x.in1) AS in1, MAX(x.in2) AS in2
  FROM pairs p
  JOIN (
    SELECT source, h, 1 AS in1, 0 AS in2 FROM sk
    UNION ALL
    SELECT source, h, 0 AS in1, 1 AS in2 FROM sk
  ) x ON (x.in1 = 1 AND x.source = p.s1)
      OR (x.in2 = 1 AND x.source = p.s2)
  GROUP BY p.s1, p.s2, x.h
),
est AS (
  SELECT s1, s2,
         CAST(SUM(in1 * in2) AS BIGINT) AS inter_k
  FROM (
    SELECT s1, s2, h, in1, in2,
           ROW_NUMBER() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn
    FROM u
  ) WHERE rn <= {MH_SKETCH_K}
  GROUP BY s1, s2
),
tcnt AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS t FROM types GROUP BY source
),
common AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS c
  FROM types a JOIN types b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
),
exact AS (
  SELECT x.source AS s1, y.source AS s2,
         COALESCE(c.c, 0) * 1.0 / (x.t + y.t - COALESCE(c.c, 0)) AS j
  FROM tcnt x JOIN tcnt y ON x.source < y.source
  LEFT JOIN common c ON c.s1 = x.source AND c.s2 = y.source
)
SELECT e.s1, e.s2,
       {sql_round('x.j', 6)} AS jaccard_exact,
       {sql_round(f'e.inter_k * 1.0 / {MH_SKETCH_K}', 6)} AS jaccard_est,
       {sql_round(f'abs(e.inter_k * 1.0 / {MH_SKETCH_K} - x.j)', 6)}
         AS abs_err
FROM est e JOIN exact x ON e.s1 = x.s1 AND e.s2 = x.s2
ORDER BY e.s1, e.s2
"""


@register("minhash_jaccard_vs_exact", oracle=_C198_ORACLE)
def minhash_jaccard_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (k={MH_SKETCH_K}) MinHash Jaccard estimates for every
    source pair, judged cell-by-cell against the EXACT vocabulary
    Jaccard (C193's matrix): the estimator is the classic merge of
    two bottom-k sketches — take the k smallest hashes of the union,
    count how many live in both sketches, divide by k. At 100 TB the
    exact matrix costs a vocabulary-grain self-join; the sketches
    cost k integers per source and merge in milliseconds — this
    query prints exactly what that compression buys and what it
    costs in error, pair by pair.

    Exactness: both engines hash with the shared md5-based hash64
    (functions/text.py), so sketches, thresholds, and intersections
    are identical exact integers; the exact side reuses C193's
    frames verbatim.

    Scale shape: sketches are one rank-window over the distinct
    (source, token) frame; the pairwise merge runs on
    |sources|^2/2 x 2k sketch rows — independent of corpus size —
    while the exact side (the audit target) is the only
    vocabulary-grain join.
    """
    types = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        )
        .distinct()
    )
    types = types.persist()
    hashed = types.select("source", "tok", hash64(F.col("tok")).alias("h"))
    w_src = Window.partitionBy("source").orderBy("h")
    sk = (
        hashed.select("source", "h", F.row_number().over(w_src).alias("rn"))
        .where(F.col("rn") <= MH_SKETCH_K)
        .select("source", "h")
    )
    sk = sk.persist()
    srcs = types.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
    )
    a_rows = pairs.join(
        sk.select(F.col("source").alias("s1"), "h"), "s1"
    ).select("s1", "s2", "h", F.lit(1).alias("in1"), F.lit(0).alias("in2"))
    b_rows = pairs.join(
        sk.select(F.col("source").alias("s2"), "h"), "s2"
    ).select("s1", "s2", "h", F.lit(0).alias("in1"), F.lit(1).alias("in2"))
    u = (
        a_rows.unionByName(b_rows)
        .groupBy("s1", "s2", "h")
        .agg(F.max("in1").alias("in1"), F.max("in2").alias("in2"))
    )
    w_pair = Window.partitionBy("s1", "s2").orderBy("h")
    est = (
        u.select(
            "s1", "s2", "in1", "in2", F.row_number().over(w_pair).alias("rn")
        )
        .where(F.col("rn") <= MH_SKETCH_K)
        .groupBy("s1", "s2")
        .agg(F.sum(F.col("in1") * F.col("in2")).cast("bigint").alias("inter_k"))
    )
    tcnt = types.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    common = (
        types.alias("a")
        .join(
            types.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("s1"), F.col("b.source").alias("s2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    exact = (
        tcnt.alias("x")
        .join(tcnt.alias("y"), F.col("x.source") < F.col("y.source"))
        .select(
            F.col("x.source").alias("s1"),
            F.col("y.source").alias("s2"),
            F.col("x.t").alias("t1"),
            F.col("y.t").alias("t2"),
        )
        .join(common, ["s1", "s2"], "left")
        .select(
            "s1",
            "s2",
            (
                F.coalesce(F.col("c"), F.lit(0))
                * 1.0
                / (F.col("t1") + F.col("t2") - F.coalesce(F.col("c"), F.lit(0)))
            ).alias("j"),
        )
    )
    out = est.join(exact, ["s1", "s2"])
    j_est = F.col("inter_k") * 1.0 / MH_SKETCH_K
    return out.select(
        "s1",
        "s2",
        round_eps(F.col("j"), 6).alias("jaccard_exact"),
        round_eps(j_est, 6).alias("jaccard_est"),
        round_eps(F.abs(j_est - F.col("j")), 6).alias("abs_err"),
    ).orderBy("s1", "s2")
