"""Seventy-ninth sweep (SURVEY.md §2 B144-B145, C154).

One-way ANOVA F (the parametric twin of B134's Kruskal-Wallis on the
same design — mean differences instead of rank differences), the
Wald-Wolfowitz runs test (is the daily order series RANDOM around
its median, or does it trend/oscillate — the independence check
before any i.i.d.-assuming monitor), and the n-gram novelty curve
(what fraction of held-out n-grams were never seen in training — the
memorization-vs-generalization denominator, and the corpus-level
version of C18's per-doc decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B144

_B144_ORACLE = f"""
WITH samp AS (
  SELECT o_orderpriority AS g,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
),
grp AS (
  SELECT g,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(x) AS HUGEINT) AS s1_g,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2_g
  FROM samp GROUP BY g
),
red AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s1_g) AS HUGEINT) AS s1,
         CAST(SUM(s2_g) AS DOUBLE) AS s2d,
         SUM(CAST(s1_g * s1_g AS DOUBLE) / n_g) AS sumt
  FROM grp
),
ss AS (
  SELECT k, n,
         sumt - CAST(s1 * s1 AS DOUBLE) / n AS ssb,
         s2d - sumt AS ssw,
         s2d - CAST(s1 * s1 AS DOUBLE) / n AS sst
  FROM red
)
SELECT k, n,
       {sql_round('(ssb / (k - 1)) / (ssw / (n - k))', 6)} AS f_stat,
       {sql_round('ssb / sst', 6)} AS eta_sq
FROM ss
"""


@register("anova_oneway", oracle=_B144_ORACLE)
def anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test of order value across the five order
    priorities — the parametric mean-difference omnibus on the SAME
    design as B134's Kruskal-Wallis (which tests rank shifts), plus
    eta-squared effect size; B143's normality gate says whether to
    believe this one or B134.

    Exactness: per-group sufficient statistics (n, Sx, Sx²) in cents
    accumulate as 128-bit integers (decimal(38,0) Spark-side, HUGEINT
    in the oracle — llm_plans70's Simpson-audit recipe), so between/
    within sums of squares are each ONE double subtraction of exactly-
    computed terms; no fact-side float accumulation at all.

    Scale shape: one map-side-combined aggregate to |groups| rows,
    then a windowless |groups|-row reduction — the F test at 100 TB
    costs one scan, identical to B134/B143.
    """
    samp = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100 + 1e-9)
        .cast("decimal(38,0)")
        .alias("x"),
    )
    grp = samp.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("x").cast("decimal(38,0)").alias("s1_g"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("s2_g"),
    )
    red = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s1_g").cast("decimal(38,0)").alias("s1"),
        F.sum("s2_g").cast("double").alias("s2d"),
        F.sum(
            (F.col("s1_g") * F.col("s1_g")).cast("double") / F.col("n_g")
        ).alias("sumt"),
    )
    pooled_sq = (F.col("s1") * F.col("s1")).cast("double") / F.col("n")
    ss = red.select(
        "k",
        "n",
        (F.col("sumt") - pooled_sq).alias("ssb"),
        (F.col("s2d") - F.col("sumt")).alias("ssw"),
        (F.col("s2d") - pooled_sq).alias("sst"),
    )
    return ss.select(
        "k",
        "n",
        round_eps(
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
        round_eps(F.col("ssb") / F.col("sst"), 6).alias("eta_sq"),
    )


# ---------------------------------------------------------------- B145

_B145_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY o_orderdate
),
med AS (SELECT MEDIAN(v) AS m FROM daily),
signs AS (
  SELECT d, CASE WHEN v > m THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN med
  WHERE v <> m
),
runs AS (
  SELECT s,
         CASE WHEN s IS DISTINCT FROM
                   LAG(s) OVER (ORDER BY d) THEN 1 ELSE 0 END AS brk
  FROM signs
),
red AS (
  SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(brk) AS BIGINT) AS r
  FROM runs
),
stats AS (
  SELECT n1, n2, r,
         n1 + n2 AS n,
         2.0 * n1 * n2 / (n1 + n2) + 1 AS mu_r,
         sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
              / (((n1 + n2) * 1.0) * (n1 + n2) * (n1 + n2 - 1))) AS sd_r
  FROM red
)
SELECT n1, n2, r AS runs,
       {sql_round('mu_r', 6)} AS expected_runs,
       {sql_round('(r - mu_r) / sd_r', 6)} AS z_stat
FROM stats
"""


@register("runs_test", oracle=_B145_ORACLE)
def runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily revenue series (revenue,
    not order count — integer counts tie with the median everywhere
    at small scale and the standard tie-drop would empty the series):
    code each day above/below the series median (ties dropped, the
    standard treatment), count sign runs, and compare to the exact
    null moments mu_R = 2 n1 n2 / n + 1 — too FEW runs means trend or
    clustering, too MANY means oscillation; the independence check
    that decides whether B110's i.i.d.-assuming anomaly flags and
    B93's correlogram are even interpretable.

    Scale shape: the fact stream collapses to the bounded |days|
    frame in one aggregate; the median attaches via a window over
    that frame (exact — integer counts, both engines interpolate
    identically); run breaks come from one lag window over |days|
    rows; final moments are O(1) algebra on three exact BIGINTs.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("v")
        )
    )
    w_all = Window.partitionBy()
    signs = (
        daily.withColumn("m", F.median("v").over(w_all))
        .where(F.col("v") != F.col("m"))
        .select(
            "d", F.when(F.col("v") > F.col("m"), 1).otherwise(0).alias("s")
        )
    )
    w_d = Window.orderBy("d")
    runs = signs.select(
        "s",
        F.when(
            ~F.lag("s").over(w_d).eqNullSafe(F.col("s")), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    red = runs.agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        F.sum("brk").cast("bigint").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu_r = 2.0 * n1 * n2 / (n1 + n2) + 1
    sd_r = F.sqrt(
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - (n1 + n2))
        / (((n1 + n2) * 1.0) * (n1 + n2) * (n1 + n2 - 1))
    )
    return red.select(
        "n1",
        "n2",
        r.alias("runs"),
        round_eps(mu_r, 6).alias("expected_runs"),
        round_eps((r - mu_r) / sd_r, 6).alias("z_stat"),
    )


# ---------------------------------------------------------------- C154

NOVELTY_MAX_N = 4

def _c154_gram_cte(n: int) -> str:
    toks = "string_split_regex(lower(text), '\\s+')"
    joined = " || ' ' || ".join(f"t[i+{o}]" for o in range(n))
    return f"""
  SELECT {n} AS n, doc_id % 2 AS part, unnest(
    list_transform(generate_series(1, greatest(len(t) - {n - 1}, 0)),
                   i -> {joined})) AS g
  FROM (SELECT doc_id, {toks} AS t FROM documents)"""


_C154_ORACLE = f"""
WITH grams AS (
  {" UNION ALL ".join(_c154_gram_cte(n) for n in range(1, NOVELTY_MAX_N + 1))}
),
seen AS (
  SELECT n, g,
         MAX(CASE WHEN part = 0 THEN 1 ELSE 0 END) AS in_train,
         MAX(CASE WHEN part = 1 THEN 1 ELSE 0 END) AS in_test
  FROM grams GROUP BY n, g
)
SELECT n,
       CAST(SUM(in_test) AS BIGINT) AS n_test_grams,
       CAST(SUM(CASE WHEN in_test = 1 AND in_train = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel_grams,
       {sql_round(
           'SUM(CASE WHEN in_test = 1 AND in_train = 0 THEN 1 ELSE 0 END)'
           ' * 1.0 / SUM(in_test)', 6)} AS novelty_rate
FROM seen GROUP BY n ORDER BY n
"""


@register("ngram_novelty_curve", oracle=_C154_ORACLE)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty curve (n = 1..{NOVELTY_MAX_N}): the fraction of
    DISTINCT held-out-half n-grams never seen in the training half
    (doc_id parity split — C19's deterministic-split convention).
    Unigram novelty is C144's OOV question asked of the full vocab;
    the curve's growth with n is the memorization headroom number —
    high 4-gram novelty on low 1-gram novelty means new COMPOSITIONS
    of known words, the regime where dedup (C5) and decontamination
    (C18) actually matter.

    Scale shape: ONE documents scan — every n's positional gram array
    is built map-side (the zip_with shift chain, no re-evaluation)
    and concatenated as (n, gram) structs before a single explode, so
    all four curves ride one shuffle to (n, gram) grain; existence
    flags are MAX aggregates (no per-doc distinct pass needed); the
    report is a second aggregate over gram-grain rows.
    """
    t = F.col("t")
    per_n = []
    for n in range(1, NOVELTY_MAX_N + 1):
        cur = t
        for off in range(1, n):
            shifted = F.slice(
                t, off + 1, F.greatest(F.size(t) - off, F.lit(0))
            )
            cur = F.zip_with(
                cur, shifted, lambda a, b: F.concat_ws(" ", a, b)
            )
        grams = F.slice(
            cur, 1, F.greatest(F.size(t) - (n - 1), F.lit(0))
        )
        per_n.append(
            F.transform(
                grams, lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))
            )
        )
    docs = load_table(spark, sf_dir, "documents").select(
        F.pmod(F.col("doc_id"), F.lit(2)).alias("part"),
        F.split(F.lower(F.col("text")), r"\s+").alias("t"),
    )
    exploded = docs.select(
        "part", F.explode(F.concat(*per_n)).alias("ng")
    ).select("part", F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    seen = exploded.groupBy("n", "g").agg(
        F.max(F.when(F.col("part") == 0, 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("part") == 1, 1).otherwise(0)).alias("in_test"),
    )
    novel = F.when(
        (F.col("in_test") == 1) & (F.col("in_train") == 0), 1
    ).otherwise(0)
    return (
        seen.groupBy("n")
        .agg(
            F.sum("in_test").cast("bigint").alias("n_test_grams"),
            F.sum(novel).cast("bigint").alias("n_novel_grams"),
            round_eps(
                F.sum(novel) * 1.0 / F.sum("in_test"), 6
            ).alias("novelty_rate"),
        )
        .orderBy("n")
    )
