"""Eighty-eighth sweep (SURVEY.md §2 B162-B163, C163).

Tukey HSD post-hoc pairwise comparisons (WHICH priority classes
differ, after B144's omnibus F says SOME do — with the studentized-
range q that keeps the familywise error rate honest where 10 naive
t-tests would not), Welch's unequal-variance t-test (the two-sample
workhorse with Satterthwaite df — the continuous-outcome sibling of
B60's two-proportion z), and MATTR lexical diversity (moving-average
type-token ratio — the length-unbiased diversity metric where plain
TTR mechanically punishes long documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B162

_B162_ORACLE = f"""
WITH samp AS (
  SELECT o_orderpriority AS g,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
),
grp AS (
  SELECT g,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
  FROM samp GROUP BY g
),
pooled AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(s2 AS DOUBLE) - CAST(s1 * s1 AS DOUBLE) / n) AS ssw
  FROM grp
),
pairs AS (
  SELECT a.g AS g1, b.g AS g2,
         a.n AS n1, b.n AS n2,
         CAST(a.s1 AS DOUBLE) / a.n - CAST(b.s1 AS DOUBLE) / b.n AS diff,
         p.ssw / (p.nt - p.k) AS msw
  FROM grp a JOIN grp b ON a.g < b.g CROSS JOIN pooled p
)
SELECT g1, g2, n1, n2,
       {sql_round('diff / 100.0', 4)} AS mean_diff,
       {sql_round(
           'ABS(diff) / sqrt((msw / 2.0) * (1.0 / n1 + 1.0 / n2))', 6)}
         AS q_stat
FROM pairs ORDER BY g1, g2
"""


@register("tukey_hsd", oracle=_B162_ORACLE)
def tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD studentized-range statistics for every pair of
    order-priority classes: q = |mean_i - mean_j| /
    sqrt((MSW/2)(1/n_i + 1/n_j)) against the pooled within-group
    variance from B144's ANOVA — the post-hoc step that says WHICH
    groups differ while holding the familywise error rate, where
    running C(5,2) = 10 separate t-tests would inflate it.

    Exactness: the same 128-bit per-group sufficient statistics as
    B144 (HUGEINT / decimal(38,0)); MSW and each q are O(1) algebra
    on the |groups|-row frame.

    Scale shape: one fact aggregate to |groups| rows; the pair
    expansion is a self-join of that 5-row frame (10 pairs) plus a
    1-row pooled-variance attach — dimension-scale only.
    """
    samp = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100 + 1e-9)
        .cast("decimal(38,0)")
        .alias("x"),
    )
    grp = samp.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("s2"),
    )
    grp = grp.persist()
    pooled = grp.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.col("s2").cast("double")
            - (F.col("s1") * F.col("s1")).cast("double") / F.col("n")
        ).alias("ssw"),
    )
    a = grp.select(
        F.col("g").alias("g1"),
        F.col("n").alias("n1"),
        (F.col("s1").cast("double") / F.col("n")).alias("m1"),
    )
    b = grp.select(
        F.col("g").alias("g2"),
        F.col("n").alias("n2"),
        (F.col("s1").cast("double") / F.col("n")).alias("m2"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
        .transform(scalars(pooled))
        .select(
            "g1",
            "g2",
            "n1",
            "n2",
            (F.col("m1") - F.col("m2")).alias("diff"),
            (F.col("ssw") / (F.col("nt") - F.col("k"))).alias("msw"),
        )
    )
    q = F.abs(F.col("diff")) / F.sqrt(
        (F.col("msw") / 2.0) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    )
    return pairs.select(
        "g1",
        "g2",
        "n1",
        "n2",
        round_eps(F.col("diff") / 100.0, 4).alias("mean_diff"),
        round_eps(q, 6).alias("q_stat"),
    ).orderBy("g1", "g2")


# ---------------------------------------------------------------- B163

WT_SEG_A = "AUTOMOBILE"
WT_SEG_B = "HOUSEHOLD"

_B163_ORACLE = f"""
WITH samp AS (
  SELECT c.c_mktsegment AS g,
         CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('{WT_SEG_A}', '{WT_SEG_B}')
),
grp AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
  FROM samp GROUP BY g
),
wide AS (
  SELECT MAX(CASE WHEN g = '{WT_SEG_A}' THEN n END) AS n1,
         MAX(CASE WHEN g = '{WT_SEG_A}' THEN CAST(s1 AS DOUBLE) / n END)
           AS m1,
         MAX(CASE WHEN g = '{WT_SEG_A}' THEN
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
             / (n - 1) END) AS v1,
         MAX(CASE WHEN g = '{WT_SEG_B}' THEN n END) AS n2,
         MAX(CASE WHEN g = '{WT_SEG_B}' THEN CAST(s1 AS DOUBLE) / n END)
           AS m2,
         MAX(CASE WHEN g = '{WT_SEG_B}' THEN
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
             / (n - 1) END) AS v2
  FROM grp
)
SELECT n1, n2,
       {sql_round('(m1 - m2) / 100.0', 4)} AS mean_diff,
       {sql_round(
           '(m1 - m2) / sqrt(v1 / n1 + v2 / n2)', 6)} AS t_stat,
       {sql_round(
           '(v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)'
           ' / ((v1 / n1) * (v1 / n1) / (n1 - 1)'
           '    + (v2 / n2) * (v2 / n2) / (n2 - 1))', 4)} AS welch_df
FROM wide
"""


@register("welch_t_test", oracle=_B163_ORACLE)
def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of mean order value between
    the {WT_SEG_A} and {WT_SEG_B} segments, with the Welch-
    Satterthwaite degrees of freedom — the two-sample test that
    stays honest when group variances differ (B148's Brown-Forsythe
    is precisely the check for when Student's pooled t would not),
    and the continuous-outcome sibling of B60's two-proportion z.

    Exactness: per-group moments in 128-bit integers; means,
    variances, t and df are O(1) algebra on a 1-row frame pivoted
    wide by conditional aggregates — no scalar-attach join.

    Scale shape: one key-partitioned orders-customer join, one
    aggregate to 2 rows, one pivot reduction.
    """
    samp = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            F.round(F.col("o_totalprice") * 100 + 1e-9)
            .cast("decimal(38,0)")
            .alias("x"),
        )
        .join(
            load_table(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment").isin(WT_SEG_A, WT_SEG_B))
            .select(
                F.col("c_custkey").alias("ck"),
                F.col("c_mktsegment").alias("g"),
            ),
            "ck",
        )
    )
    grp = samp.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("s2"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / n
    ) / (n - 1)

    def pick(seg, expr):
        return F.max(F.when(F.col("g") == seg, expr))

    wide = grp.agg(
        pick(WT_SEG_A, n).alias("n1"),
        pick(WT_SEG_A, mean).alias("m1"),
        pick(WT_SEG_A, var).alias("v1"),
        pick(WT_SEG_B, n).alias("n2"),
        pick(WT_SEG_B, mean).alias("m2"),
        pick(WT_SEG_B, var).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    df = (se2 * se2) / (
        (F.col("v1") / F.col("n1")) * (F.col("v1") / F.col("n1"))
        / (F.col("n1") - 1)
        + (F.col("v2") / F.col("n2")) * (F.col("v2") / F.col("n2"))
        / (F.col("n2") - 1)
    )
    return wide.select(
        "n1",
        "n2",
        round_eps((F.col("m1") - F.col("m2")) / 100.0, 4).alias(
            "mean_diff"
        ),
        round_eps((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias(
            "t_stat"
        ),
        round_eps(df, 4).alias("welch_df"),
    )


# ---------------------------------------------------------------- C163

MATTR_W = 25

_C163_ORACLE = f"""
WITH toks AS (
  SELECT source, string_split_regex(lower(text), '\\s+') AS t
  FROM documents
),
per_doc AS (
  SELECT source,
         len(t) AS len,
         CASE WHEN len(t) >= {MATTR_W} THEN
           list_aggregate(list_transform(
             generate_series(1, len(t) - {MATTR_W - 1}),
             j -> len(list_distinct(t[j:j+{MATTR_W - 1}]))), 'sum')
         ELSE 0 END AS c_sum,
         CASE WHEN len(t) >= {MATTR_W}
              THEN len(t) - {MATTR_W - 1} ELSE 0 END AS n_win,
         len(list_distinct(t)) AS n_types
  FROM toks
)
SELECT source,
       CAST(SUM(CASE WHEN n_win > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_used,
       CAST(SUM(CASE WHEN n_win = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_short,
       CAST(SUM(n_win) AS BIGINT) AS n_windows,
       {sql_round(
           f'SUM(c_sum) * 1.0 / ({MATTR_W} * SUM(n_win))', 6)} AS mattr,
       {sql_round(
           'SUM(CASE WHEN n_win > 0 THEN n_types ELSE 0 END) * 1.0'
           ' / SUM(CASE WHEN n_win > 0 THEN len ELSE 0 END)', 6)}
         AS pooled_ttr
FROM per_doc GROUP BY source ORDER BY source
"""


@register("mattr_lexical_diversity", oracle=_C163_ORACLE)
def mattr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR lexical diversity per source (Covington-McFall moving-
    average type-token ratio, window {MATTR_W}): the mean distinct
    share over every sliding {MATTR_W}-token window — the diversity
    metric that does NOT mechanically punish long documents the way
    plain TTR does (reported alongside as pooled_ttr for the
    contrast). Low MATTR on a "natural" source = template churn;
    read with C158's hapax tail and C161's entropy ratio.

    Exactness: per-window distinct counts are exact integers summed
    map-side in ARRAY ORDER (a fold, so no accumulation-order
    divergence); MATTR divides two exact integer sums once. Docs
    shorter than the window are excluded and counted (the standard
    treatment).

    Scale shape: pure map-side array work per document (the window
    slide is O(len x W) expression evaluation over a materialised
    token column, no explode, nothing leaves the JVM) into one
    |sources|-key aggregate.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        # coalesce to '' (r7 ADVICE): split(NULL) is NULL and would
        # explode to zero rows, silently dropping the doc from
        # n_docs_short; ''.split yields one empty token, so a NULL-text
        # doc counts as short exactly as the per-doc oracle form does.
        # No NULL texts exist in current data (verified r7) — this only
        # pins the contract.
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+").alias("t"),
    )
    # Sum-of-per-window-distinct via the previous-occurrence identity:
    # token instance i (1-based, prev same-token occurrence p, 0 if
    # none) is the FIRST of its type inside window j iff
    # max(i-W+1, p+1, 1) <= j <= min(i, n_win), so its total
    # contribution over all windows is the length of that interval.
    # Replaces the O(len*W) per-token array_distinct(slice(...)) HOF
    # scan (interpreted, one W-array allocation per window) with one
    # O(len) map pass over a (doc, tok) lag window; every number is
    # the same exact integer. n_types = # first occurrences; short
    # docs contribute 0 automatically (n_win <= 0 empties the
    # interval). split() always yields >= 1 token, so every doc
    # survives the explode and the doc counts are unchanged.
    t = F.col("t")
    pos_rows = docs.select(
        "doc_id",
        "source",
        F.size(t).alias("len"),
        F.posexplode(t).alias("pos0", "tok"),
    )
    wprev = Window.partitionBy("doc_id", "tok").orderBy("pos0")
    i1 = F.col("pos0") + 1
    nwin_c = F.col("len") - (MATTR_W - 1)
    p = F.coalesce(F.lag("pos0").over(wprev) + 1, F.lit(0))
    contrib = F.greatest(
        F.lit(0),
        F.least(i1, nwin_c)
        - F.greatest(i1 - (MATTR_W - 1), p + 1, F.lit(1))
        + 1,
    )
    per_doc = (
        pos_rows.select(
            "doc_id",
            "source",
            "len",
            contrib.alias("contrib"),
            (p == 0).cast("int").alias("is_first"),
        )
        .groupBy("doc_id", "source")
        .agg(
            F.max("len").cast("bigint").alias("len"),
            F.sum("contrib").cast("bigint").alias("c_sum"),
            F.sum("is_first").cast("bigint").alias("n_types"),
        )
        .select(
            "source",
            "len",
            "c_sum",
            F.greatest(F.col("len") - (MATTR_W - 1), F.lit(0))
            .cast("bigint")
            .alias("n_win"),
            "n_types",
        )
    )
    used = F.col("n_win") > 0
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum(F.when(used, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_used"),
            F.sum(F.when(~used, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_short"),
            F.sum("n_win").cast("bigint").alias("n_windows"),
            round_eps(
                F.sum("c_sum") * 1.0 / (MATTR_W * F.sum("n_win")), 6
            ).alias("mattr"),
            round_eps(
                F.sum(F.when(used, F.col("n_types")).otherwise(0))
                * 1.0
                / F.sum(F.when(used, F.col("len")).otherwise(0)),
                6,
            ).alias("pooled_ttr"),
        )
        .orderBy("source")
    )
