"""Seventy-fourth sweep (SURVEY.md §2 B134-B135, C149).

Kruskal-Wallis k-sample rank test (the >2-group generalization of
B91's Mann-Whitney — one omnibus "do these priority classes differ"
test instead of 10 pairwise U tests), the two-cohort log-rank test
over B72's survival machinery (THE standard "are these survival
curves different" test, exact hypergeometric expectations per event
day), and Levenshtein-blocked fuzzy title linkage (typo-tolerant
entity matching that C35's exact-field record linkage can't do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B134

_B134_ORACLE = f"""
WITH samp AS (
  SELECT o_orderpriority AS g,
         CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders
),
gv AS (
  SELECT g, x, CAST(COUNT(*) AS BIGINT) AS cnt_gx
  FROM samp GROUP BY g, x
),
vv AS (
  SELECT x, CAST(SUM(cnt_gx) AS BIGINT) AS cnt
  FROM gv GROUP BY x
),
ranked AS (
  SELECT x,
         2 * SUM(cnt) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + 1 AS rank2,
         cnt * cnt * cnt - cnt AS tie_term
  FROM vv
),
per_g AS (
  SELECT g, CAST(SUM(cnt_gx) AS BIGINT) AS n_g,
         CAST(SUM(cnt_gx * r.rank2) AS BIGINT) AS r2_g
  FROM gv JOIN ranked r USING (x)
  GROUP BY g
),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         (SELECT CAST(SUM(tie_term) AS BIGINT) FROM ranked) AS ties,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM((r2_g / 2.0) * (r2_g / 2.0) / n_g) AS s2
  FROM per_g
)
SELECT k, n, CAST(k - 1 AS BIGINT) AS df,
       {sql_round('12.0 / (n * (n + 1.0)) * s2 - 3.0 * (n + 1)', 6)}
         AS h_stat,
       {sql_round(
           '(12.0 / (n * (n + 1.0)) * s2 - 3.0 * (n + 1))'
           ' / (1.0 - ties / ((n * 1.0) * n * n - n))', 6)}
         AS h_tie_corrected
FROM tot
"""


@register("kruskal_wallis", oracle=_B134_ORACLE)
def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H test of order value across the
    five order-priority classes — the k-sample omnibus rank test that
    replaces k·(k-1)/2 Mann-Whitney pairs (B91) with ONE chi²(k-1)
    statistic, on average ranks with the standard Σ(t³-t) tie
    correction.

    Scale shape: the fact stream collapses to (group, distinct-value)
    grain in one map-side-combined aggregate (bounded by groups ×
    quantised value range, independent of row count); value-grain
    ranks come from one ordered cumulative window over the bounded
    distinct-value frame (B91's doubled-rank trick keeps them exact
    BIGINTs); per-group rank sums ride a bounded equi-join. Only the
    final H arithmetic leaves integers.
    """
    samp = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint").alias("x"),
    )
    gv = samp.groupBy("g", "x").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_gx")
    )
    gv = gv.persist()
    vv = gv.groupBy("x").agg(F.sum("cnt_gx").cast("bigint").alias("cnt"))
    w_cum = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = vv.select(
        "x",
        (2 * F.sum("cnt").over(w_cum) - F.col("cnt") + 1).alias("rank2"),
        (F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias(
            "tie_term"
        ),
    )
    ranked = ranked.persist()
    per_g = (
        gv.join(ranked.select("x", "rank2"), "x")
        .groupBy("g")
        .agg(
            F.sum("cnt_gx").cast("bigint").alias("n_g"),
            F.sum(F.col("cnt_gx") * F.col("rank2"))
            .cast("bigint")
            .alias("r2_g"),
        )
    )
    ties_frame = ranked.agg(F.sum("tie_term").cast("bigint").alias("ties"))
    w_all = Window.partitionBy()
    tot = per_g.select(
        F.sum("n_g").over(w_all).cast("bigint").alias("n"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("k"),
        F.sum(
            (F.col("r2_g") / 2.0) * (F.col("r2_g") / 2.0) / F.col("n_g")
        )
        .over(w_all)
        .alias("s2"),
    ).limit(1)
    n, ties, s2 = F.col("n"), F.col("ties"), F.col("s2")
    h = 12.0 / (n * (n + 1.0)) * s2 - 3.0 * (n + 1)
    return (
        tot.transform(scalars(ties_frame))
        .select(
            "k",
            "n",
            (F.col("k") - 1).cast("bigint").alias("df"),
            round_eps(h, 6).alias("h_stat"),
            round_eps(
                h / (1.0 - ties / ((n * 1.0) * n * n - n)), 6
            ).alias("h_tie_corrected"),
        )
    )


# ---------------------------------------------------------------- B135

LR_HORIZON_D = 30  # same censoring horizon as B72


_B135_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS coh,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
         MAX(ts) AS last_seen
  FROM events GROUP BY user_id
),
with_event AS (
  SELECT u.user_id, u.coh, u.t0, MIN(e.ts) AS t_purchase
  FROM per_user u
  LEFT JOIN events e
    ON e.user_id = u.user_id AND e.event_type = 'purchase' AND e.ts >= u.t0
  WHERE u.t0 IS NOT NULL
  GROUP BY u.user_id, u.coh, u.t0
),
gmax AS (SELECT MAX(last_seen) AS gm FROM per_user),
obs AS (
  SELECT coh,
         CASE WHEN t_purchase IS NOT NULL
              THEN CAST(floor(epoch(t_purchase - t0) / 86400) AS BIGINT)
              ELSE least(CAST(floor(epoch((SELECT gm FROM gmax) - t0) / 86400)
                              AS BIGINT), {LR_HORIZON_D}) END AS t,
         CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM with_event
),
daily AS (
  SELECT t,
         CAST(SUM(CASE WHEN coh = 0 THEN ev ELSE 0 END) AS BIGINT) AS d0,
         CAST(SUM(CASE WHEN coh = 0 THEN 1 - ev ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN coh = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(CASE WHEN coh = 1 THEN 1 - ev ELSE 0 END) AS BIGINT) AS c1
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, d0, d1,
         CAST(SUM(d0 + c0) OVER ()
           - COALESCE(SUM(d0 + c0) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n0,
         CAST(SUM(d1 + c1) OVER ()
           - COALESCE(SUM(d1 + c1) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n1
  FROM daily
),
terms AS (
  SELECT d1, (d0 + d1) * 1.0 * n1 / (n0 + n1) AS e1,
         CASE WHEN n0 + n1 > 1
              THEN ((d0 + d1) * 1.0 * n0 * n1
                    * (n0 + n1 - d0 - d1))
                   / ((n0 + n1) * 1.0 * (n0 + n1) * (n0 + n1 - 1))
              ELSE 0.0 END AS v
  FROM risk WHERE d0 + d1 > 0
),
agg AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS obs1, SUM(e1) AS exp1, SUM(v) AS vsum,
         CAST(COUNT(*) AS BIGINT) AS n_event_days
  FROM terms
)
SELECT n_event_days, obs1, {sql_round('exp1', 6)} AS exp1,
       {sql_round('(obs1 - exp1) * (obs1 - exp1) / vsum', 6)} AS chi2,
       CASE WHEN (obs1 - exp1) * (obs1 - exp1) / vsum > 3.841
            THEN 1 ELSE 0 END AS significant
FROM agg
"""


@register("logrank_test", oracle=_B135_ORACLE)
def logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-cohort log-rank test (even vs odd user halves) on
    time-from-signup-to-purchase with B72's censoring rules — THE
    standard test for "are these two survival curves different":
    per event day the observed cohort-1 events are compared to the
    hypergeometric expectation d·n1/n with variance
    d·n0·n1·(n-d)/(n²·(n-1)), and the day-summed Χ²(1) decides.

    Scale shape: identical collapse to user grain as B72 (one
    conditional-min aggregate + one purchase-side aggregate); both
    cohorts' daily (d, c) counts come from ONE conditional aggregate
    on the ≤{LR_HORIZON_D}-row day frame, the two at-risk ladders from
    cumulative windows over it, and the test statistic is a 1-row
    reduction. No per-cohort rescan.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t0"
        ),
        F.max("ts").alias("last_seen"),
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.collect_list("ts").alias("pts"))
    )
    w_all = Window.partitionBy()
    joined = (
        per_user.where(F.col("t0").isNotNull())
        .join(purch, "user_id", "left")
        .select(
            (F.col("user_id") % 2).alias("coh"),
            "t0",
            F.array_min(
                F.filter(
                    F.coalesce("pts", F.array()), lambda p: p >= F.col("t0")
                )
            ).alias("t_purchase"),
            F.max("last_seen").over(w_all).alias("gm"),
        )
    )
    days = lambda a, b: F.floor(  # noqa: E731
        (F.unix_timestamp(a) - F.unix_timestamp(b)) / 86400
    ).cast("bigint")
    obs = joined.select(
        "coh",
        F.when(F.col("t_purchase").isNotNull(), days("t_purchase", "t0"))
        .otherwise(F.least(days("gm", "t0"), F.lit(LR_HORIZON_D)))
        .alias("t"),
        F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    cs = lambda c, e: F.sum(  # noqa: E731
        F.when(F.col("coh") == c, e).otherwise(0)
    ).cast("bigint")
    daily = obs.groupBy("t").agg(
        cs(0, F.col("ev")).alias("d0"),
        cs(0, 1 - F.col("ev")).alias("c0"),
        cs(1, F.col("ev")).alias("d1"),
        cs(1, 1 - F.col("ev")).alias("c1"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    tot0 = F.sum(F.col("d0") + F.col("c0")).over(w_all)
    tot1 = F.sum(F.col("d1") + F.col("c1")).over(w_all)
    risk = daily.select(
        "t",
        "d0",
        "d1",
        (
            tot0
            - F.coalesce(
                F.sum(F.col("d0") + F.col("c0")).over(w_prev), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n0"),
        (
            tot1
            - F.coalesce(
                F.sum(F.col("d1") + F.col("c1")).over(w_prev), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n1"),
    )
    d = F.col("d0") + F.col("d1")
    n = F.col("n0") + F.col("n1")
    terms = risk.where(d > 0).select(
        "d1",
        (d * 1.0 * F.col("n1") / n).alias("e1"),
        F.when(
            n > 1,
            (d * 1.0 * F.col("n0") * F.col("n1") * (n - d))
            / (n * 1.0 * n * (n - 1)),
        )
        .otherwise(0.0)
        .alias("v"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_event_days"),
        F.sum("d1").cast("bigint").alias("obs1"),
        F.sum("e1").alias("exp1"),
        F.sum("v").alias("vsum"),
    )
    chi2 = (
        (F.col("obs1") - F.col("exp1"))
        * (F.col("obs1") - F.col("exp1"))
        / F.col("vsum")
    )
    return agg.select(
        "n_event_days",
        "obs1",
        round_eps(F.col("exp1"), 6).alias("exp1"),
        round_eps(chi2, 6).alias("chi2"),
        F.when(chi2 > 3.841, 1).otherwise(0).alias("significant"),
    )


# ---------------------------------------------------------------- C149

FZ_MAX_LEV = 3  # edit-distance acceptance threshold
FZ_MAX_LEN_DIFF = 2  # blocking guard: |len(a)-len(b)| <= this

_C149_ORACLE = f"""
WITH names AS (
  SELECT DISTINCT p_name AS name FROM part
),
keyed AS (
  SELECT name,
         list_extract(str_split(name, ' '), len(str_split(name, ' ')))
           AS blk,
         length(name) AS ln
  FROM names
),
cand AS (
  SELECT a.name AS name_a, b.name AS name_b,
         levenshtein(a.name, b.name) AS lev,
         greatest(a.ln, b.ln) AS mx
  FROM keyed a JOIN keyed b
    ON a.blk = b.blk AND a.name < b.name
   AND abs(a.ln - b.ln) <= {FZ_MAX_LEN_DIFF}
)
SELECT name_a, name_b, CAST(lev AS BIGINT) AS lev,
       {sql_round('1.0 - lev * 1.0 / mx', 4)} AS similarity
FROM cand WHERE lev <= {FZ_MAX_LEV}
ORDER BY name_a, name_b
"""


@register("fuzzy_title_linkage", oracle=_C149_ORACLE)
def fuzzy_title_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant title linkage: distinct part names blocked on
    their head noun (last token) and near-length, verified with exact
    Levenshtein distance ≤ {FZ_MAX_LEV} — the fuzzy-match primitive
    C35's exact-field record linkage and C42's Fellegi-Sunter
    agreement patterns both lack (neither survives a one-character
    typo). Similarity = 1 − lev/max-length, the normalized edit score
    MDM dedup rules threshold on.

    Scale shape: linkage runs on the DISTINCT-name frame (vocabulary
    grain, orders of magnitude below fact grain and roughly constant
    as the fact table grows), so the blocked equi-self-join touches
    |vocab|·avg-block rows; the length guard prunes before the O(m·n)
    Levenshtein evaluates. Block key + length prefilter is the classic
    edit-distance blocking recipe — no all-pairs anywhere.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    keyed = names.select(
        "name",
        F.element_at(F.split(F.col("name"), " "), -1).alias("blk"),
        F.length("name").alias("ln"),
    )
    keyed = keyed.persist()
    a = keyed.select(
        F.col("name").alias("name_a"),
        F.col("blk").alias("blk"),
        F.col("ln").alias("ln_a"),
    )
    b = keyed.select(
        F.col("name").alias("name_b"),
        F.col("blk").alias("blk"),
        F.col("ln").alias("ln_b"),
    )
    cand = a.join(b, "blk").where(
        (F.col("name_a") < F.col("name_b"))
        & (
            F.abs(F.col("ln_a") - F.col("ln_b")) <= FZ_MAX_LEN_DIFF
        )
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        cand.select(
            "name_a",
            "name_b",
            lev.cast("bigint").alias("lev"),
            round_eps(
                1.0 - lev * 1.0 / F.greatest(F.col("ln_a"), F.col("ln_b")),
                4,
            ).alias("similarity"),
        )
        .where(F.col("lev") <= FZ_MAX_LEV)
        .orderBy("name_a", "name_b")
    )
