"""Hundred-fifteenth sweep (SURVEY.md §2 B213-B214, C193-C194).

Delete-one-cluster jackknife standard error beside the naive iid one
(the design-effect number that says how badly clustering voids every
plain-SE inference in the B-track), McNemar's paired switch test on
early-vs-late purchase windows (the PAIRED two-period comparison the
unpaired B60-style z-test gets wrong), the pairwise source vocabulary
overlap matrix (type-level Jaccard AND both asymmetric containments —
subset relationships JS/rank-turbulence distances on counts cannot
see), and adjacent-token mutual information with the uncertainty
coefficient (how much a token tells you about its successor — the
sequence-predictability number next to C23/C159's perplexities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.stats import normal_sf_abs, sql_normal_sf_abs
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B213

_B213_ORACLE = f"""
WITH cents AS (
  SELECT c.c_nationkey AS nk,
         CAST(ROUND(o.o_totalprice * 100 + 1e-9) AS BIGINT) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
per_grp AS (
  SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s_i,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ss_i
  FROM cents GROUP BY nk
),
tot AS (
  SELECT nk, n_i, s_i,
         CAST(SUM(n_i) OVER () AS BIGINT) AS n,
         CAST(SUM(s_i) OVER () AS DOUBLE) AS s,
         CAST(SUM(ss_i) OVER () AS DOUBLE) AS ss,
         CAST(COUNT(*) OVER () AS BIGINT) AS g
  FROM per_grp
),
theta AS (
  SELECT nk, n, s, ss, g,
         (s - CAST(s_i AS DOUBLE)) / (n - n_i) AS th_i
  FROM tot
),
jack AS (
  SELECT MAX(n) AS n, MAX(g) AS g, MAX(s) AS s, MAX(ss) AS ss,
         AVG(th_i) AS th_dot,
         SUM(th_i * th_i) AS sum_th2
  FROM theta
)
SELECT n AS n_orders, g AS n_clusters,
       {sql_round('(s / n) / 100.0', 4)} AS mean_order_value,
       {sql_round(
           'sqrt((n * ss - s * s) / (n * (n - 1.0)) / n) / 100.0', 4)}
         AS se_naive,
       {sql_round(
           'sqrt((g - 1.0) / g * (sum_th2 - g * th_dot * th_dot))'
           ' / 100.0', 4)} AS se_jackknife,
       {sql_round(
           '((g - 1.0) / g * (sum_th2 - g * th_dot * th_dot))'
           ' / ((n * ss - s * s) / (n * (n - 1.0)) / n)', 4)}
         AS design_effect
FROM jack
"""


@register("jackknife_cluster_se", oracle=_B213_ORACLE)
def jackknife_cluster_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-cluster jackknife standard error of the mean order
    value, with nations as the clusters: theta_(i) recomputed with
    nation i deleted, SE_jk from the spread of the 25 leave-one-out
    estimates, laid beside the naive iid SE. design_effect =
    (SE_jk/SE_naive)^2 is the variance inflation every plain-SE
    confidence interval in the B-track silently ignores when
    observations cluster (nation-level price mixes make orders
    within a nation correlated); deff >> 1 means effective sample
    size is n/deff, not n.

    Exactness: per-cluster counts, sums, and squared-cents sums are
    exact 128-bit integers; every leave-one-out estimate is derived
    from those totals by the same double expression tree, and the
    final spread is a 25-term aggregate.

    Scale shape: one broadcast-dim join, one fact-grain aggregate to
    25 sufficient-statistic rows; all jackknife algebra happens on
    the 25-row frame — no second pass over the fact table (the
    grouped-jackknife identity theta_(i) = (S - s_i)/(N - n_i) is
    what makes delete-one-cluster O(G), not O(G * N)).
    """
    cents = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ck"),
            F.round(F.col("o_totalprice") * 100 + 1e-9)
            .cast("bigint")
            .alias("x"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    F.col("c_custkey").alias("ck"),
                    F.col("c_nationkey").alias("nk"),
                )
            ),
            "ck",
        )
    )
    dec = "decimal(38,0)"
    per_grp = cents.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum(F.col("x").cast(dec)).alias("s_i"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("ss_i"),
    )
    w_all = Window.partitionBy()
    tot = per_grp.select(
        "nk",
        "n_i",
        "s_i",
        F.sum("n_i").over(w_all).cast("bigint").alias("n"),
        F.sum("s_i").over(w_all).cast("double").alias("s"),
        F.sum("ss_i").over(w_all).cast("double").alias("ss"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("g"),
    )
    theta = tot.select(
        "n",
        "s",
        "ss",
        "g",
        (
            (F.col("s") - F.col("s_i").cast("double"))
            / (F.col("n") - F.col("n_i"))
        ).alias("th_i"),
    )
    jack = theta.agg(
        F.max("n").alias("n"),
        F.max("g").alias("g"),
        F.max("s").alias("s"),
        F.max("ss").alias("ss"),
        F.avg("th_i").alias("th_dot"),
        F.sum(F.col("th_i") * F.col("th_i")).alias("sum_th2"),
    )
    nd = F.col("n").cast("double")
    gd = F.col("g").cast("double")
    var_naive = (
        (nd * F.col("ss") - F.col("s") * F.col("s")) / (nd * (nd - 1.0)) / nd
    )
    var_jk = (gd - 1.0) / gd * (
        F.col("sum_th2") - gd * F.col("th_dot") * F.col("th_dot")
    )
    return jack.select(
        F.col("n").alias("n_orders"),
        F.col("g").alias("n_clusters"),
        round_eps((F.col("s") / nd) / 100.0, 4).alias("mean_order_value"),
        round_eps(F.sqrt(var_naive) / 100.0, 4).alias("se_naive"),
        round_eps(F.sqrt(var_jk) / 100.0, 4).alias("se_jackknife"),
        round_eps(var_jk / var_naive, 4).alias("design_effect"),
    )


# ---------------------------------------------------------------- B214

MC_EARLY_D = 2  # early window: days [0, 2) after signup
MC_LATE_D = 4  # late window: days [2, 4)

_B214_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0
  FROM events GROUP BY user_id
),
flags AS (
  SELECT u.user_id,
         MAX(CASE WHEN CAST(floor(epoch(e.ts - u.t0) / 86400) AS BIGINT)
                       BETWEEN 0 AND {MC_EARLY_D - 1}
                  THEN 1 ELSE 0 END) AS early,
         MAX(CASE WHEN CAST(floor(epoch(e.ts - u.t0) / 86400) AS BIGINT)
                       BETWEEN {MC_EARLY_D} AND {MC_LATE_D - 1}
                  THEN 1 ELSE 0 END) AS late
  FROM per_user u
  LEFT JOIN events e
    ON e.user_id = u.user_id AND e.event_type = 'purchase'
  WHERE u.t0 IS NOT NULL
  GROUP BY u.user_id
),
cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(early * late) AS BIGINT) AS both_yes,
         CAST(SUM((1 - early) * (1 - late)) AS BIGINT) AS neither,
         CAST(SUM(early * (1 - late)) AS BIGINT) AS b_early_only,
         CAST(SUM((1 - early) * late) AS BIGINT) AS c_late_only
  FROM flags
),
tested AS (
  SELECT *,
         CASE WHEN b_early_only + c_late_only > 0 THEN
           greatest(abs(b_early_only - c_late_only) - 1.0, 0.0)
           * greatest(abs(b_early_only - c_late_only) - 1.0, 0.0)
           / (b_early_only + c_late_only) ELSE 0.0 END AS chi2
  FROM cells
)
SELECT n_users, both_yes, neither, b_early_only, c_late_only,
       {sql_round('(both_yes + b_early_only) * 100.0 / n_users', 4)}
         AS early_rate_pct,
       {sql_round('(both_yes + c_late_only) * 100.0 / n_users', 4)}
         AS late_rate_pct,
       {sql_round('chi2', 4)} AS chi2_cc,
       {sql_round('2.0 * ' + sql_normal_sf_abs('sqrt(chi2)'), 6)}
         AS p_value
FROM tested
"""


@register("mcnemar_purchase_shift", oracle=_B214_ORACLE)
def mcnemar_purchase_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for a shift in purchase propensity between the
    first {MC_EARLY_D} days after signup and days
    {MC_EARLY_D}..{MC_LATE_D - 1}, PAIRED within user: only the
    discordant cells (early-only vs late-only switchers) carry
    information, and the continuity-corrected (|b-c|-1)^2/(b+c) is
    the correct test where an unpaired two-proportion z (B60's
    shape) double-counts the concordant users and overstates n. The
    concordant counts are still reported — they are the pairing's
    power statement.

    Exactness: all five cells are exact integer counts; chi2 and the
    chi^2(1) tail p = 2(1-Phi(sqrt(chi2))) use the shared A&S erf
    polynomial (functions/stats.py) in both engines.

    Scale shape: one user-grain collapse for signup times, one
    conditional re-join against purchases aggregated straight back
    to user grain, then a single 1-row reduction — the same
    two-scan shape as B72/B209.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).alias("t0")
        )
        .where(F.col("t0").isNotNull())
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pt")
    )
    d = F.floor(
        (F.unix_timestamp(F.col("pt")) - F.unix_timestamp(F.col("t0")))
        / 86400
    ).cast("bigint")
    flags = (
        per_user.join(purch, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(d.between(0, MC_EARLY_D - 1), 1).otherwise(0)
            ).alias("early"),
            F.max(
                F.when(d.between(MC_EARLY_D, MC_LATE_D - 1), 1).otherwise(0)
            ).alias("late"),
        )
    )
    cells = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("early") * F.col("late")).cast("bigint").alias("both_yes"),
        F.sum((1 - F.col("early")) * (1 - F.col("late")))
        .cast("bigint")
        .alias("neither"),
        F.sum(F.col("early") * (1 - F.col("late")))
        .cast("bigint")
        .alias("b_early_only"),
        F.sum((1 - F.col("early")) * F.col("late"))
        .cast("bigint")
        .alias("c_late_only"),
    )
    b, c = F.col("b_early_only"), F.col("c_late_only")
    cc = F.greatest(F.abs(b - c) - 1.0, F.lit(0.0))
    chi2 = F.when(b + c > 0, cc * cc / (b + c)).otherwise(0.0)
    tested = cells.withColumn("chi2", chi2)
    return tested.select(
        "n_users",
        "both_yes",
        "neither",
        "b_early_only",
        "c_late_only",
        round_eps((F.col("both_yes") + b) * 100.0 / F.col("n_users"), 4).alias(
            "early_rate_pct"
        ),
        round_eps((F.col("both_yes") + c) * 100.0 / F.col("n_users"), 4).alias(
            "late_rate_pct"
        ),
        round_eps(F.col("chi2"), 4).alias("chi2_cc"),
        round_eps(2.0 * normal_sf_abs(F.sqrt(F.col("chi2"))), 6).alias(
            "p_value"
        ),
    )


# ---------------------------------------------------------------- C193

_C193_ORACLE = f"""
WITH types AS (
  SELECT DISTINCT source,
         unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
tcnt AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS t FROM types GROUP BY source
),
common AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS c
  FROM types a JOIN types b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
),
grid AS (
  SELECT x.source AS s1, y.source AS s2, x.t AS t1, y.t AS t2,
         COALESCE(c.c, 0) AS c
  FROM tcnt x JOIN tcnt y ON x.source < y.source
  LEFT JOIN common c ON c.s1 = x.source AND c.s2 = y.source
)
SELECT s1, s2, t1 AS types_1, t2 AS types_2, c AS common_types,
       {sql_round('c * 1.0 / (t1 + t2 - c)', 6)} AS jaccard,
       {sql_round('c * 1.0 / t1', 6)} AS containment_1_in_2,
       {sql_round('c * 1.0 / t2', 6)} AS containment_2_in_1
FROM grid ORDER BY s1, s2
"""


@register("vocab_overlap_matrix", oracle=_C193_ORACLE)
def vocab_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source vocabulary overlap at the TYPE level: Jaccard
    plus both asymmetric containments |A∩B|/|A| and |A∩B|/|B|. The
    count-weighted distances (C-track Jensen-Shannon, rank
    turbulence, Wasserstein) cannot distinguish 'two sources sample
    the same vocabulary differently' from 'one source's vocabulary
    IS a subset of the other's' — containment can (Broder's
    resemblance-vs-containment split), and subset pairs are merge
    candidates while low-Jaccard-low-containment pairs are genuinely
    disjoint domains.

    Exactness: type sets, their sizes, and all intersections are
    exact integer counts; three ratio columns rounded at 6dp.

    Scale shape: one corpus scan to the distinct (source, token)
    frame; the intersection join is at vocabulary grain where a
    token contributes at most |sources|^2/2 pairs, and the final
    matrix is |sources|^2/2 rows built from a broadcast-size
    per-source count table.
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
        .groupBy(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    grid = (
        tcnt.alias("x")
        .join(
            tcnt.alias("y"), F.col("x.source") < F.col("y.source")
        )
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
            "t1",
            "t2",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    return grid.select(
        "s1",
        "s2",
        F.col("t1").alias("types_1"),
        F.col("t2").alias("types_2"),
        F.col("c").alias("common_types"),
        round_eps(
            F.col("c") * 1.0 / (F.col("t1") + F.col("t2") - F.col("c")), 6
        ).alias("jaccard"),
        round_eps(F.col("c") * 1.0 / F.col("t1"), 6).alias(
            "containment_1_in_2"
        ),
        round_eps(F.col("c") * 1.0 / F.col("t2"), 6).alias(
            "containment_2_in_1"
        ),
    ).orderBy("s1", "s2")


# ---------------------------------------------------------------- C194

_C194_ORACLE = f"""
WITH toks AS (
  SELECT source, string_split_regex(lower(text), '\\s+') AS t
  FROM documents
),
bigrams AS (
  SELECT source,
         unnest(list_transform(
           generate_series(1, greatest(len(t) - 1, 0)),
           i -> {{'w1': t[i], 'w2': t[i+1]}})) AS bg
  FROM toks
),
cxy AS (
  SELECT source, bg.w1 AS w1, bg.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM bigrams GROUP BY 1, 2, 3
),
rmarg AS (
  SELECT source, w1, CAST(SUM(c) AS BIGINT) AS r FROM cxy GROUP BY 1, 2
),
smarg AS (
  SELECT source, w2, CAST(SUM(c) AS BIGINT) AS s FROM cxy GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cxy GROUP BY 1
),
terms AS (
  SELECT x.source, x.w1, x.w2, x.c, r.r, s.s, t.n
  FROM cxy x
  JOIN rmarg r ON x.source = r.source AND x.w1 = r.w1
  JOIN smarg s ON x.source = s.source AND x.w2 = s.w2
  JOIN tot t ON x.source = t.source
),
reps AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source, w2 ORDER BY w1
  ) = 1 AS w_first
  FROM terms
),
agg AS (
  SELECT source, MAX(n) AS n,
         SUM(c * ln(c * 1.0 * n / (r * 1.0 * s))) AS mi_raw,
         -SUM(CASE WHEN w_first THEN s * ln(s * 1.0 / n)
              ELSE 0.0 END) AS h_raw
  FROM reps GROUP BY source
)
SELECT source, n AS n_bigrams,
       {sql_round('mi_raw / n', 4)} AS mi_nats,
       {sql_round('h_raw / n', 4)} AS h_next_nats,
       {sql_round('(mi_raw / n) / (h_raw / n)', 4)} AS uncertainty_coef
FROM agg ORDER BY source
"""


@register("adjacent_token_mi", oracle=_C194_ORACLE)
def adjacent_token_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between a token and its successor per
    source (MI of the adjacency channel), with the successor entropy
    H(next) and Theil's uncertainty coefficient U = MI/H(next): U is
    the fraction of next-token uncertainty the current token already
    resolves — near 0 for bag-of-words text (token order carries
    nothing; C23/C159 perplexities would barely beat unigram), near
    1 for rigid templates. The direct sequence-predictability
    number, comparable across sources because it is normalised.

    Exactness: the joint table and both margins are exact integer
    counts; each source's MI/H sums run over its bounded
    bigram-vocabulary frame and round at 4dp (C159's precedent). The
    successor-entropy contribution is attached to one deterministic
    representative row per (source, w2) so both engines sum
    identical term sets.

    Scale shape: map-side bigram construction (one explode), one
    (source, w1, w2) shuffle; margins and totals are re-aggregations
    of that count table — the corpus is never re-read — and the
    scoring joins are all at bigram-vocabulary grain.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        "source", F.split(F.lower(F.col("text")), r"\s+").alias("t")
    )
    t = F.col("t")
    shifted = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
    bg = F.slice(
        F.zip_with(
            t, shifted, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
        ),
        1,
        F.greatest(F.size(t) - 1, F.lit(0)),
    )
    cxy = (
        toks.select("source", F.explode(bg).alias("bg"))
        .select("source", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("source", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cxy = cxy.persist()
    rmarg = cxy.groupBy("source", "w1").agg(
        F.sum("c").cast("bigint").alias("r")
    )
    smarg = cxy.groupBy("source", "w2").agg(
        F.sum("c").cast("bigint").alias("s")
    )
    tot = cxy.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    terms = (
        cxy.join(rmarg, ["source", "w1"])
        .join(smarg, ["source", "w2"])
        .join(F.broadcast(tot), "source")
    )
    w_rep = Window.partitionBy("source", "w2").orderBy("w1")
    terms = terms.withColumn(
        "w_first", F.row_number().over(w_rep) == 1
    )
    mi_sum = F.sum(
        F.col("c")
        * F.log(
            F.col("c") * 1.0 * F.col("n") / (F.col("r") * 1.0 * F.col("s"))
        )
    )
    h_sum = -F.sum(
        F.when(
            F.col("w_first"),
            F.col("s") * F.log(F.col("s") * 1.0 / F.col("n")),
        ).otherwise(0.0)
    )
    out = terms.groupBy("source").agg(
        F.max("n").alias("n"),
        mi_sum.alias("mi_raw"),
        h_sum.alias("h_raw"),
    )
    return out.select(
        "source",
        F.col("n").alias("n_bigrams"),
        round_eps(F.col("mi_raw") / F.col("n"), 4).alias("mi_nats"),
        round_eps(F.col("h_raw") / F.col("n"), 4).alias("h_next_nats"),
        round_eps(
            (F.col("mi_raw") / F.col("n")) / (F.col("h_raw") / F.col("n")), 4
        ).alias("uncertainty_coef"),
    ).orderBy("source")
