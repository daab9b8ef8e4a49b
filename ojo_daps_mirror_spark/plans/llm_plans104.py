"""Hundred-fourth sweep (SURVEY.md §2 B193-B194, C180).

Customer value-quintile migration (the CRM movement matrix — B46
tracks event types, this tracks ENTITIES across value states),
Erlang-C staffing (the queueing formula that turns B149's lambda
into "how many agents" — the oldest capacity-planning closed form),
and one Jelinek-Mercer EM step (the closed-form interpolation-weight
update for the bigram/unigram mixture — the LM-tuning primitive
under C159's held-out perplexity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import attach_scalars, scalars
from ..operators.lineage import cut_lineage
from ..operators.rank import global_order_stats, ntile_from_rank
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B193

QM_Y0 = 1996
QM_Y1 = 1997

_B193_ORACLE = f"""
WITH per_year AS (
  SELECT o_custkey AS c, CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(ROUND(o_totalprice * 100 + 1e-9) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders WHERE year(o_orderdate) IN ({QM_Y0}, {QM_Y1})
  GROUP BY 1, 2
),
cohort AS (
  SELECT a.c, a.rev AS r0, b.rev AS r1
  FROM (SELECT * FROM per_year WHERE yr = {QM_Y0}) a
  JOIN (SELECT * FROM per_year WHERE yr = {QM_Y1}) b USING (c)
),
q AS (
  SELECT c,
         NTILE(5) OVER (ORDER BY r0, c) AS q0,
         NTILE(5) OVER (ORDER BY r1, c) AS q1
  FROM cohort
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q)
SELECT CAST(q0 AS BIGINT) AS quintile_{QM_Y0},
       CAST(q1 AS BIGINT) AS quintile_{QM_Y1},
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {sql_round('COUNT(*) * 100.0 / MAX(n)', 4)} AS pct_of_cohort
FROM q CROSS JOIN tot
GROUP BY q0, q1 ORDER BY quintile_{QM_Y0}, quintile_{QM_Y1}
"""


@register("quintile_migration_matrix", oracle=_B193_ORACLE)
def quintile_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-quintile migration between {QM_Y0} and
    {QM_Y1}: customers active in BOTH years are quintiled by each
    year's revenue and cross-tabulated — the CRM migration matrix
    whose diagonal is value stability, upper triangle growth, lower
    triangle churn-in-place; B83's growth accounting nets the flows,
    this SHOWS them, and B72/B8 only see presence, not value state.

    Exactness: yearly revenue is exact cents; quintiles are NTILE
    over a deterministic (revenue, custkey) total order (both
    engines bucket remainders identically, B167's guarantee); the
    matrix is exact counts.

    Scale shape: one fact aggregate to (customer, year), a
    customer-key self-join, two NTILE windows over the cohort frame,
    one 25-cell aggregate.
    """
    per_year = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(QM_Y0, QM_Y1))
        .groupBy(
            F.col("o_custkey").alias("c"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100 + 1e-9).cast("bigint")
            )
            .cast("bigint")
            .alias("rev")
        )
    )
    per_year = per_year.persist()
    a = per_year.where(F.col("yr") == QM_Y0).select(
        "c", F.col("rev").alias("r0")
    )
    b = per_year.where(F.col("yr") == QM_Y1).select(
        "c", F.col("rev").alias("r1")
    )
    # The cohort frame feeds SIX plan branches (two global-rank passes
    # of two branches each, the |cohort| scalar, the attach) — the
    # lineage cut materializes the join once instead of replaying it
    # per branch (the range exchanges themselves dedup via
    # ReuseExchange, but the join + filters above them did not).
    both = a.join(b, "c").transform(cut_lineage)
    # Quintiles from two range-partitioned global ranks + the exact
    # NTILE closed form — no unpartitioned NTILE/count windows over
    # the customer-grain cohort (operators/rank.py).
    n_tot = both.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = global_order_stats(
        global_order_stats(both, ["r0", "c"], rn_col="rn0"),
        ["r1", "c"],
        rn_col="rn1",
    )
    q = attach_scalars(ranked, n_tot).select(
        "c",
        "n",
        ntile_from_rank(F.col("rn0"), F.col("n"), 5).alias("q0"),
        ntile_from_rank(F.col("rn1"), F.col("n"), 5).alias("q1"),
    )
    return (
        q.groupBy(
            F.col("q0").cast("bigint").alias(f"quintile_{QM_Y0}"),
            F.col("q1").cast("bigint").alias(f"quintile_{QM_Y1}"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            round_eps(
                F.count(F.lit(1)) * 100.0 / F.max("n"), 4
            ).alias("pct_of_cohort"),
        )
        .orderBy(f"quintile_{QM_Y0}", f"quintile_{QM_Y1}")
    )


# ---------------------------------------------------------------- B194

EC_AHT_MIN = 5.0  # average handle time, minutes
EC_MAX_S = 20
EC_SLA = 0.2  # target P(wait) below this

_B194_ORACLE = f"""
WITH span AS (
  SELECT COUNT(*) * 3600.0
           / date_diff('second', MIN(ts), MAX(ts)) AS lam
  FROM events
),
grid AS (
  SELECT s.s AS s, lam, lam / (60.0 / {EC_AHT_MIN!r}) AS a
  FROM span, (SELECT unnest(generate_series(1, {EC_MAX_S})) AS s) s
),
calc AS (
  SELECT s, lam, a,
         a / s AS rho,
         list_aggregate(list_transform(generate_series(0, s - 1),
             k -> pow(a, k) / factorial(CAST(k AS INTEGER))), 'sum') AS head_sum,
         pow(a, s) / factorial(CAST(s AS INTEGER)) AS tail_term
  FROM grid
),
ec AS (
  SELECT s, lam, a, rho,
         CASE WHEN rho >= 1.0 THEN 1.0
              ELSE (tail_term * (s / (s - a)))
                   / (head_sum + tail_term * (s / (s - a)))
         END AS p_wait
  FROM calc
)
SELECT CAST(s AS BIGINT) AS n_agents,
       {sql_round('lam', 4)} AS arrivals_per_hour,
       {sql_round('rho', 6)} AS utilization,
       {sql_round('p_wait', 6)} AS erlang_c_p_wait,
       CAST(CASE WHEN rho < 1.0 AND p_wait < {EC_SLA!r}
                 THEN 1 ELSE 0 END AS BIGINT) AS meets_sla
FROM ec ORDER BY s
"""


@register("erlang_c_staffing", oracle=_B194_ORACLE)
def erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C staffing grid: from the measured event arrival rate
    and a {EC_AHT_MIN}-minute handle time, the probability an
    arrival must WAIT at s = 1..{EC_MAX_S} agents, with the
    SLA flag (P(wait) < {EC_SLA}, stable queue) — the 1917 queueing
    closed form that turns B149's lambda/W accounting into an actual
    headcount; the smallest flagged s is the answer. Factorial sums
    run over the bounded agent grid (pow/factorial are exact for
    s <= 20), never over data.

    Scale shape: lambda is one aggregate over events; the grid is
    {EC_MAX_S} dimension rows of O(s) closed-form arithmetic.
    """
    span = load_table(spark, sf_dir, "events").agg(
        (
            F.count(F.lit(1))
            * 3600.0
            / (
                F.unix_timestamp(F.max("ts"))
                - F.unix_timestamp(F.min("ts"))
            )
        ).alias("lam")
    )
    grid = span.select(
        "lam", F.explode(F.sequence(F.lit(1), F.lit(EC_MAX_S))).alias("s")
    ).select(
        "s", "lam", (F.col("lam") / (60.0 / EC_AHT_MIN)).alias("a")
    )
    head_sum = F.expr(
        "aggregate(transform(sequence(0, s - 1),"
        " k -> pow(a, k) / factorial(CAST(k AS INTEGER))), 0.0D, (acc, x) -> acc + x)"
    )
    calc = grid.select(
        "s",
        "lam",
        "a",
        (F.col("a") / F.col("s")).alias("rho"),
        head_sum.alias("head_sum"),
        (
            F.pow(F.col("a"), F.col("s"))
            / F.factorial(F.col("s")).cast("double")
        ).alias("tail_term"),
    )
    s, a = F.col("s"), F.col("a")
    tail = F.col("tail_term") * (s / (s - a))
    p_wait = F.when(F.col("rho") >= 1.0, 1.0).otherwise(
        tail / (F.col("head_sum") + tail)
    )
    return calc.select(
        s.cast("bigint").alias("n_agents"),
        round_eps(F.col("lam"), 4).alias("arrivals_per_hour"),
        round_eps(F.col("rho"), 6).alias("utilization"),
        round_eps(p_wait, 6).alias("erlang_c_p_wait"),
        F.when((F.col("rho") < 1.0) & (p_wait < EC_SLA), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("meets_sla"),
    ).orderBy("n_agents")


# ---------------------------------------------------------------- C180

JM_LAMBDA0 = 0.5

_C180_ORACLE = f"""
WITH toks AS (
  SELECT doc_id % 2 AS part,
         string_split_regex(lower(text), '\\s+') AS t
  FROM documents
),
bigrams AS (
  SELECT part,
         unnest(list_transform(
           generate_series(1, greatest(len(t) - 1, 0)),
           i -> {{'w1': t[i], 'w2': t[i+1]}})) AS bg
  FROM toks
),
ev AS (
  SELECT bg.w1 AS w1, bg.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bigrams WHERE part = 1 GROUP BY 1, 2
),
tr_bg AS (
  SELECT bg.w1 AS w1, bg.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM bigrams WHERE part = 0 GROUP BY 1, 2
),
tr_ug AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM tr_bg GROUP BY w1
),
tr_tok AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM (
    SELECT unnest(t) AS tok FROM toks WHERE part = 0
  ) GROUP BY tok
),
tr_tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS tt FROM tr_tok),
scored AS (
  SELECT e.cnt,
         CASE WHEN COALESCE(t1.c1, 0) > 0
              THEN COALESCE(t2.c12, 0) * 1.0 / t1.c1 ELSE 0.0 END AS pb,
         COALESCE(tu.cu, 0) * 1.0 / tt.tt AS pu
  FROM ev e
  LEFT JOIN tr_bg t2 ON e.w1 = t2.w1 AND e.w2 = t2.w2
  LEFT JOIN tr_ug t1 ON e.w1 = t1.w1
  LEFT JOIN tr_tok tu ON e.w2 = tu.tok
  CROSS JOIN tr_tot tt
),
mix AS (
  SELECT cnt, pb, pu,
         {JM_LAMBDA0!r} * pb + (1.0 - {JM_LAMBDA0!r}) * pu AS denom
  FROM scored
),
em AS (
  SELECT CAST(SUM(CASE WHEN denom > 0 THEN cnt ELSE 0 END) AS BIGINT)
           AS n_events,
         CAST(SUM(CASE WHEN denom > 0 THEN 0 ELSE cnt END) AS BIGINT)
           AS n_oov,
         SUM(CASE WHEN denom > 0
                  THEN cnt * ({JM_LAMBDA0!r} * pb) / denom
                  ELSE 0 END)
           / SUM(CASE WHEN denom > 0 THEN cnt ELSE 0 END) AS lam1,
         SUM(CASE WHEN denom > 0 THEN cnt * ln(denom) ELSE 0 END)
           / SUM(CASE WHEN denom > 0 THEN cnt ELSE 0 END) AS ll0
  FROM mix
),
ll1c AS (
  SELECT em.n_events, em.n_oov, em.lam1, em.ll0,
         SUM(CASE WHEN m.denom > 0
                  THEN m.cnt * ln(em.lam1 * m.pb
                                  + (1.0 - em.lam1) * m.pu)
                  ELSE 0 END)
           / em.n_events AS ll1
  FROM mix m CROSS JOIN em
  GROUP BY em.n_events, em.n_oov, em.lam1, em.ll0
)
SELECT n_events, n_oov,
       {sql_round(f'{JM_LAMBDA0!r}', 2)} AS lambda0,
       {sql_round('lam1', 6)} AS lambda1,
       {sql_round('ll0', 6)} AS ll_per_event_before,
       {sql_round('ll1', 6)} AS ll_per_event_after
FROM ll1c
"""


@register("jelinek_mercer_em_step", oracle=_C180_ORACLE)
def jelinek_mercer_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact EM step for the Jelinek-Mercer bigram/unigram
    interpolation weight on held-out data: with lambda0 =
    {JM_LAMBDA0}, each held-out bigram's posterior responsibility
    lambda p_bi / (lambda p_bi + (1-lambda) p_uni) averages into
    lambda1 — the closed-form update (EM on a 2-mixture is exact,
    no optimizer), with held-out log-likelihood before and after
    proving the step helped (EM's monotonicity, verified not
    assumed). The tuning primitive under C159's add-alpha choice;
    bigrams unseen even as unigrams are counted and excluded.

    Scale shape: C159's count-grain discipline — both halves
    collapse to (w1, w2)/(token) counts before any join; scoring is
    three LEFT equi-joins at vocabulary grain + 1-row total
    attaches; the EM statistics and the re-scored LL are two
    reductions over the scored frame (persisted once).
    """
    toks = load_table(spark, sf_dir, "documents").select(
        F.pmod(F.col("doc_id"), F.lit(2)).alias("part"),
        F.split(F.lower(F.col("text")), r"\s+").alias("t"),
    )
    toks = toks.persist()
    t = F.col("t")
    shifted = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
    bg = F.slice(
        F.zip_with(
            t, shifted, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
        ),
        1,
        F.greatest(F.size(t) - 1, F.lit(0)),
    )
    bigrams = toks.select("part", F.explode(bg).alias("bg")).select(
        "part", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    bigrams = bigrams.persist()
    ev = (
        bigrams.where(F.col("part") == 1)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tr_bg = (
        bigrams.where(F.col("part") == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    tr_bg = tr_bg.persist()
    tr_ug = tr_bg.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    tr_tok = (
        toks.where(F.col("part") == 0)
        .select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    )
    tr_tot = tr_tok.agg(F.sum("cu").cast("bigint").alias("tt"))
    scored = (
        ev.join(tr_bg, ["w1", "w2"], "left")
        .join(tr_ug, "w1", "left")
        .join(
            tr_tok.select(F.col("tok").alias("w2"), "cu"), "w2", "left"
        )
        .transform(scalars(tr_tot))
        .select(
            "cnt",
            F.when(
                F.coalesce(F.col("c1"), F.lit(0)) > 0,
                F.coalesce(F.col("c12"), F.lit(0)) * 1.0 / F.col("c1"),
            )
            .otherwise(0.0)
            .alias("pb"),
            (
                F.coalesce(F.col("cu"), F.lit(0)) * 1.0 / F.col("tt")
            ).alias("pu"),
        )
    )
    mix = scored.select(
        "cnt",
        "pb",
        "pu",
        (
            JM_LAMBDA0 * F.col("pb") + (1.0 - JM_LAMBDA0) * F.col("pu")
        ).alias("denom"),
    )
    mix = mix.persist()
    ok = F.col("denom") > 0
    em = mix.agg(
        F.sum(F.when(ok, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_events"),
        F.sum(F.when(ok, 0).otherwise(F.col("cnt")))
        .cast("bigint")
        .alias("n_oov"),
        (
            F.sum(
                F.when(
                    ok,
                    F.col("cnt")
                    * (JM_LAMBDA0 * F.col("pb"))
                    / F.col("denom"),
                ).otherwise(0.0)
            )
            / F.sum(F.when(ok, F.col("cnt")).otherwise(0))
        ).alias("lam1"),
        (
            F.sum(
                F.when(ok, F.col("cnt") * F.log(F.col("denom"))).otherwise(
                    0.0
                )
            )
            / F.sum(F.when(ok, F.col("cnt")).otherwise(0))
        ).alias("ll0"),
    )
    ll1 = (
        mix.transform(scalars(em))
        .groupBy("n_events", "n_oov", "lam1", "ll0")
        .agg(
            (
                F.sum(
                    F.when(
                        ok,
                        F.col("cnt")
                        * F.log(
                            F.col("lam1") * F.col("pb")
                            + (1.0 - F.col("lam1")) * F.col("pu")
                        ),
                    ).otherwise(0.0)
                )
                / F.max("n_events")
            ).alias("ll1")
        )
    )
    return ll1.select(
        "n_events",
        "n_oov",
        round_eps(F.lit(JM_LAMBDA0), 2).alias("lambda0"),
        round_eps(F.col("lam1"), 6).alias("lambda1"),
        round_eps(F.col("ll0"), 6).alias("ll_per_event_before"),
        round_eps(F.col("ll1"), 6).alias("ll_per_event_after"),
    )
