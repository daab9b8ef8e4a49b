"""Forty-third sweep (SURVEY.md §2 B88–B90).

Offline bandit policy evaluation by replay, a 7-way star-join
optimizer stress query, and dwell-time (inter-event gap) analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- B88

BANDIT_EPS = 20  # percent exploration in the evaluated policy
BANDIT_ARMS = ("view", "click", "purchase", "signup", "error")
BANDIT_BEST = "purchase"  # the policy's exploit arm


def _policy_sql(key: str) -> str:
    """ε-greedy policy: explore uniformly over arms with prob ε,
    exploit BANDIT_BEST otherwise — all randomness md5-derived."""
    n = len(BANDIT_ARMS)
    arm_list = ", ".join(f"'{a}'" for a in BANDIT_ARMS)
    return f"""
CASE WHEN ({sql_hash64(key + " || '~e'")}) % 100 < {BANDIT_EPS}
     THEN list_value({arm_list})[
       ({sql_hash64(key + " || '~a'")}) % {n} + 1]
     ELSE '{BANDIT_BEST}' END
"""


_B88_ORACLE = f"""
WITH logged AS (
  SELECT event_id, event_type AS logged_arm,
         CAST(ROUND(value * 10000) AS BIGINT) AS reward4,
         {_policy_sql('event_id::VARCHAR')} AS policy_arm
  FROM events
),
matched AS (
  SELECT policy_arm, reward4 FROM logged WHERE policy_arm = logged_arm
)
SELECT policy_arm AS arm,
       CAST(COUNT(*) AS BIGINT) AS n_matched,
       {sql_round('SUM(reward4) * 1.0 / COUNT(*) / 1e4', 4)} AS est_value
FROM matched GROUP BY policy_arm ORDER BY arm
"""


@register("bandit_replay_eval", oracle=_B88_ORACLE)
def bandit_replay_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline bandit policy evaluation by REPLAY (Li et al. 2011):
    run an ε-greedy policy over the logged stream and score it only
    on events where the policy's choice matches the logged action —
    the unbiased counterfactual estimator when logging was uniform.
    The policy's randomness is md5-derived (reproducible across
    engines/runs), treating the event stream as the bandit log.

    Scale shape: policy choice + match filter are pure map-side
    expressions; ONE arm-grain aggregate with map-side combine;
    rewards in integer 1e-4 units so arm sums are exact.
    """
    n = len(BANDIT_ARMS)
    eps_u = hash64(F.concat(F.col("event_id").cast("string"), F.lit("~e"))) % 100
    arm_i = hash64(F.concat(F.col("event_id").cast("string"), F.lit("~a"))) % n
    policy = F.when(
        eps_u < BANDIT_EPS,
        F.element_at(F.array(*[F.lit(a) for a in BANDIT_ARMS]), (arm_i + 1).cast("int")),
    ).otherwise(F.lit(BANDIT_BEST))
    logged = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("logged_arm"),
        F.round(F.col("value") * 10000).cast("bigint").alias("reward4"),
        policy.alias("policy_arm"),
    )
    return (
        logged.where(F.col("policy_arm") == F.col("logged_arm"))
        .groupBy(F.col("policy_arm").alias("arm"))
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            round_eps(F.sum("reward4") * 1.0 / F.count(F.lit(1)) / 1e4, 4).alias(
                "est_value"
            ),
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------- B89

_B89_ORACLE = f"""
SELECT r.r_name AS region,
       n.n_name AS nation,
       p.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {sql_round(
           "SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)"
           " * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) / 1e4",
           2)} AS revenue,
       {sql_round(
           "SUM(CAST(ROUND(p.p_retailprice * 100) AS BIGINT)"
           " * CAST(l.l_quantity AS BIGINT)) / 100.0", 2)} AS retail_value
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE o.o_orderdate >= DATE '1995-01-01'
  AND c.c_mktsegment = 'BUILDING'
  AND p.p_size <= 15
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@register("star_join_7way", oracle=_B89_ORACLE)
def star_join_7way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-table star/snowflake join (the TPC-DS-class optimizer
    stress): fact lineitem joined through orders→customer and
    supplier→nation→region plus part,
    with selective predicates on three different dimensions. What's
    under test is the PLAN: Catalyst should broadcast every pruned
    dimension (all qualify under the threshold), push each predicate
    into its dimension scan, and keep the fact table un-shuffled
    until the final 3-key aggregate — one fact pass, zero fact-side
    wide shuffles before the groupBy.

    Cents×pct integer math keeps both measures exact in any order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "1995-01-01"
    )
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 15)
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    retail = F.round(F.col("p_retailprice") * 100).cast("bigint") * F.col(
        "l_quantity"
    ).cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            round_eps(F.sum(rev) / 1e4, 2).alias("revenue"),
            round_eps(F.sum(retail) / 100.0, 2).alias("retail_value"),
        )
        .orderBy("region", "nation", "brand")
    )


# ---------------------------------------------------------------- B90

DWELL_CAP_S = 1800  # gaps above 30 min treated as session breaks

_B90_ORACLE = f"""
WITH gaps AS (
  SELECT event_type,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS gap_us
  FROM events
),
ok AS (
  SELECT event_type, gap_us FROM gaps
  WHERE gap_us IS NOT NULL AND gap_us <= {DWELL_CAP_S}::BIGINT * 1000000
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       {sql_round('SUM(gap_us) * 1.0 / COUNT(*) / 1e6', 4)} AS mean_dwell_s,
       {sql_round('ROUND(quantile_cont(gap_us, 0.5) + 1e-9, 4) / 1e6', 6)}
         AS median_dwell_s
FROM ok GROUP BY event_type ORDER BY event_type
"""


@register("dwell_time_by_type", oracle=_B90_ORACLE)
def dwell_time_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell time per event type: the gap to the user's NEXT event
    (session-break capped at {DWELL_CAP_S}s) — the engagement metric
    behind "how long do users stay on X", and the complement of
    sessionization (B5 uses the same gaps to CUT sessions; this
    measures them).

    Scale shape: one LEAD window partitioned by user (distributes on
    the user key), then a type-grain aggregate; gaps in exact integer
    micros, mean via integer sums, median an exact grouped percentile
    (approx_percentile at 100 TB — executable via
    SPARK_GRAFT_SCALE_MODE=approx, scale_mode.py).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = load_table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
        ).alias("gap_us"),
    )
    ok = gaps.where(
        F.col("gap_us").isNotNull()
        & (F.col("gap_us") <= F.lit(DWELL_CAP_S * 1_000_000))
    )
    return (
        ok.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            round_eps(F.sum("gap_us") * 1.0 / F.count(F.lit(1)) / 1e6, 4).alias(
                "mean_dwell_s"
            ),
            round_eps(
                F.round(sm.percentile("gap_us", 0.5) + 1e-9, 4) / 1e6, 6
            ).alias("median_dwell_s"),
        )
        .orderBy("event_type")
    )
