"""Forty-second sweep (SURVEY.md §2 B85–B87).

Explicit GROUPING SETS with grouping_id provenance, the
windowFunnel-style max-step-depth funnel, and time-decayed popularity
scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B85

_B85_ORACLE = f"""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INT)
         AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_round(
           "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0", 2)}
         AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus), ())
ORDER BY gid, priority, status
"""


@register("grouping_sets_report", oracle=_B85_ORACLE)
def grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the four aggregation grains a
    dashboard needs ((priority,status), each margin, grand total) in
    ONE pass with GROUPING() provenance so 'ALL' placeholders are
    distinguishable from literal values; completes the B11
    rollup / B15 cube family with the arbitrary-set form.

    Scale shape: Catalyst compiles grouping sets to a single Expand +
    one aggregate — the fact table is scanned ONCE for all four
    grains (vs four scans of a naive UNION ALL); Expand rows combine
    map-side. Cents math keeps revenue exact.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("b85_orders")
    return spark.sql(
        f"""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INT)
         AS gid,
       COUNT(*) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
             + 1e-9, 2) AS revenue
FROM b85_orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus), ())
ORDER BY gid, priority, status
"""
    )


# ---------------------------------------------------------------- B86

FUNNEL_STEPS = ("signup", "view", "click", "purchase")
FUNNEL_WINDOW_S = 86_400  # 24h


_B86_ORACLE = f"""
WITH typed AS (
  SELECT user_id,
         epoch_us(ts) AS us,
         CASE event_type
           {" ".join(
               f"WHEN '{s}' THEN {i + 1}"
               for i, s in enumerate(FUNNEL_STEPS))}
           ELSE 0 END AS step
  FROM events
  WHERE event_type IN ({", ".join(f"'{s}'" for s in FUNNEL_STEPS)})
),
per_user AS (
  SELECT user_id, list([us, step] ORDER BY us, step) AS evs
  FROM typed GROUP BY user_id
),
a1 AS MATERIALIZED (
  SELECT user_id, evs,
         list_min(list_transform(
           list_filter(evs, e -> e[2] = 1), e -> e[1])) AS f1,
         list_min(list_transform(
           list_filter(evs, e -> e[2] = 1), e -> e[1]))
           + {FUNNEL_WINDOW_S}::BIGINT * 1000000 AS wend
  FROM per_user
),
a2 AS MATERIALIZED (
  SELECT *, list_min(list_transform(
    list_filter(evs, e -> e[2] = 2 AND e[1] > f1 AND e[1] <= wend),
    e -> e[1])) AS f2
  FROM a1
),
a3 AS MATERIALIZED (
  SELECT *, list_min(list_transform(
    list_filter(evs, e -> e[2] = 3 AND e[1] > f2 AND e[1] <= wend),
    e -> e[1])) AS f3
  FROM a2
),
a4 AS MATERIALIZED (
  SELECT *, list_min(list_transform(
    list_filter(evs, e -> e[2] = 4 AND e[1] > f3 AND e[1] <= wend),
    e -> e[1])) AS f4
  FROM a3
),
depth AS (
  SELECT user_id,
         CASE WHEN f4 IS NOT NULL THEN 4
              WHEN f3 IS NOT NULL THEN 3
              WHEN f2 IS NOT NULL THEN 2
              WHEN f1 IS NOT NULL THEN 1
              ELSE 0 END AS depth
  FROM a4
)
SELECT CAST(depth AS BIGINT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_users
FROM depth GROUP BY depth ORDER BY depth
"""


@register("window_funnel_depth", oracle=_B86_ORACLE)
def window_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel (the ClickHouse funnel semantics): per user, the
    deepest prefix of signup→view→click→purchase completed IN ORDER
    within {FUNNEL_WINDOW_S // 3600}h of the first step, histogrammed
    by depth. Unlike B21's per-stage conversion counts this enforces
    strict step ORDER and a window anchored at step 1 — the semantics
    product funnels actually mean.

    Scale shape: events filter to funnel types map-side, ONE sorted
    collect per user (the same grain as C52's sequences, capped there;
    at 100 TB the same per-key cap applies), then the anchored chain
    f₁ → f₂ → f₃ → f₄ evaluates as LINEAR array filter/min expressions
    per user — deliberately NOT a list fold: DuckDB 1.0's list_reduce
    re-evaluates the accumulator per reference, turning a multi-branch
    fold exponential, so both engines run the identical filter-chain
    formulation instead.
    """
    step_expr = F.when(F.col("event_type") == FUNNEL_STEPS[0], 1)
    for i, s in enumerate(FUNNEL_STEPS[1:], start=2):
        step_expr = step_expr.when(F.col("event_type") == s, i)
    typed = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(*FUNNEL_STEPS))
        .select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("us"),
            step_expr.alias("step"),
        )
    )
    per_user = typed.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("us", "step"))).alias("evs")
    )

    def step_min(k: int, prev: str) -> F.Column:
        wend = F.col("f1") + FUNNEL_WINDOW_S * 1_000_000
        return F.array_min(
            F.transform(
                F.filter(
                    F.col("evs"),
                    lambda e: (e["step"] == k)
                    & (e["us"] > F.col(prev))
                    & (e["us"] <= wend),
                ),
                lambda e: e["us"],
            )
        )

    anchored = (
        per_user.withColumn(
            "f1",
            F.array_min(
                F.transform(
                    F.filter(F.col("evs"), lambda e: e["step"] == 1),
                    lambda e: e["us"],
                )
            ),
        )
        .withColumn("f2", step_min(2, "f1"))
        .withColumn("f3", step_min(3, "f2"))
        .withColumn("f4", step_min(4, "f3"))
    )
    depth = anchored.select(
        F.when(F.col("f4").isNotNull(), 4)
        .when(F.col("f3").isNotNull(), 3)
        .when(F.col("f2").isNotNull(), 2)
        .when(F.col("f1").isNotNull(), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("depth")
    )
    return (
        depth.groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("depth")
    )


# ---------------------------------------------------------------- B87

DECAY_HALF_LIFE_D = 7.0  # popularity half-life (days)

_B87_ORACLE = f"""
WITH mx AS (SELECT epoch_us(MAX(ts)) AS gm FROM events),
w AS (
  SELECT event_type,
         CAST(ROUND(
           POW(0.5, (((SELECT gm FROM mx) - epoch_us(ts)) / 86400.0e6)
                     / {DECAY_HALF_LIFE_D!r}) * 1e6) AS BIGINT) AS w6
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_round('SUM(w6) / 1e6', 4)} AS decayed_score
FROM w GROUP BY event_type ORDER BY event_type
"""


@register("time_decayed_popularity", oracle=_B87_ORACLE)
def time_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decayed popularity per event type (half-life
    {DECAY_HALF_LIFE_D:g} days, anchored at the newest event) — the
    recency-weighted counting behind trending/recommendation scores;
    a plain COUNT is the λ→0 limit, and at serving time the anchor
    shift is one global multiply (decay composes multiplicatively),
    so the score is incrementally maintainable.

    Scale shape: the anchor is a window max over the (tiny) per-type
    frame — computed here with one extra pass collapsed into the
    aggregate via a window over the fact's type grain? No: ONE
    map-side weight per event against the broadcast anchor, one
    type-grain aggregate. Weights quantise to integer micro-units so
    type sums are exact in any order.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    w_all = Window.partitionBy()
    weighted = ev.select(
        "event_type",
        F.round(
            F.pow(
                F.lit(0.5),
                (
                    (
                        F.unix_micros(F.max("ts").over(w_all))
                        - F.unix_micros("ts")
                    )
                    / 86400.0e6
                )
                / DECAY_HALF_LIFE_D,
            )
            * 1e6
        )
        .cast("bigint")
        .alias("w6"),
    )
    return (
        weighted.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_eps(F.sum("w6") / 1e6, 4).alias("decayed_score"),
        )
        .orderBy("event_type")
    )
