"""Fortieth sweep (SURVEY.md §2 B82–B84).

Growth accounting (new/retained/resurrected/churned), winsorized
robust group statistics, and an order-independent table checksum for
replication / migration validation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64
from ..operators.snapshot import monday_of
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- B82

_B82_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week FROM events
),
seq AS (
  SELECT user_id, week,
         MIN(week) OVER (PARTITION BY user_id) AS first_week,
         LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_w,
         LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS next_w,
         MAX(week) OVER () AS max_week
  FROM act
),
states AS (
  SELECT week,
         CAST(SUM(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
         CAST(SUM(CASE WHEN prev_w = week - 7 THEN 1 ELSE 0 END) AS BIGINT)
           AS retained,
         CAST(SUM(CASE WHEN week <> first_week
                        AND (prev_w IS NULL OR prev_w < week - 7)
                   THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
  FROM seq GROUP BY week
),
churn AS (
  SELECT week + 7 AS week, CAST(COUNT(*) AS BIGINT) AS churned
  FROM seq
  WHERE (next_w IS NULL OR next_w > week + 7) AND week + 7 <= max_week
  GROUP BY week + 7
)
SELECT strftime(COALESCE(s.week, c.week), '%Y-%m-%d') AS week,
       COALESCE(s.new_users, 0) AS new_users,
       COALESCE(s.retained, 0) AS retained,
       COALESCE(s.resurrected, 0) AS resurrected,
       COALESCE(c.churned, 0) AS churned
FROM states s FULL OUTER JOIN churn c ON s.week = c.week
ORDER BY week
"""


@register("growth_accounting", oracle=_B82_ORACLE)
def growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — every active user classified
    new / retained / resurrected, plus churn attributed to the week
    after last activity: the standard MAU decomposition identity
    (active_w = new + retained + resurrected; churned_w = active_{w-1}
    − retained_w) product analytics runs everywhere.

    Scale shape: the stream collapses to DISTINCT (user, week) in one
    aggregate; first/prev/next are USER-partitioned windows (distribute
    on user, no global sort); the global max week rides the same frame
    as an unbounded window; weekly states are a \\|weeks\\|-grain
    aggregate merged with the shifted churn frame by a tiny full-outer.
    """
    act = (
        load_table(spark, sf_dir, "events")
        .select("user_id", monday_of(F.col("ts")).alias("week"))
        .distinct()
    )
    w_u = Window.partitionBy("user_id").orderBy("week")
    w_all = Window.partitionBy()
    seq = act.select(
        "user_id",
        "week",
        F.min("week").over(Window.partitionBy("user_id")).alias("first_week"),
        F.lag("week").over(w_u).alias("prev_w"),
        F.lead("week").over(w_u).alias("next_w"),
        F.max("week").over(w_all).alias("max_week"),
    )
    week7 = F.expr("INTERVAL 7 DAYS")
    states = seq.groupBy("week").agg(
        F.sum(F.when(F.col("week") == F.col("first_week"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_users"),
        F.sum(F.when(F.col("prev_w") == F.col("week") - week7, 1).otherwise(0))
        .cast("bigint")
        .alias("retained"),
        F.sum(
            F.when(
                (F.col("week") != F.col("first_week"))
                & (
                    F.col("prev_w").isNull()
                    | (F.col("prev_w") < F.col("week") - week7)
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("resurrected"),
    )
    churn = (
        seq.where(
            (F.col("next_w").isNull() | (F.col("next_w") > F.col("week") + week7))
            & (F.col("week") + week7 <= F.col("max_week"))
        )
        .groupBy((F.col("week") + week7).alias("week"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("churned"))
    )
    merged = states.join(churn, "week", "full")
    return merged.select(
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        F.coalesce("new_users", F.lit(0)).alias("new_users"),
        F.coalesce("retained", F.lit(0)).alias("retained"),
        F.coalesce("resurrected", F.lit(0)).alias("resurrected"),
        F.coalesce("churned", F.lit(0)).alias("churned"),
    ).orderBy("week")


# ---------------------------------------------------------------- B83

WINSOR_LO, WINSOR_HI = 0.05, 0.95

_B83_ORACLE = f"""
WITH base AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
cuts AS (
  SELECT grp,
         ROUND(quantile_cont(cents, {WINSOR_LO}) + 1e-9, 4) AS lo,
         ROUND(quantile_cont(cents, {WINSOR_HI}) + 1e-9, 4) AS hi
  FROM base GROUP BY grp
),
clamped AS (
  SELECT b.grp,
         CAST(ROUND(least(greatest(b.cents * 1.0, c.lo), c.hi) * 1e4)
              AS BIGINT) AS w4
  FROM base b JOIN cuts c USING (grp)
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_round('SUM(w4) * 1.0 / COUNT(*) / 1e4 / 100.0', 4)}
         AS winsorized_mean
FROM clamped GROUP BY grp ORDER BY grp
"""


@register("winsorized_stats", oracle=_B83_ORACLE)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized group means: clamp each group's order values at its
    own exact p5/p95, then average — the outlier-robust mean that
    keeps sample size (unlike trimming), completing the robust block
    (B65 MAD flags outliers, C77 rescales; this summarises).

    Scale shape: exact grouped percentiles in one aggregate
    (approx_percentile is the drop-in at 100 TB — executable via
    SPARK_GRAFT_SCALE_MODE=approx, scale_mode.py), the \\|groups\\|-row
    cut frame broadcast back onto the fact, clamp pure codegen.
    Thresholds are rounded to 4 dp in BOTH engines before the clamp
    and clamped values quantised to integer 1e-4 units, so group sums
    are exact and cross-engine identical.
    """
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cuts = base.groupBy("grp").agg(
        F.round(sm.percentile("cents", WINSOR_LO) + 1e-9, 4).alias("lo"),
        F.round(sm.percentile("cents", WINSOR_HI) + 1e-9, 4).alias("hi"),
    )
    clamped = base.join(F.broadcast(cuts), "grp").select(
        "grp",
        F.round(
            F.least(F.greatest(F.col("cents") * 1.0, F.col("lo")), F.col("hi"))
            * 1e4
        )
        .cast("bigint")
        .alias("w4"),
    )
    return (
        clamped.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_eps(
                F.sum("w4") * 1.0 / F.count(F.lit(1)) / 1e4 / 100.0, 4
            ).alias("winsorized_mean"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------- B84

CKSUM_MOD = 1_000_000_007  # keeps the 150k-row × 2^60 sum inside bigint


_B84_ORACLE = f"""
WITH rows_ AS (
  SELECT date_trunc('week', o_orderdate)::DATE AS week,
         ({sql_hash64(
             "o_orderkey::VARCHAR || '|' || "
             "CAST(ROUND(o_totalprice * 100) AS BIGINT)::VARCHAR"
             " || '|' || o_orderstatus")}) % {CKSUM_MOD} AS h
  FROM orders
)
SELECT strftime(week, '%Y-%m-%d') AS week,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(h) AS BIGINT) AS checksum
FROM rows_ GROUP BY week ORDER BY week
"""


@register("table_checksum", oracle=_B84_ORACLE)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-week table checksums: Σ h(row) mod p over
    a canonical row serialisation — the anti-entropy primitive for
    validating replication / migration / backfill equality WITHOUT
    sorting either side (a sum is commutative, so 1000 executors
    checksum their shards independently and the partials just add;
    the reference re-reads and compares rows, dqa/ integrity checks).

    Scale shape: pure map-side hashing + ONE week-grain aggregate with
    map-side combine; integer math end to end — any row change,
    insert, or drop moves the (n_rows, checksum) pair for exactly its
    week partition, localising the diff.
    """
    rows = load_table(spark, sf_dir, "orders").select(
        monday_of(F.col("o_orderdate")).alias("week"),
        (
            hash64(
                F.concat(
                    F.col("o_orderkey").cast("string"),
                    F.lit("|"),
                    F.round(F.col("o_totalprice") * 100)
                    .cast("bigint")
                    .cast("string"),
                    F.lit("|"),
                    F.col("o_orderstatus"),
                )
            )
            % CKSUM_MOD
        ).alias("h"),
    )
    return (
        rows.groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").cast("bigint").alias("checksum"),
        )
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            "n_rows",
            "checksum",
        )
        .orderBy("week")
    )
