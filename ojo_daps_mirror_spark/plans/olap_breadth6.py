"""OLAP breadth, sixth sweep (SURVEY.md §2 B45–B46, C63).

Semi-additive closing-balance aggregation (the warehouse measure that
must NOT be summed over time), the first-order Markov transition matrix
over event sequences, and a language-ID confusion matrix (the
evaluation-harness query over C3's classifier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B45

_B45_ORACLE = """
WITH running AS (
  SELECT user_id, ts, event_id,
         date_trunc('week', ts)::DATE AS week,
         SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS balance
  FROM events
),
closing AS (
  SELECT user_id, week, balance,
         ROW_NUMBER() OVER (PARTITION BY user_id, week
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM running
)
SELECT strftime(week, '%Y-%m-%d') AS week,
       CAST(COUNT(*) AS BIGINT) AS n_active_users,
       ROUND(SUM(balance) + 1e-9, 4) AS total_closing_balance
FROM closing WHERE rn = 1
GROUP BY week
ORDER BY week
"""


@register("semi_additive_balance", oracle=_B45_ORACLE)
def semi_additive_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-additive measure aggregation: each user's running balance
    (cumulative event value) closes each week at its LAST value, and
    the weekly total sums CLOSING balances across active users —
    never the balances over time (summing a balance across weeks
    double-counts, the classic warehouse semi-additive trap; compare
    the freely-additive volume aggregates A1/A22).

    Scale shape: one (user)-partitioned window builds the running
    balance; the closing-row pick reuses the same partitioning
    (user, week ⊂ user — no second exchange); the weekly total is a
    map-side-combined aggregate over one row per (user, active week).
    Carry-forward for inactive weeks composes with the C51 gap-fill
    pattern when a dense balance sheet is needed.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = events.select(
        "user_id",
        "ts",
        "event_id",
        F.date_trunc("week", "ts").cast("date").alias("week"),
        F.sum("value").over(w_run).alias("balance"),
    )
    w_close = Window.partitionBy("user_id", "week").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    closing = running.withColumn("rn", F.row_number().over(w_close)).where(
        F.col("rn") == 1
    )
    return (
        closing.groupBy(F.date_format("week", "yyyy-MM-dd").alias("week"))
        .agg(
            F.count(F.lit(1)).alias("n_active_users"),
            F.round(F.sum("balance") + 1e-9, 4).alias("total_closing_balance"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------- B46

_B46_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
counts AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT from_type, to_type, n,
       {sql_round("n * 1.0 / SUM(n) OVER (PARTITION BY from_type)", 6)}
         AS prob
FROM counts
ORDER BY from_type, to_type
"""


@register("event_transition_matrix", oracle=_B46_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event sequences:
    P(next event type | current type), row-normalised — the sequence
    model behind funnel diagnostics and next-action prediction
    baselines.

    Scale shape: ONE (user)-partitioned LEAD window produces
    transitions map-side; counts combine to the |types|² matrix; the
    row normalisation is a window over those few rows. The event
    stream is shuffled once, by user — the partitioning the
    sessionize/SCD2 family already uses.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.withColumn("next_type", F.lead("event_type").over(w))
    counts = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_row = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        round_eps(F.col("n") * 1.0 / F.sum("n").over(w_row), 6).alias("prob"),
    ).orderBy("from_type", "to_type")


# ---------------------------------------------------------------- C63


def _c63_oracle() -> str:
    from .text_plans import _C3_ORACLE

    return f"""
WITH preds AS ({_C3_ORACLE}),
joined AS (
  SELECT d.lang AS true_lang, p.pred_lang
  FROM preds p JOIN documents d USING (doc_id)
)
SELECT true_lang, pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_round("COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY true_lang)", 6)}
         AS share_of_true
FROM joined
GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
"""


@register("lang_id_confusion", oracle=_c63_oracle())
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the C3 language-ID classifier against the
    ground-truth lang column: counts and per-true-language recall
    shares — the evaluation-harness query every classifier stage needs
    next to it (the reference evaluates its requires-degree and SOC
    models the same way). The oracle embeds C3's oracle as its
    prediction CTE, so classifier and evaluation can never drift.

    Scale shape: predictions are C3's map-only scoring pass; the
    matrix is a |langs|² aggregate with map-side combine; the recall
    share is a window over those few rows.
    """
    from . import QUERIES

    preds = QUERIES["lang_id"](spark, sf_dir).select("doc_id", "pred_lang")
    truth = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    joined = preds.join(truth, "doc_id")
    counts = joined.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("true_lang")
    return counts.select(
        "true_lang",
        "pred_lang",
        "n",
        round_eps(F.col("n") * 1.0 / F.sum("n").over(w), 6).alias(
            "share_of_true"
        ),
    ).orderBy("true_lang", "pred_lang")
