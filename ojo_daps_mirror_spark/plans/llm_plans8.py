"""Eighth sweep (SURVEY.md §2 C51, B39, C52).

Time-series gap-fill (calendar densify + forward fill), rolling z-score
anomaly flags on the weekly monitoring series, and behavioral user
similarity (event-sequence shingle Jaccard — the bot/duplicate-account
detector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C51

_C51_ORACLE = """
WITH daily AS (
  SELECT event_type, ts::DATE AS day,
         ROUND(SUM(value) + 1e-9, 4) AS total
  FROM events GROUP BY event_type, ts::DATE
),
bounds AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
),
calendar AS (
  SELECT t.event_type, d.day::DATE AS day
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series((SELECT lo FROM bounds),
                                  (SELECT hi FROM bounds),
                                  INTERVAL 1 DAY))::DATE AS day
  ) d
),
joined AS (
  SELECT c.event_type, c.day, daily.total
  FROM calendar c LEFT JOIN daily USING (event_type, day)
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS day,
       COALESCE(ROUND(last_value(total IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS UNBOUNDED PRECEDING) + 1e-9, 4), 0.0) AS total_filled,
       CAST(total IS NULL AS INT) AS was_gap
FROM joined
ORDER BY event_type, day
"""


@register("timeseries_gap_fill", oracle=_C51_ORACLE)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densify + forward fill: the daily per-board value
    series with every missing day materialised and carried forward
    from the last observation — the gap-fill step every monitoring /
    indicator series needs before plotting or differencing (the
    reference re-scans instead; dqa/s3_counts.py plots assume dense
    weeks).

    Scale shape: the fact table reduces to (board, day) grain in one
    map-side-combined aggregate; the dense calendar is a
    sequence+explode over a two-scalar broadcast (never a row
    generator on the driver); the forward fill is ONE window per
    board — last(ignorenulls) carries state through the sorted
    partition, the standard distributed as-of/ffill shape (same
    placement as B7's as-of join).
    """
    events = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value") + 1e-9, 4).alias("total"))
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    types = events.select("event_type").distinct()
    calendar = types.transform(scalars(bounds)).select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("day"),
    )
    joined = calendar.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce(
            F.round(F.last("total", ignorenulls=True).over(w) + 1e-9, 4),
            F.lit(0.0),
        ).alias("total_filled"),
        F.col("total").isNull().cast("int").alias("was_gap"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------- B39

Z_THRESHOLD = 2.0

_B39_ORACLE = f"""
WITH weekly AS (
  SELECT event_type, date_trunc('week', ts)::DATE AS week,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, date_trunc('week', ts)::DATE
),
scored AS (
  SELECT event_type, week, n,
         AVG(n) OVER w AS mu,
         STDDEV_SAMP(n) OVER w AS sigma,
         COUNT(*) OVER w AS n_hist
  FROM weekly
  WINDOW w AS (PARTITION BY event_type ORDER BY week
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, strftime(week, '%Y-%m-%d') AS week, n,
       COALESCE({sql_round("mu", 4)}, 0.0) AS baseline_mean,
       CASE WHEN n_hist >= 2 AND sigma > 0
            THEN {sql_round("(n - mu) / sigma", 4)} ELSE 0.0 END AS z_score,
       CASE WHEN n_hist >= 2 AND sigma > 0
                 AND ABS((n - mu) / sigma) > {Z_THRESHOLD}
            THEN 1 ELSE 0 END AS is_anomaly
FROM scored
ORDER BY event_type, week
"""


@register("weekly_anomaly_flags", oracle=_B39_ORACLE)
def weekly_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the weekly collection
    series: each week scored against the mean/std of the 3 PRECEDING
    weeks (never itself — a collection crash must not suppress its own
    alarm by dragging the baseline), flagged when |z| > {Z_THRESHOLD}
    — the alerting layer the reference's DQA plots eyeball manually.

    Scale shape: the fact table reduces to |weeks|×|boards| rows in
    one map-side-combined aggregate; the rolling window runs per board
    over that tiny series. 100 TB of events, a few hundred scored
    rows.
    """
    events = load_table(spark, sf_dir, "events").select("ts", "event_type")
    weekly = events.groupBy(
        "event_type", F.date_trunc("week", "ts").cast("date").alias("week")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("week").rowsBetween(-3, -1)
    scored = weekly.select(
        "event_type",
        "week",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    ok = (F.col("n_hist") >= 2) & (F.col("sigma") > 0)
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return scored.select(
        "event_type",
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        "n",
        F.coalesce(round_eps(F.col("mu"), 4), F.lit(0.0)).alias("baseline_mean"),
        # 0.0 (not NULL) when history is insufficient: a well-defined
        # "no signal" score that also survives cross-engine NULL/NaN
        # comparison quirks in double columns
        F.when(ok, round_eps(z, 4)).otherwise(0.0).alias("z_score"),
        F.when(ok & (F.abs(z) > Z_THRESHOLD), 1).otherwise(0).alias("is_anomaly"),
    ).orderBy("event_type", "week")


# ---------------------------------------------------------------- C52

BEHAV_NGRAM = 3
BEHAV_JACCARD = 0.35  # calibrated: p99 of the pair distribution at test SFs
BEHAV_GRAM_CAP = 500  # inverted-index heavy-gram guard (same role as NG_DF_CAP)
# Per-user sequence cap: bounds the sorted-collect state per key (a
# hyperactive user/bot must not OOM its reducer); far above any real
# per-user volume at test SFs, so results are unchanged there.
BEHAV_MAX_EVENTS = 5000

_C52_ORACLE = f"""
WITH seq AS (
  SELECT user_id,
         (list(event_type ORDER BY ts, event_id))[1:{BEHAV_MAX_EVENTS}] AS es
  FROM events GROUP BY user_id
),
grams AS (
  SELECT user_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(es) - {BEHAV_NGRAM - 1}, 0)),
           i -> es[i] || '>' || es[i+1] || '>' || es[i+2])) AS gs
  FROM seq
),
pairs AS (
  SELECT a.user_id AS u1, b.user_id AS u2,
         len(list_intersect(a.gs, b.gs)) * 1.0
           / len(list_distinct(a.gs || b.gs)) AS jac
  FROM grams a JOIN grams b ON a.user_id < b.user_id
)
SELECT u1, u2, {sql_round("jac", 4)} AS jaccard
FROM pairs WHERE jac >= {BEHAV_JACCARD}
ORDER BY u1, u2
"""


@register("user_behavior_similarity", oracle=_C52_ORACLE)
def user_behavior_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral similarity: users whose event-type SEQUENCES share
    ≥{BEHAV_JACCARD} Jaccard over {BEHAV_NGRAM}-gram shingles — the
    duplicate-account / bot-ring detector (trajectory-similarity
    search on the categorical event stream).

    Scale shape: sequences assemble in one sorted-collect groupBy;
    candidate pairs come from an INVERTED INDEX on the gram (pairs
    expand map-side from per-gram user lists, capped at
    {BEHAV_GRAM_CAP} — a gram carried by everyone is boilerplate and
    can't evidence similarity anyway, the C5/C7 hot-bucket rule), and
    exact Jaccard verifies only candidates via one gram-set rejoin.
    The oracle uses the all-pairs self-join form — correct, and
    quadratic, which is the point of not running it.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    seqs = events.groupBy("user_id").agg(
        F.slice(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            1,
            BEHAV_MAX_EVENTS,
        ).alias("es")
    )
    es = F.col("es")
    cur = es
    for off in range(1, BEHAV_NGRAM):
        shifted = F.slice(es, off + 1, F.greatest(F.size(es) - off, F.lit(0)))
        cur = F.zip_with(cur, shifted, lambda a, b: F.concat_ws(">", a, b))
    grams = seqs.select(
        "user_id",
        F.array_distinct(
            F.slice(cur, 1, F.greatest(F.size(es) - (BEHAV_NGRAM - 1), F.lit(0)))
        ).alias("gs"),
    ).persist()
    inv = (
        grams.select("user_id", F.explode("gs").alias("g"))
        .groupBy("g")
        .agg(F.array_sort(F.collect_set("user_id")).alias("us"))
        .where((F.size("us") >= 2) & (F.size("us") <= BEHAV_GRAM_CAP))
    )
    us = F.col("us")
    pair_arr = F.flatten(
        F.transform(
            us,
            lambda x, i: F.transform(
                F.slice(us, i + F.lit(2), F.size(us)),
                lambda y: F.struct(x.alias("u1"), y.alias("u2")),
            ),
        )
    )
    cand = (
        inv.select(F.explode(pair_arr).alias("p"))
        .select("p.u1", "p.u2")
        .distinct()
    )
    a = grams.select(F.col("user_id").alias("u1"), F.col("gs").alias("gs1"))
    b = grams.select(F.col("user_id").alias("u2"), F.col("gs").alias("gs2"))
    jac = (
        F.size(F.array_intersect("gs1", "gs2"))
        * F.lit(1.0)
        / F.size(F.array_union("gs1", "gs2"))
    )
    return (
        F.broadcast(cand)
        .join(a, "u1")
        .join(b, "u2")
        .select("u1", "u2", jac.alias("jac"))
        .where(F.col("jac") >= BEHAV_JACCARD)
        .select("u1", "u2", round_eps(F.col("jac"), 4).alias("jaccard"))
        .orderBy("u1", "u2")
    )
