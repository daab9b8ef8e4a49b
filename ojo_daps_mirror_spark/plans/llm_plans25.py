"""Twenty-fifth sweep (SURVEY.md §2 B59, C84).

Exact distinct counting via mergeable bitmap aggregates and frequent
2-sequence mining over user event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B59

_B59_ORACLE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


@register("bitmap_distinct_users", oracle=_B59_ORACLE)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type through bitmap aggregates
    (bitmap_bucket_number / bitmap_construct_agg / bitmap_count) — the
    third point on the distinct-counting spectrum: COUNT(DISTINCT)
    re-shuffles raw values (B44's pain), approx_count_distinct (B13) is
    mergeable but approximate, BITMAPS are mergeable AND exact for
    integer keys: each 32k-id bucket folds into a fixed-size bitmap
    map-side, buckets merge associatively, and the final count is a sum
    of popcounts. At 100 TB this is how exact audience counts stay one
    combined aggregate. The oracle is plain COUNT(DISTINCT) — equality
    is the exactness proof.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return (
        ev.groupBy(
            "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
        )
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
        )
        .groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- C84

SEQ_TOP = 15

_C84_ORACLE = f"""
WITH firsts AS (
  SELECT user_id, event_type, MIN(ts) AS first_ts, MIN(event_id) AS tie_id
  FROM events GROUP BY user_id, event_type
),
pairs AS (
  SELECT a.event_type AS first_event, b.event_type AS then_event,
         COUNT(*) AS n_users
  FROM firsts a JOIN firsts b
    ON a.user_id = b.user_id
   AND a.event_type <> b.event_type
   AND (a.first_ts < b.first_ts
        OR (a.first_ts = b.first_ts AND a.tie_id < b.tie_id))
  GROUP BY 1, 2
),
tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS t FROM events)
SELECT first_event, then_event, CAST(n_users AS BIGINT) AS n_users,
       {sql_round('n_users * 100.0 / (SELECT t FROM tot)', 6)} AS support_pct
FROM pairs
ORDER BY n_users DESC, first_event, then_event
LIMIT {SEQ_TOP}
"""


@register("sequence_mining_2seq", oracle=_C84_ORACLE)
def sequence_mining_2seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 2-sequence mining (the PrefixSpan first level): for
    every ordered pair of event types, how many users did A strictly
    before B (first occurrences, deterministic event_id tie-break),
    with support as % of all users — the pattern table that seeds
    funnel design.

    Events reduce to (user, type, first_ts) — ≤|types| rows per user —
    in ONE aggregate; the ordered-pair expansion is a per-user
    map-side list comparison (collect the ≤|types| firsts, compare in
    an array expression), then a |types|²-key combined count. No
    events-grain self-join anywhere; the oracle deliberately uses the
    quadratic within-user join form.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.min("event_id").alias("tie_id")
    )
    per_user = firsts.groupBy("user_id").agg(
        F.collect_list(F.struct("first_ts", "tie_id", "event_type")).alias("fs")
    )
    fs = F.col("fs")
    pair_arr = F.flatten(
        F.transform(
            fs,
            lambda a: F.transform(
                F.filter(
                    fs,
                    lambda b: (a["event_type"] != b["event_type"])
                    & (
                        (a["first_ts"] < b["first_ts"])
                        | (
                            (a["first_ts"] == b["first_ts"])
                            & (a["tie_id"] < b["tie_id"])
                        )
                    ),
                ),
                lambda b: F.struct(
                    a["event_type"].alias("first_event"),
                    b["event_type"].alias("then_event"),
                ),
            ),
        )
    )
    pairs = (
        per_user.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.first_event").alias("first_event"), F.col("p.then_event").alias("then_event"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    tot = ev.agg(F.count_distinct("user_id").alias("t"))
    return (
        pairs.transform(scalars(tot))
        .select(
            "first_event",
            "then_event",
            F.col("n_users").cast("bigint").alias("n_users"),
            round_eps(F.col("n_users") * 100.0 / F.col("t"), 6).alias(
                "support_pct"
            ),
        )
        .orderBy(F.desc("n_users"), "first_event", "then_event")
        .limit(SEQ_TOP)
    )
