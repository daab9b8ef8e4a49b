"""OLAP breadth, fifth sweep (SURVEY.md §2 B40–B42).

Forward as-of join (the other half of merge_asof), point-in-time join
against the SCD2 dimension (the feature-store time-travel lookup), and
Z-order key computation (the multi-dimensional lakehouse sort key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.attach import scalars
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- B40

_B40_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       COALESCE(o.o_orderkey, -1) AS o_orderkey,
       COALESCE(strftime(o.o_orderdate, '%Y-%m-%d'), 'none') AS o_orderdate
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts
ORDER BY e.event_id
"""


@register("as_of_join_forward", oracle=_B40_ORACLE)
def as_of_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the EARLIEST order of the same user at/after the
    event time — the forward direction of the as-of operator
    (operators/asof.py, direction="forward"), verified against
    DuckDB's native forward ASOF JOIN. Together with B7 this completes
    the merge_asof surface: "state as of" looks back, "time to next
    action" looks forward.

    Scale shape: identical to B7 — one key shuffle, one window; the
    forward form carries the first FOLLOWING build row instead of the
    last preceding one. No range join, no per-key loop.
    """
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        probe=events,
        build=orders,
        key="user_id",
        build_key="o_custkey",
        probe_time="ts",
        build_time="o_orderdate",
        build_values=["o_orderkey", "o_orderdate"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        # events after a user's last order have no forward match:
        # sentinel values keep the bigint column NULL-free (NULL bigint
        # → NaN double in pandas would poison the cross-engine compare)
        F.coalesce("o_orderkey", F.lit(-1)).alias("o_orderkey"),
        F.coalesce(
            F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit("none")
        ).alias("o_orderdate"),
    ).orderBy("event_id")


# ---------------------------------------------------------------- B41

_B41_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events WHERE event_type <> 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_type AS state, ts
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
dim AS (
  SELECT user_id, ts, MAX(state) AS state FROM changes GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       COALESCE(d.state, 'none') AS state_at_purchase
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN dim d ON p.user_id = d.user_id AND d.ts <= p.ts
ORDER BY p.event_id
"""


@register("point_in_time_join", oracle=_B41_ORACLE)
def point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) join: each purchase looks up the
    user's SCD2 state VALID AT the purchase timestamp — the
    feature-store lookup that prevents label leakage (training features
    must reflect the state known at event time, never later). The
    dimension is B22's change log (non-purchase events compressed to
    state-change rows); validity intervals are implicit in as-of
    semantics, so no interval join is needed.

    Scale shape: the dimension collapses to change rows first (runs
    compress — far fewer rows than events), then ONE key-shuffle as-of
    window joins purchases against it (operators/asof.py). Purchases
    with no prior state resolve to 'none' instead of NULL.
    """
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    nonp = events.where(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        nonp.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("state"))
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        probe=purchases,
        build=changes,
        key="user_id",
        probe_time="ts",
        build_time="ts",
        build_values=["state"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.coalesce("state", F.lit("none")).alias("state_at_purchase"),
    ).orderBy("event_id")


# ---------------------------------------------------------------- B42

Z_BITS = 8  # bits per dimension interleaved into the 16-bit Z-value


def _z_interleave_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_B42_ORACLE = f"""
WITH pts AS (
  SELECT event_id,
         user_id % 256 AS x,
         CAST(floor(value) AS BIGINT) % 256 AS y
  FROM events
)
SELECT event_id, x, y,
       CAST({_z_interleave_sql("x", "y")} AS BIGINT) AS zvalue
FROM pts
ORDER BY event_id
"""


@register("zorder_key", oracle=_B42_ORACLE)
def zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key: bit-interleave two dimensions into one
    sort key so that sorting by it clusters BOTH dimensions at once —
    the multi-dimensional data-layout trick behind lakehouse OPTIMIZE
    ZORDER BY. Files written in Z-order carry narrow min/max ranges on
    both columns, so scans filtering on EITHER dimension prune row
    groups (single-column sort clusters only its own column). The
    compaction test (tests/test_sources_sinks.py, D11) writes events
    in this order and asserts the per-file spread of both dimensions
    shrinks vs insertion order.

    Scale shape: the key is a pure scalar bit expression (map-side,
    codegen); the layout pass is then an ordinary repartitionByRange +
    sortWithinPartitions write — one range shuffle, the same cost as
    any sorted write.
    """
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    x = (F.col("user_id") % 256).cast("bigint")
    y = (F.floor("value").cast("bigint") % 256).cast("bigint")
    z = None
    for i in range(Z_BITS):
        bx = F.shiftleft(F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)), 2 * i)
        by = F.shiftleft(
            F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = bx + by if z is None else z + bx + by
    return (
        events.select("event_id", x.alias("x"), y.alias("y"))
        .select("event_id", "x", "y", z.cast("bigint").alias("zvalue"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------- B43

ORDER_ACTIVE_DAYS = 7  # an order's "active window" after its order date

_B43_ORACLE = f"""
WITH sessions AS (
  SELECT user_id, session_idx,
         MIN(ts) AS s_start,
         MAX(ts) + INTERVAL 30 MINUTE AS s_end
  FROM (
    SELECT user_id, ts,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
    FROM (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
  ) GROUP BY user_id, session_idx
),
o AS (
  -- orders carry 1995-2001 dates; the testdata event horizon is
  -- 2024-01, so the active window is derived DETERMINISTICALLY from
  -- the order key (both engines compute the identical map)
  SELECT o_orderkey, o_custkey % 150 AS user_key,
         TIMESTAMP '2024-01-01' + (o_orderkey % 28) * INTERVAL 1 DAY
           AS o_start,
         TIMESTAMP '2024-01-01' + (o_orderkey % 28) * INTERVAL 1 DAY
           + INTERVAL {ORDER_ACTIVE_DAYS} DAY AS o_end
  FROM orders WHERE o_orderkey % 20 = 0
)
SELECT s.user_id, o.o_orderkey, CAST(s.session_idx AS BIGINT) AS session_idx,
       ROUND((epoch_us(least(s.s_end, o.o_end))
              - epoch_us(greatest(s.s_start, o.o_start))) / 3600e6 + 1e-9, 4)
         AS overlap_hours
FROM sessions s JOIN o ON s.user_id = o.user_key
WHERE s.s_start < o.o_end AND o.o_start < s.s_end
ORDER BY s.user_id, o.o_orderkey, session_idx
"""


@register("interval_overlap_join", oracle=_B43_ORACLE)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: user sessions (30-min-gap sessionisation,
    closed at last event + gap) matched to the same user's order
    "active windows" ({ORDER_ACTIVE_DAYS} days from order date) where
    the two intervals OVERLAP — the interval-algebra shape the as-of
    family (point lookups) can't express.

    Scale shape: both interval sets explode into the DAYS they cover
    (bounded fan-out: sessions span ≤2 days, orders exactly
    {ORDER_ACTIVE_DAYS}), candidates come from an equi-join on
    (user, day) — the standard interval-binning trick that turns a
    range join into a hash join — then the exact overlap predicate
    filters and a distinct collapses multi-bin matches. No
    BroadcastNestedLoopJoin, no per-key quadratic work beyond true
    overlaps. The oracle uses the direct range-join form.
    """
    from ..functions.rounding import round_eps
    from ..operators.sessionize import sessionize

    events = load_table(spark, sf_dir, "events")
    sess = (
        sessionize(events)
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTE")).alias("s_end"),
        )
    )
    o_start = F.expr("TIMESTAMP '2024-01-01' + (o_orderkey % 28) * INTERVAL 1 DAY")
    # the key remap folds ALL custkeys onto 150 users, which would make
    # every user×day bin quadratic-dense as SF grows; the deterministic
    # 5% order subset keeps the overlap result proportional to SF
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 20 == 0
    ).select(
        "o_orderkey",
        (F.col("o_custkey") % 150).alias("user_id"),
        o_start.alias("o_start"),
        (o_start + F.expr(f"INTERVAL {ORDER_ACTIVE_DAYS} DAY")).alias("o_end"),
    )
    s_days = sess.select(
        "user_id",
        "session_idx",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.to_date("s_start"),
                F.to_date(F.col("s_end") - F.expr("INTERVAL 1 MICROSECOND")),
            )
        ).alias("day"),
    )
    o_days = orders.select(
        "user_id",
        "o_orderkey",
        "o_start",
        "o_end",
        F.explode(
            F.sequence(
                F.to_date("o_start"),
                F.to_date(F.col("o_end") - F.expr("INTERVAL 1 MICROSECOND")),
            )
        ).alias("day"),
    )
    cand = (
        s_days.join(o_days, ["user_id", "day"])
        .where((F.col("s_start") < F.col("o_end")) & (F.col("o_start") < F.col("s_end")))
        .select("user_id", "o_orderkey", "session_idx", "s_start", "s_end", "o_start", "o_end")
        .distinct()
    )
    overlap_hours = (
        F.unix_micros(F.least("s_end", "o_end"))
        - F.unix_micros(F.greatest("s_start", "o_start"))
    ) / 3.6e9
    return cand.select(
        "user_id",
        "o_orderkey",
        F.col("session_idx").cast("bigint").alias("session_idx"),
        round_eps(overlap_hours, 4).alias("overlap_hours"),
    ).orderBy("user_id", "o_orderkey", "session_idx")


# ---------------------------------------------------------------- B44

ROLLING_DAYS = 7

_B44_ORACLE = f"""
WITH activity AS (
  SELECT DISTINCT user_id, ts::DATE AS day FROM events
),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM activity),
contrib AS (
  SELECT DISTINCT user_id, (day + k * INTERVAL 1 DAY)::DATE AS target
  FROM activity, unnest(generate_series(0, {ROLLING_DAYS - 1})) AS u(k)
)
SELECT strftime(target, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS rolling_users
FROM contrib
WHERE target BETWEEN (SELECT lo FROM bounds) AND (SELECT hi FROM bounds)
GROUP BY target
ORDER BY day
"""


@register("rolling_distinct_users", oracle=_B44_ORACLE)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {ROLLING_DAYS}-day distinct active users per day (the
    WAU/MAU series). COUNT DISTINCT is NOT mergeable across window
    frames — a naive RANGE-window count-distinct re-scans every frame.
    Instead each distinct (user, day) activity pair contributes
    map-side to the {ROLLING_DAYS} windows that contain it; one
    distinct on (user, target_day) then a map-side-combined count
    gives every day's exact rolling cardinality in two narrow
    shuffles over (user, day)-grain rows — never the raw event stream.
    At 100 TB swap the exact distinct for approx_count_distinct per
    target day (mergeable HLL) — same shape, sketch-sized state.
    Executable via SPARK_GRAFT_SCALE_MODE=approx (scale_mode.py): the
    second distinct drops and each target day counts its users with
    one HLL sketch.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    activity = events.distinct()
    bounds = activity.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    contrib = activity.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), ROLLING_DAYS - 1))
        ).alias("target"),
    )
    if sm.is_approx():
        # HLL per target day replaces the (user, target) distinct +
        # count — the sketch absorbs duplicate contributions
        counted = (
            contrib.transform(scalars(bounds))
            .where(F.col("target").between(F.col("lo"), F.col("hi")))
            .groupBy("target")
            .agg(sm.count_distinct("user_id").alias("rolling_users"))
        )
    else:
        counted = (
            contrib.distinct()
            .transform(scalars(bounds))
            .where(F.col("target").between(F.col("lo"), F.col("hi")))
            .groupBy("target")
            .agg(F.count(F.lit(1)).alias("rolling_users"))
        )
    return (
        counted
        .select(
            F.date_format("target", "yyyy-MM-dd").alias("day"), "rolling_users"
        )
        .orderBy("day")
    )
