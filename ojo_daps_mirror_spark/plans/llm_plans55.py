"""Fifty-fifth sweep (SURVEY.md §2 B107-B108, C119).

Sequential probability ratio test (Wald SPRT — the early-stopping
experimentation member next to B60's fixed-horizon z-test), a
partition backfill planner (gap-and-island runs over a completeness
threshold), and a multi-zoom quadkey spatial rollup on C88's
deterministic coordinates (B42's Morton interleave as an ANALYTICS
grain, not just a storage layout).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.snapshot import monday_of
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B107

SPRT_P0 = 0.18  # H0 purchase rate
SPRT_P1 = 0.22  # H1 purchase rate
SPRT_ALPHA = 0.05  # both error rates → boundaries ±ln((1-a)/a)
_SPRT_A = math.log(SPRT_P1 / SPRT_P0)  # per-success LLR increment
_SPRT_B = math.log((1 - SPRT_P1) / (1 - SPRT_P0))  # per-failure increment
_SPRT_BOUND = math.log((1 - SPRT_ALPHA) / SPRT_ALPHA)

_B107_ORACLE = f"""
WITH obs AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
         ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
  FROM events
),
walk AS (
  SELECT rn,
         ROUND(SUM(x) OVER w * {_SPRT_A!r}
               + SUM(1 - x) OVER w * {_SPRT_B!r}, 9) AS llr
  FROM obs
  WINDOW w AS (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
crossing AS (
  SELECT MIN(CASE WHEN abs(llr) >= {_SPRT_BOUND!r} THEN rn END) AS n_dec,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM walk
)
SELECT c.n_total,
       CAST(c.n_dec AS BIGINT) AS n_at_decision,
       {sql_round('w.llr', 6)} AS llr_at_decision,
       CASE WHEN c.n_dec IS NULL THEN 'continue'
            WHEN w.llr > 0 THEN 'accept_h1' ELSE 'accept_h0' END AS decision
FROM crossing c LEFT JOIN walk w ON w.rn = c.n_dec
"""


@register("sprt_sequential_test", oracle=_B107_ORACLE)
def sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test on the event stream:
    H0 purchase-rate {SPRT_P0} vs H1 {SPRT_P1}, cumulative
    log-likelihood walk, decide at the first |LLR| ≥ ln((1−α)/α)
    crossing — the early-stopping experimentation design next to
    B60's fixed-horizon z-test (SPRT reaches a decision in O(1/KL)
    observations instead of a preset n).

    The walk is INHERENTLY sequential (one global ordered window —
    flagged, not hidden): production runs it as a stream (C72's
    shape) and stops ingesting at the crossing, so the window never
    spans more than the decision prefix. LLR increments are two
    constants times exact cumulative counts, quantised to 9 dp —
    identical walks in both engines.
    """
    w_ord = Window.orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    obs = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("x"),
        F.row_number()
        .over(Window.orderBy("ts", "event_id"))
        .alias("rn"),
    )
    walk = obs.select(
        "rn",
        F.round(
            F.sum("x").over(w_ord) * _SPRT_A
            + F.sum(1 - F.col("x")).over(w_ord) * _SPRT_B,
            9,
        ).alias("llr"),
    )
    crossing = walk.agg(
        F.min(
            F.when(F.abs("llr") >= _SPRT_BOUND, F.col("rn"))
        ).alias("n_dec"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return (
        crossing.join(
            F.broadcast(walk), F.col("rn") == F.col("n_dec"), "left"
        )
        .select(
            "n_total",
            F.col("n_dec").cast("bigint").alias("n_at_decision"),
            round_eps(F.col("llr"), 6).alias("llr_at_decision"),
            F.when(F.col("n_dec").isNull(), "continue")
            .when(F.col("llr") > 0, "accept_h1")
            .otherwise("accept_h0")
            .alias("decision"),
        )
    )


# ---------------------------------------------------------------- B108

_B108_ORACLE = f"""
WITH weekly AS (
  SELECT date_trunc('week', ts)::DATE AS week,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
thr AS (SELECT quantile_cont(n, 0.25) AS p25 FROM weekly),
flagged AS (
  SELECT week, n,
         CAST(datediff('day', DATE '1970-01-05', week) / 7 AS BIGINT) AS wx
  FROM weekly CROSS JOIN thr WHERE n < p25
),
runs AS (
  SELECT week, n, wx,
         wx - ROW_NUMBER() OVER (ORDER BY wx) AS grp
  FROM flagged
)
SELECT strftime(MIN(week), '%Y-%m-%d') AS start_week,
       strftime(MAX(week), '%Y-%m-%d') AS end_week,
       CAST(COUNT(*) AS BIGINT) AS n_weeks,
       CAST(MIN(n) AS BIGINT) AS min_events
FROM runs GROUP BY grp ORDER BY start_week
"""


@register("backfill_plan", oracle=_B108_ORACLE)
def backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition backfill planner: weeks whose event volume falls
    below the 25th percentile are incomplete; contiguous incomplete
    weeks compact into [start, end] backfill RANGES via the
    gap-and-island trick (week index minus rank is constant within a
    run) — the operational output a scheduler consumes as one job per
    range instead of one per partition (the batch complement of B39's
    anomaly flags).

    Scale shape: corpus → |weeks| rows in one aggregate; threshold,
    island grouping and range aggregation all run on the
    dimension-scale frame.
    """
    weekly = (
        load_table(spark, sf_dir, "events")
        .groupBy(monday_of(F.col("ts")).alias("week"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    thr = weekly.agg(F.expr("percentile(n, 0.25)").alias("p25"))
    flagged = (
        weekly.transform(scalars(thr))
        .where(F.col("n") < F.col("p25"))
        .select(
            "week",
            "n",
            (F.datediff("week", F.lit("1970-01-05")) / 7)
            .cast("bigint")
            .alias("wx"),
        )
    )
    grp = F.col("wx") - F.row_number().over(Window.orderBy("wx"))
    runs = flagged.withColumn("grp", grp)
    return (
        runs.groupBy("grp")
        .agg(
            F.date_format(F.min("week"), "yyyy-MM-dd").alias("start_week"),
            F.date_format(F.max("week"), "yyyy-MM-dd").alias("end_week"),
            F.count(F.lit(1)).alias("n_weeks"),
            F.min("n").cast("bigint").alias("min_events"),
        )
        .drop("grp")
        .orderBy("start_week")
    )


# ---------------------------------------------------------------- C119

QK_BITS = 8  # 256×256 base grid
QK_ZOOMS = (4, 6, 8)


def _morton_sql(xi: str, yi: str) -> str:
    terms = []
    for b in range(QK_BITS):
        terms.append(f"((({xi} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({yi} >> {b}) & 1) << {2 * b})")
    return " + ".join(terms)


_C119_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS id, c_acctbal,
         50.0 + (('0x' || substr(md5('g' || c_custkey), 1, 8))::BIGINT
                 % 5000) / 1000.0 AS lat,
         -5.0 + (('0x' || substr(md5('h' || c_custkey), 1, 8))::BIGINT
                 % 10000) / 1000.0 AS lon
  FROM customer
),
cells AS (
  SELECT id, c_acctbal,
         LEAST(CAST(FLOOR((lon + 5.0) / 10.0 * {1 << QK_BITS}) AS BIGINT),
               {(1 << QK_BITS) - 1}) AS xi,
         LEAST(CAST(FLOOR((lat - 50.0) / 5.0 * {1 << QK_BITS}) AS BIGINT),
               {(1 << QK_BITS) - 1}) AS yi
  FROM pts
),
keyed AS (
  SELECT id, c_acctbal, {_morton_sql('xi', 'yi')} AS qk FROM cells
),
zoomed AS (
  SELECT z.zoom, qk >> (2 * ({QK_BITS} - z.zoom)) AS cell,
         c_acctbal
  FROM keyed CROSS JOIN (
    SELECT unnest([{", ".join(map(str, QK_ZOOMS))}]) AS zoom) z
)
SELECT CAST(zoom AS BIGINT) AS zoom, CAST(cell AS BIGINT) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       {sql_round(
           'SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 / COUNT(*)',
           4)} AS mean_acctbal
FROM zoomed GROUP BY 1, 2 ORDER BY zoom, cell
"""


@register("quadkey_rollup", oracle=_C119_ORACLE)
def quadkey_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-zoom quadkey (Morton/Bing-tile) spatial rollup over
    C88's deterministic coordinates: interleave the 8-bit cell
    coordinates into a quadkey, truncate 2 bits per zoom level, and
    aggregate point count + mean balance per (zoom, tile) — the map
    heat-tile pyramid, i.e. B42's Z-order key used as an ANALYTICS
    grain (prefix truncation = parent tile is the property Z-order
    layouts exploit for pruning).

    Scale shape: key derivation is pure integer bit math (codegen);
    the ×|zooms| explode is map-side; ONE (zoom, cell) aggregate,
    map-side combined, balances in exact integer cents.
    """
    cust = load_table(spark, sf_dir, "customer")
    lat = 50.0 + (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("g"), F.col("c_custkey"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 5000
    ) / 1000.0
    lon = -5.0 + (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("h"), F.col("c_custkey"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 10000
    ) / 1000.0
    n_cells = 1 << QK_BITS
    xi = F.least(
        F.floor((lon + 5.0) / 10.0 * n_cells).cast("bigint"),
        F.lit(n_cells - 1),
    )
    yi = F.least(
        F.floor((lat - 50.0) / 5.0 * n_cells).cast("bigint"),
        F.lit(n_cells - 1),
    )
    qk = None
    for b in range(QK_BITS):
        term = (
            F.shiftleft(F.shiftright(xi, b).bitwiseAND(F.lit(1)), 2 * b + 1)
            + F.shiftleft(F.shiftright(yi, b).bitwiseAND(F.lit(1)), 2 * b)
        )
        qk = term if qk is None else qk + term
    keyed = cust.select(
        qk.alias("qk"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    zoomed = keyed.select(
        F.explode(F.array(*[F.lit(z) for z in QK_ZOOMS])).alias("zoom"),
        "qk",
        "cents",
    ).select(
        F.col("zoom").cast("bigint").alias("zoom"),
        # shiftright with a COLUMN shift only exists in SQL form
        F.expr(f"CAST(shiftright(qk, CAST(2 * ({QK_BITS} - zoom) AS INT)) AS BIGINT)").alias(
            "cell"
        ),
        "cents",
    )
    return (
        zoomed.groupBy("zoom", "cell")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            round_eps(
                F.sum("cents") / 100.0 / F.count(F.lit(1)), 4
            ).alias("mean_acctbal"),
        )
        .orderBy("zoom", "cell")
    )


def quadkey_cells(spark: SparkSession, sf_dir: str, zoom: int) -> DataFrame:
    """(cell, n_points) at one zoom level — C119's key derivation
    shared with the C120 shard planner."""
    df = quadkey_rollup(spark, sf_dir)
    return (
        df.where(F.col("zoom") == zoom)
        .select("cell", F.col("n_points").alias("n"))
    )
