"""Stream-stream interval join with watermark-bounded state.

Conversion tracking: for every click, find the same user's purchases
within the following hour — two unbounded streams joined on key +
time-range. Spark buffers each side in state and the watermarks bound
how long a row can wait for its match, so state is evicted instead of
growing with the stream. This is the streaming twin of the batch as-of
/ banded-range joins (operators/asof.py, repeat_orders_30d).

Scale shape: both sides shuffle by user_id once; state per key holds
only rows younger than watermark + join range. The range predicate is
mandatory — without it state never expires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JOIN_RANGE = "1 hour"
WATERMARK = "2 hours"


def streaming_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the click→purchase interval join to completion (availableNow)
    and return per-user conversion-pair counts."""
    from .stock import events_stream, run_to_completion

    stream = events_stream(spark, sf_dir)
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", WATERMARK)
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", WATERMARK)
    )
    pairs = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {JOIN_RANGE}")),
    )
    out = run_to_completion(pairs, spark, mode="append")
    # The streaming part is the stateful join; the count over the drained
    # sink is plain batch.
    return (
        out.groupBy(F.col("c_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


def streaming_unconverted_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click, matched to
    a same-user purchase in the following hour OR emitted with NULLs
    once the watermark proves no match can still arrive — the
    abandonment/attribution shape. Outer results are withheld until
    the watermark passes, which is why the join cannot run without
    watermarks on BOTH sides; with availableNow draining a bounded
    source, every click resolves.

    Returns per-user (n_clicks, n_unconverted) — clicks with no
    purchase within the hour.
    """
    from .stock import events_stream, run_to_completion

    stream = events_stream(spark, sf_dir)
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", WATERMARK)
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", WATERMARK)
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {JOIN_RANGE}")),
        "left_outer",
    )
    out = run_to_completion(joined, spark, mode="append")
    # Watermark closure boundary: a click's NULL (no-match) row emits
    # only once the watermark proves no purchase can still arrive —
    # clicks in the stream's final WATERMARK + JOIN_RANGE are still
    # open state at drain time and must be excluded from BOTH the
    # streamed result and the batch oracle for a well-defined answer.
    from ..sources import load_table

    # The GLOBAL watermark is the minimum over both input watermarks:
    # min(max click ts, max purchase ts) − WATERMARK. A click's NULL
    # row emits once c_ts + JOIN_RANGE is older than that.
    ev = load_table(spark, sf_dir, "events")
    maxes = ev.where(F.col("event_type").isin("click", "purchase")).groupBy(
        "event_type"
    ).agg(F.max("ts").alias("m")).collect()
    wm_base = min(r["m"] for r in maxes)
    closed = out.where(
        F.col("c_ts")
        < F.lit(wm_base)
        - F.expr(f"INTERVAL {WATERMARK}")
        - F.expr(f"INTERVAL {JOIN_RANGE}")
    )
    # distinct clicks (a click with k matches appears k times; with none,
    # once with NULL purchase_id), then per-user abandonment counts
    per_click = closed.groupBy("c_user", "click_id").agg(
        F.max(F.col("purchase_id").isNotNull().cast("int")).alias("converted")
    )
    return (
        per_click.groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(1 - F.col("converted")).cast("bigint").alias("n_unconverted"),
        )
        .orderBy("user_id")
    )
