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
