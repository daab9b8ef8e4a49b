"""Sliding-window streaming aggregation and stream-static enrichment.

Two more Structured-Streaming shapes next to stock.py's tumbling
windows: overlapping sliding windows (each event lands in
window/slide = 4 open windows) and the stream-static broadcast join
(the reference's enrich step — flows/enrich joins each batch against
lookup dims — as a continuous stream against an unchanging dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .stock import events_stream, run_to_completion

SLIDE_WINDOW = "24 hours"
SLIDE_STEP = "6 hours"
SLIDE_WATERMARK = "1 day"


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window event counts: 24-hour windows advancing every
    6 hours, so each event contributes to exactly 4 overlapping
    windows. Watermark bounds the open-window state to
    (watermark + window) / slide windows per key — constant per key
    regardless of stream length.
    """
    stream = events_stream(spark, sf_dir)
    counts = (
        stream.withWatermark("ts", SLIDE_WATERMARK)
        .groupBy(F.window("ts", SLIDE_WINDOW, SLIDE_STEP).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )
    return run_to_completion(counts, spark).orderBy("window_start", "event_type")


def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the purchase stream enriched with the
    customer dimension (broadcast — the static side is planned per
    micro-batch and never shuffles the stream), aggregated to
    per-market-segment totals.

    This is the streaming form of the reference's enrich flows: each
    arriving batch joins the same lookup dim; complete-mode output
    because the aggregate is keyed on a non-time column.
    """
    stream = events_stream(spark, sf_dir).where(F.col("event_type") == "purchase")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = stream.join(F.broadcast(cust), "user_id")
    totals = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value") + 1e-9, 4).alias("total_value"),
    )
    return run_to_completion(totals, spark).orderBy("c_mktsegment")
