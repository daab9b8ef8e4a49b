"""Structured-Streaming event counts — the reference's "continuous
collection" loop (daily Metaflow batch re-runs) as an actual stream.

readStream(parquet) → watermark → tumbling-window counts →
memory/availableNow for tests; in production the same plan writes to a
sink with checkpointing and handles late data via the watermark instead
of the reference's full re-scan per run.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WATERMARK = "1 day"
WINDOW = "1 day"


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events table, ts normalised to timestamp.

    The file-stream source wants a directory to monitor; expose the
    single parquet file through a temp-dir symlink (in production the
    source is a real landing directory / Kafka topic).
    """
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    stream_dir = os.path.join(
        tempfile.gettempdir(), f"ojo_stream_{hashlib.md5(src.encode()).hexdigest()[:8]}"
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    batch_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(batch_schema).parquet(stream_dir)
    # events.ts arrives as int64 nanos or TIMESTAMP_NTZ depending on the
    # writer; normalise to plain TIMESTAMP (see sources/registry.py)
    from ..sources.registry import normalize_ts

    return normalize_ts(stream)


def run_to_completion(df: DataFrame, spark: SparkSession, mode: str = "complete"):
    """Start ``df`` as an availableNow memory-sink stream, await it, and
    return the sink table (caller orders it)."""
    sink = f"stream_sink_{uuid.uuid4().hex[:8]}"
    query = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(sink)


def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the windowed-count stream to completion (availableNow) and
    return the batch result: (window_start, event_type, n_events)."""
    stream = events_stream(spark, sf_dir)
    counts = (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    return run_to_completion(counts, spark).orderBy("window_start", "event_type")


def stream_to_partitioned_parquet(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Stream events into a date-partitioned parquet lake with exactly-
    once file-sink semantics (checkpointed offsets + transactional file
    commits) — the reference's daily batch-append
    (flows/collect → S3 landing) as a continuous ingest.

    The sink partitions by event_date so downstream batch queries get
    partition pruning over ingest output; availableNow drains the
    backlog and stops, which is also the production catch-up pattern.
    Returns the re-read batch DataFrame for verification.
    """
    stream = events_stream(spark, sf_dir)
    enriched = stream.withColumn("event_date", F.to_date("ts"))
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("event_date")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
