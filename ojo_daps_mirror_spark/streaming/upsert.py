"""foreachBatch upsert sink — the streaming MERGE pattern.

Structured Streaming's file sink can only append; real pipelines
maintain a KEYED state table (per-user profiles, SCD1 dims) from a
stream. The standard recipe is foreachBatch + an IDEMPOTENT per-batch
write: each micro-batch's aggregate lands in its own
``batch_id=<n>`` directory (re-processing a batch after a crash
overwrites the same directory — effectively exactly-once), and readers
merge the batch partials with one keyed aggregate. The merge is
associative, so the read-side groupBy is the same mergeable-partial
shape as any map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .stock import events_stream


def stream_upsert_profiles(
    spark: SparkSession, sf_dir: str, state_dir: str, checkpoint_dir: str
) -> None:
    """Drain the event stream (availableNow) maintaining a per-user
    profile state table under ``state_dir`` via idempotent
    per-batch-directory writes."""
    stream = events_stream(spark, sf_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        # overwrite THIS batch's directory only: a replayed batch
        # rewrites identical content instead of double-counting
        agg.write.mode("overwrite").parquet(f"{state_dir}/batch_id={batch_id}")

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_profiles(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge the batch partials into current per-user profiles."""
    parts = spark.read.option("basePath", state_dir).parquet(state_dir)
    return parts.groupBy("user_id").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.max("last_ts").alias("last_ts"),
    )
