"""Multimodal + streaming queries (SURVEY.md §2 C11–C12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import decode_media
from ..sources import load_table
from ..streaming.stock import streaming_event_counts
from . import register


@register("multimodal_decode")  # rows-only: stubbed codec, no SQL analog
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns through the Arrow-batched decode pipeline
    (operators/multimodal.py). Codec is a deterministic stub; the Spark
    plumbing (schema, mapInPandas batching, partition independence) is
    the deliverable."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(docs).orderBy("doc_id")


_C12_ORACLE = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


@register("streaming_stock", oracle=_C12_ORACLE)
def streaming_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming tumbling-window counts, run to completion
    with availableNow. The batch oracle is the same aggregation in SQL —
    with no late data past the watermark the two must agree exactly."""
    return streaming_event_counts(spark, sf_dir)
