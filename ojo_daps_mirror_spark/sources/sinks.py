"""Sinks: partitioned / bucketed parquet and CSV/JSON round-trips.

The reference persists results as chunked JSON objects on S3 keyed by id
range (flows/enrich/locations.py:end writes ``locations_{first}-{last}``
chunks; flows/common save_to_s3) and loads dimension CSVs
(pre_enrich/location_lookup.py:read_csv). The Spark-native equivalents:

- ``write_partitioned`` — parquet partitioned by a column (the lake
  layout: partition pruning replaces the reference's filename-range
  convention; each partition directory is the "chunk").
- ``write_bucketed`` — saveAsTable with hash buckets on the join key, so
  repeated big-big joins on that key skip the shuffle entirely.
- ``write_csv`` / ``read_csv``, ``write_json`` / ``read_json`` — header
  CSV and line-delimited JSON with explicit schema on read (schema
  inference is a full extra scan at 100 TB — never rely on it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Parquet partitioned by ``partition_by``; readers filtering on the
    partition column scan only matching directories."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) so
    joins/aggregations on those keys need no exchange."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_text(df: DataFrame, path: str, column: str = "text") -> None:
    """One line per document, the rawest corpus interchange format
    (compressed .txt shards are how public text corpora actually
    ship). The single-column constraint is the format's, not ours."""
    df.select(column).write.mode("overwrite").text(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Line-per-row text source; with ``whole_file`` each FILE becomes
    one row (wholetext) — the one-doc-per-file corpus layout. Line mode
    splits on newlines and parallelises within files; wholetext cannot
    split, so parallelism = file count (same contract as binaryFile)."""
    return spark.read.option("wholetext", whole_file).text(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw media ingestion via Spark's built-in ``binaryFile`` source:
    one row per file with (path, modificationTime, length, content) —
    the 100 TB way to land image/audio/video blobs into the opaque
    ``binary``-column model that operators/multimodal.py processes
    (the reference's equivalent surface is raw S3 object collection in
    flows/collect).

    Files are read whole into single rows (no splitting), so
    parallelism comes from the file count — at scale, land media as
    many objects, not few giant archives. ``glob`` (e.g. ``*.jpg``)
    filters at listing time via pathGlobFilter, before any read.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
