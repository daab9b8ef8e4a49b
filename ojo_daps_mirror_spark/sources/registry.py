"""Table registry: named parquet sources for a scale-factor directory.

The reference reads from MySQL via chunked SQLAlchemy cursors
(ojd_daps/dqa/data_getters.py:get_db_job_ads) and from S3 object listings
(get_s3_job_ads). On Spark the equivalent is a straight
``spark.read.parquet`` — partition discovery, predicate pushdown and
column pruning replace all of the reference's hand-rolled chunking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table from a scale-factor directory.

    ``events.ts`` appears in two encodings depending on the writer:
    parquet TIMESTAMP(NANOS) read as a raw int64
    (``spark.sql.legacy.parquet.nanosAsLong=true``, set in session.py),
    or parquet ``timestamp[us]`` without a timezone, which Spark reads as
    TIMESTAMP_NTZ. Both are normalised to a plain (local-zone) TIMESTAMP
    at the scan so every downstream plan — ``unix_micros``,
    ``withWatermark``, window functions — sees one canonical type,
    matching DuckDB's behaviour on the same files.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_ts(df)
    return df


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalise a ``ts`` column to plain TIMESTAMP regardless of encoding."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, *names: str
) -> dict[str, DataFrame]:
    """Load several tables at once; all tables when no names given."""
    names = names or TABLES
    return {name: load_table(spark, sf_dir, name) for name in names}
