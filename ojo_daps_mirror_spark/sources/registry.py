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

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader only accepts as a raw int64
    (``spark.sql.legacy.parquet.nanosAsLong=true``, set in session.py);
    we convert to a microsecond timestamp at the scan so every downstream
    plan sees a normal timestamp column, matching DuckDB's ns→µs cast.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, *names: str
) -> dict[str, DataFrame]:
    """Load several tables at once; all tables when no names given."""
    names = names or TABLES
    return {name: load_table(spark, sf_dir, name) for name in names}
