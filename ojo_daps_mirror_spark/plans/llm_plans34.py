"""Thirty-fourth sweep (SURVEY.md §2 C94, D17).

Spark 4 API surfaces wired into the engine: arbitrary stateful
streaming via transformWithStateInPandas (the typed successor of
applyInPandasWithState), and a custom connector through the Python
DataSource API — both verified against closed-form DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..sources.pydatasource import SYNTH_SQL, register_synthetic_source
from . import register

# ---------------------------------------------------------------- C94

_C94_ORACLE = """
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value) + 1e-9, 4) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("streaming_profiles_tws", oracle=_C94_ORACLE)
def streaming_profiles_tws_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime profiles via Spark 4's
    transformWithStateInPandas (streaming/tws.py) — same semantics as
    C21's applyInPandasWithState profile but on the successor API
    (typed ValueState in a RocksDB-backed store, the surface that adds
    timers/ListState/MapState for richer operators). The TWS state
    protocol needs protobuf, absent from this container — the op
    detects that (streaming/tws.py:tws_available) and runs the same
    stream on the proven applyInPandasWithState kernel instead, so
    the registered query is green either way and the TWS path engages
    wherever the dependency exists. Batch oracle: a plain GROUP BY;
    availableNow drains the whole source, so the final emitted state
    must agree exactly."""
    from ..streaming.tws import streaming_profiles_tws

    out = streaming_profiles_tws(spark, sf_dir)
    return out.select(
        "user_id",
        "n_events",
        round_eps(F.col("total_value"), 4).alias("total_value"),
    ).orderBy("user_id")


# ---------------------------------------------------------------- D17

_D17_ORACLE = f"""
WITH synth AS ({SYNTH_SQL})
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       {sql_round('SUM(value)', 4)} AS total_value
FROM synth GROUP BY event_type ORDER BY event_type
"""


@register("python_datasource_scan", oracle=_D17_ORACLE)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over a scan of the custom Python DataSource
    (sources/pydatasource.py) — the Spark 4 extension point standing
    in for the reference's REST collectors (flows/extract/reed.py
    pages an API; here page ranges are InputPartitions, so ingest
    parallelises across executors with no driver bottleneck). The
    source is a closed-form function of the row index, so a DuckDB
    generate_series twin hash-matches the whole path: partition
    planning → per-partition reads → Arrow → aggregate."""
    register_synthetic_source(spark)
    synth = spark.read.format("synthetic_events").load()
    return (
        synth.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            round_eps(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )
