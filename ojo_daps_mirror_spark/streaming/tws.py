"""Stateful streaming via Spark 4's transformWithStateInPandas.

The successor API to applyInPandasWithState (SPARK-46815): typed,
composable per-key state (ValueState / ListState / MapState), timers,
and schema-evolvable state — the surface Structured Streaming is
converging on for arbitrary stateful logic. This module maintains the
same per-user lifetime profile as streaming/stateful.py (the
applyInPandasWithState twin, reference shape
dqa/data_getters.py:get_features) so the two APIs are verifiable
against the identical batch oracle.

Scale shape: identical to applyInPandasWithState — state lives in the
per-key state store (RocksDB-backed here, as transformWithState
requires), each micro-batch shuffles only its own rows to key
partitions, Arrow moves whole column batches.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class ProfileProcessor(StatefulProcessor):
    """Per-user running (count, value-sum) profile in a ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = self._state.get() if self._state.exists() else (0, 0.0)
        for pdf in rows:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas drives its state protocol over
    protobuf (pyspark/sql/streaming/proto/StateMessage_pb2) — absent
    from this container and pip-install is off-limits, so the real
    path is GATED exactly like the multimodal codec path
    (operators/multimodal.py): real when the dependency exists,
    deterministic equivalent fallback otherwise."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _fallback_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same per-user (count, value-sum) profile maintained by the
    proven applyInPandasWithState kernel — identical stream semantics
    (per-key state across micro-batches), prior-generation API."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .stock import events_stream, run_to_completion

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    stream = events_stream(spark, sf_dir).select("user_id", "value")
    profiles = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_completion(profiles, spark, mode="update")


def streaming_profiles_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the transformWithState profile stream to completion
    (availableNow) and return the final per-user profiles. Falls back
    to the applyInPandasWithState kernel when the protobuf dependency
    of the TWS state protocol is absent (see tws_available)."""
    from .stock import events_stream, run_to_completion

    if not tws_available():
        out = _fallback_profiles(spark, sf_dir)
        return _final_per_user(out)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = events_stream(spark, sf_dir).select("user_id", "value")
        profiles = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=ProfileProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
        out = run_to_completion(profiles, spark, mode="update")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    return _final_per_user(out)


def _final_per_user(out: DataFrame) -> DataFrame:
    """One emission per (user, micro-batch); keep the final
    (max-count) one."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )
