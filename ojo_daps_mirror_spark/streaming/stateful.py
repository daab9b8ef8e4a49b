"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for stream semantics the built-in windowed/session
aggregates can't express: arbitrary per-key state carried across
micro-batches, Arrow-batched on the Python side. Here the state is a
per-user lifetime profile (event count, value sum, first/last seen) —
the shape of the reference's incrementally-maintained per-ad feature
rows (dqa/data_getters.py:get_features), but maintained by a stream
instead of nightly re-queries.

Scale shape: state is partitioned by the grouping key across executors
(state-store backed, checkpointed in production); each micro-batch
shuffles only that batch's rows to their key partitions, and Arrow
moves whole column batches — the Python hop is per-group-per-batch,
not per-row.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("first_ts", StringType()),
        StructField("last_ts", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("first_ts", StringType()),
        StructField("last_ts", StringType()),
    ]
)


def _update_profile(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this batch's rows into the user's running profile and emit
    the updated profile once per (group, batch)."""
    n, total, first_ts, last_ts = (
        state.get if state.exists else (0, 0.0, None, None)
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        ts = pdf["ts"].astype("datetime64[us]").dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        lo, hi = ts.min(), ts.max()
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
    state.update((n, total, first_ts, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "first_ts": [first_ts],
            "last_ts": [last_ts],
        }
    )


def streaming_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful profile stream to completion (availableNow) and
    return the final per-user profiles."""
    from .stock import events_stream, run_to_completion

    stream = events_stream(spark, sf_dir).select("user_id", "ts", "value")
    profiles = stream.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_completion(profiles, spark, mode="update")
    # One emission per (user, micro-batch): the LAST one is the final
    # profile (n_events is monotone). availableNow on a single landing
    # file is one batch, but the dedup keeps the result well-defined if
    # the source ever splits batches.
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )
