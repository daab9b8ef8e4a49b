"""Stateful streaming rate-anomaly detection via applyInPandasWithState.

The streaming twin of the batch B39 rolling z-score flags: per
event-type, 6-hour tumbling-window event counts are scored against the
EXPANDING history of earlier windows (mean / sample std of all prior
windows, ≥3 required), carried across micro-batches as per-key state.
The reference's monitoring cron (dqa/s3_counts.py re-queried history
nightly) becomes a push-based stream with O(|windows|) state per key.

Scale shape: state partitions by event_type across executors
(state-store backed in production); each micro-batch shuffles only its
own rows to key partitions; scoring is numpy over the key's window
vector — dimension-scale, never per-event.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WINDOW_SECONDS = 6 * 3600
MIN_HISTORY = 3
Z_THRESHOLD = 2.0

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("window_start", StringType()),
        StructField("n_events", LongType()),
        StructField("z", DoubleType()),
        StructField("is_anomaly", BooleanType()),
        StructField("emit_seq", LongType()),
    ]
)

# state: parallel arrays of window epoch-seconds and counts + batch seq
STATE_SCHEMA = "starts array<long>, counts array<long>, seq bigint"


def _score(starts: np.ndarray, counts: np.ndarray):
    """Expanding-history z-scores in window order. Mean/std definitions
    match SQL AVG / STDDEV_SAMP over 'all preceding rows'."""
    order = np.argsort(starts)
    s, c = starts[order], counts[order].astype(np.float64)
    z = np.zeros(len(c))
    for i in range(len(c)):
        if i >= MIN_HISTORY:
            prev = c[:i]
            sd = prev.std(ddof=1)
            if sd > 0:
                z[i] = (c[i] - prev.mean()) / sd
    return s, c.astype(np.int64), z


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    prev_starts, prev_counts, seq = (
        state.get if state.exists else ([], [], 0)
    )
    acc = dict(zip(prev_starts, prev_counts))
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        epoch = pdf["ts"].astype("datetime64[us]").astype("int64") // 1_000_000
        wstart = (epoch // WINDOW_SECONDS) * WINDOW_SECONDS
        for w, n in wstart.value_counts().items():
            acc[int(w)] = acc.get(int(w), 0) + int(n)
    seq += 1
    starts = np.array(list(acc.keys()), dtype=np.int64)
    counts = np.array([acc[int(k)] for k in starts], dtype=np.int64)
    state.update((starts.tolist(), counts.tolist(), seq))
    s, c, z = _score(starts, counts)
    yield pd.DataFrame(
        {
            "event_type": key[0],
            "window_start": pd.to_datetime(s, unit="s").strftime(
                "%Y-%m-%d %H:%M:%S"
            ),
            "n_events": c,
            "z": np.round(z + 1e-9, 4),
            "is_anomaly": np.abs(z) > Z_THRESHOLD,
            "emit_seq": seq,
        }
    )


def streaming_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful anomaly stream to completion (availableNow) and
    return the final per-window scores (latest emission per key wins —
    scores refine as history accumulates across batches)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .stock import events_stream, run_to_completion

    stream = events_stream(spark, sf_dir).select("event_type", "ts")
    scored = stream.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_completion(scored, spark, mode="update")
    w = Window.partitionBy("event_type", "window_start").orderBy(
        F.col("emit_seq").desc()
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", "window_start", "n_events", "z", "is_anomaly")
        .orderBy("event_type", "window_start")
    )
