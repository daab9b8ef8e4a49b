"""Fifteenth sweep (SURVEY.md §2 C72).

Stateful streaming rate-anomaly detection — the push-based twin of the
batch B39 rolling z-score monitor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register

_C72_ORACLE = """
WITH windowed AS (
  SELECT event_type,
         to_timestamp((epoch_us(ts) // 1000000 // 21600) * 21600) AS wstart,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, wstart, n_events,
         AVG(n_events) OVER prev AS m,
         STDDEV_SAMP(n_events) OVER prev AS sd,
         COUNT(*) OVER prev AS k
  FROM windowed
  WINDOW prev AS (PARTITION BY event_type ORDER BY wstart
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_type,
       strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       n_events,
       ROUND(CASE WHEN k >= 3 AND sd > 0 THEN (n_events - m) / sd
                  ELSE 0.0 END + 1e-9, 4) AS z,
       (k >= 3 AND COALESCE(sd, 0) > 0
        AND ABS((n_events - m) / sd) > 2.0) AS is_anomaly
FROM scored ORDER BY event_type, window_start
"""


@register("streaming_rate_anomaly", oracle=_C72_ORACLE)
def streaming_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming anomaly detection (streaming/anomaly.py):
    per event-type, 6-hour tumbling-window counts scored against the
    EXPANDING history of earlier windows (mean / sample std of all
    priors, ≥3 required, |z| > 2 flags), state carried across
    micro-batches with applyInPandasWithState.

    The batch oracle computes the identical expanding z-score with
    window functions; with availableNow draining the whole source the
    final emitted state must agree exactly — the same
    stream-equals-batch contract as C21. Replaces the reference's
    nightly re-queried monitoring counts (dqa/s3_counts.py) with a
    push-based monitor whose state is O(|windows|) per key.
    """
    from ..streaming.anomaly import streaming_rate_anomalies

    return streaming_rate_anomalies(spark, sf_dir)
