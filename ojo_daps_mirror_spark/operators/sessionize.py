"""Gap-based sessionization.

Classic stream-to-sessions operator: a new session starts when the gap
to the previous event of the same key exceeds the timeout. Expressed as
two window functions over one (key, time) shuffle — lag to mark breaks,
running sum to number sessions — all inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_SECONDS = 1800  # 30 min


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> DataFrame:
    """Assign ``session_idx`` (1-based per key) to every event."""
    order = [F.col(ts_col), F.col(id_col)]  # id breaks timestamp ties
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = gap_seconds * 1_000_000
    with_breaks = events.withColumn(
        "is_new_session",
        F.when(
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
            > gap_us,
            1,
        )
        .otherwise(0)
        + F.when(F.lag(ts_col).over(w).isNull(), 1).otherwise(0),
    )
    w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return with_breaks.withColumn(
        "session_idx", F.sum("is_new_session").over(w_sum)
    ).drop("is_new_session")
