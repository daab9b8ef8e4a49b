"""Distributed as-of join (no native Spark operator).

For each probe row, find the build-side row with the greatest time ≤ the
probe time for the same key. Implemented as the union-and-window trick:
tag both sides, sort by (key, time, side) within one shuffle, and carry
the last-seen build values forward with ``last(..., ignorenulls=True)``.

This is a single hash-partition shuffle on the key — no range join, no
per-key loop — so it scales like any window aggregation. (A broadcast
range join would need the build side small; this shape doesn't.)

Build-side rows must be unique per (key, time) — deduplicate first with
a deterministic rule or ties make the result ill-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    build_values: list[str],
    build_key: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: probe rows keep NULL build values when nothing
    qualifies. Probe columns are preserved. ``build_key`` defaults to
    ``key`` when the build side uses the same column name.

    direction="backward" (default): greatest build time ≤ probe time —
    "state as of". direction="forward": smallest build time ≥ probe
    time — "next occurrence after" (the other half of pandas
    merge_asof). Both are the same single key-shuffle + one window; the
    forward form carries the FIRST following build row instead of the
    last preceding one.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    probe_cols = probe.columns
    # at equal times the build row must qualify for both ≤ and ≥:
    # backward → build sorts first; forward → build sorts last
    build_side = 0 if direction == "backward" else 1
    b = build.select(
        F.col(build_key or key).alias("_k"),
        F.col(build_time).cast("timestamp").alias("_t"),
        F.lit(build_side).alias("_side"),
        *[F.col(c) for c in build_values],
        *[F.lit(None).alias(f"_p_{c}") for c in probe_cols],
    )
    p = probe.select(
        F.col(key).alias("_k"),
        F.col(probe_time).cast("timestamp").alias("_t"),
        F.lit(1 - build_side).alias("_side"),
        *[F.lit(None).cast(t).alias(c) for c, t in build.select(*build_values).dtypes],
        *[F.col(c).alias(f"_p_{c}") for c in probe_cols],
    )
    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_side")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    unioned = b.unionByName(p)
    carried = unioned.select(
        "_side",
        *[F.col(f"_p_{c}").alias(c) for c in probe_cols],
        *[carry(c).alias(c) for c in build_values],
    )
    return carried.where(F.col("_side") == (1 - build_side)).drop("_side")
