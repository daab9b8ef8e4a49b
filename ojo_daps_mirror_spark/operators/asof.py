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


def asof_join_nearest(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    build_values: list[str],
    build_key: str | None = None,
) -> DataFrame:
    """Nearest as-of join (the third merge_asof direction): for each
    probe row, the build row minimising |build time − probe time|, ties
    going BACKWARD (the at-or-before row).

    Same single key-shuffle as the directional forms — build rows sort
    before probes at equal times, and BOTH carries evaluate over the
    one sorted partition (two frames, one sort): last-preceding for the
    backward candidate, first-following for the forward one. An
    equal-time build row is only seen by the backward carry, which is
    exactly the tie rule. Output columns: probe columns, then
    ``<v>_back`` / ``<v>_fwd`` for each build value plus ``_t_back`` /
    ``_t_fwd`` build times — callers pick with the distance rule (kept
    raw so they can also expose which side won).
    """
    probe_cols = probe.columns
    b = build.select(
        F.col(build_key or key).alias("_k"),
        F.col(build_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in build_values],
        *[F.lit(None).alias(f"_p_{c}") for c in probe_cols],
    )
    p = probe.select(
        F.col(key).alias("_k"),
        F.col(probe_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(t).alias(c) for c, t in build.select(*build_values).dtypes],
        *[F.col(c).alias(f"_p_{c}") for c in probe_cols],
    )
    w_back = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    bt = F.when(F.col("_side") == 0, F.col("_t"))
    carried = b.unionByName(p).select(
        "_side",
        *[F.col(f"_p_{c}").alias(c) for c in probe_cols],
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w_back)
            .alias(f"{c}_back")
            for c in build_values
        ],
        F.last(bt, ignorenulls=True).over(w_back).alias("_t_back"),
        *[
            F.first(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w_fwd)
            .alias(f"{c}_fwd")
            for c in build_values
        ],
        F.first(bt, ignorenulls=True).over(w_fwd).alias("_t_fwd"),
    )
    return carried.where(F.col("_side") == 1).drop("_side")
