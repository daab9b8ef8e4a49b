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
) -> DataFrame:
    """Left as-of join: probe rows keep NULL build values when nothing
    precedes them. Probe columns are preserved. ``build_key`` defaults
    to ``key`` when the build side uses the same column name."""
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
    # build sorts before probe at equal time → "≤" semantics
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = b.unionByName(p)
    carried = unioned.select(
        "_side",
        *[F.col(f"_p_{c}").alias(c) for c in probe_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in build_values],
    )
    return carried.where(F.col("_side") == 1).drop("_side")
