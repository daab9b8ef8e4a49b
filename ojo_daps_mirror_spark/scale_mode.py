"""Session-level exact→approx switch for the documented 100 TB swaps.

Roughly thirty call sites across the plans document the same scale
posture: "exact percentile / COUNT DISTINCT / NTILE here for oracle
parity; at 100 TB swap to the mergeable sketch". This module makes
that swap EXECUTABLE instead of argued: set

    SPARK_GRAFT_SCALE_MODE=approx

and every documented site flips to its sketch form —

- exact ``percentile`` (sort-based aggregation buffer per group)
  → ``percentile_approx`` (KLL-style mergeable sketch, bounded
  memory, map-side combinable),
- exact ``COUNT(DISTINCT x)`` (full shuffle of every key)
  → ``approx_count_distinct`` (HLL++, fixed-size sketch),
- global-order ``NTILE``/``percent_rank`` windows (single total sort)
  → approx cut points broadcast onto a map-side bucket expression
  (no global sort; rank error ≤ 1/cuts + sketch epsilon).

Default is ``exact``: the DuckDB oracles compare value-for-value, so
the driver's correctness gate always runs the exact forms. The approx
forms are tolerance-tested against the exact ones at sf0.1 in
tests/test_scale_mode.py (one test per swapped family, per-key
tolerances documented there). SURVEY.md §6 lists every covered site.

The mode is read at PLAN-BUILD time (each query builder consults it
when constructing the DataFrame), not at session start — so one
session can build exact and approx plans side by side, which is
exactly what the tolerance tests do.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# percentile_approx accuracy: error ≤ 1/accuracy of the rank.
# 10_000 ⇒ rank error ≤ 0.01 % — sketch size stays a few hundred KB
# per group, far below executor memory at any group count.
APPROX_PERCENTILE_ACCURACY = 10_000

# HLL++ relative standard deviation for approx_count_distinct.
APPROX_DISTINCT_RSD = 0.01

# Cut-point count for the CDF/percent-rank swap (quality_percentile
# blend): rank error ≤ 1/cuts.
CDF_CUTS = 1000

_MODES = ("exact", "approx")


def scale_mode() -> str:
    mode = os.environ.get("SPARK_GRAFT_SCALE_MODE", "exact").lower()
    if mode not in _MODES:
        raise ValueError(
            f"SPARK_GRAFT_SCALE_MODE must be one of {_MODES}, got {mode!r}"
        )
    return mode


def is_approx() -> bool:
    return scale_mode() == "approx"


def percentile(
    col: Column | str,
    percentage: float | list[float] | Column,
    accuracy: int = APPROX_PERCENTILE_ACCURACY,
) -> Column:
    """Exact ``percentile`` by default (matches DuckDB quantile_cont
    for oracle parity); ``percentile_approx`` under approx mode.

    Note the semantic shift the tolerance tests account for: exact
    percentile interpolates between order statistics (continuous),
    percentile_approx returns an actual element of the column
    (discrete, within the sketch's rank error)."""
    if isinstance(percentage, (int, float)):
        percentage = F.lit(float(percentage))
    elif isinstance(percentage, list):
        percentage = F.lit(percentage)
    if is_approx():
        return F.percentile_approx(col, percentage, F.lit(accuracy))
    return F.percentile(col, percentage)


def count_distinct(col: Column | str, rsd: float = APPROX_DISTINCT_RSD) -> Column:
    """Exact ``count_distinct`` by default; HLL++
    ``approx_count_distinct`` (relative std dev ``rsd``) under approx
    mode. Both return BIGINT."""
    if is_approx():
        return F.approx_count_distinct(col, rsd=rsd)
    return F.count_distinct(col)


def bucket_by_cuts(
    df: DataFrame,
    value_col: str,
    n: int,
    out: str,
    descending: bool = False,
    accuracy: int = APPROX_PERCENTILE_ACCURACY,
) -> DataFrame:
    """The NTILE swap: attach a 1..n bucket from ``percentile_approx``
    cut points instead of a global-sort window.

    One 1-row sketch aggregate produces the n-1 cut array; it
    broadcasts onto the scan and bucket assignment is a map-side array
    count — no total order anywhere. Differences vs exact NTILE the
    tolerance tests allow for: bucket sizes are approximately (not
    exactly) equal, and value ties always share a bucket (exact NTILE
    splits them by the tie-break order)."""
    qs = [i / n for i in range(1, n)]
    cuts = df.agg(
        F.percentile_approx(value_col, F.lit(qs), F.lit(accuracy)).alias(
            "__cuts__"
        )
    )
    joined = df.crossJoin(F.broadcast(cuts))
    if descending:
        bucket = F.size(
            F.filter("__cuts__", lambda c: c > F.col(value_col))
        ) + F.lit(1)
    else:
        bucket = F.size(
            F.filter("__cuts__", lambda c: c < F.col(value_col))
        ) + F.lit(1)
    return joined.withColumn(out, bucket.cast("bigint")).drop("__cuts__")


def attach_cdf_ranks(
    df: DataFrame,
    mapping: dict[str, str],
    cuts: int = CDF_CUTS,
    accuracy: int = APPROX_PERCENTILE_ACCURACY,
) -> DataFrame:
    """The percent_rank swap: for each ``value_col -> out_col`` in
    ``mapping``, attach an approximate percent-rank in [0, 1) computed
    as (#cut points strictly below the value) / cuts.

    ALL cut arrays come from ONE 1-row sketch aggregate that
    broadcasts; ranking is map-side. Rank error ≤ 1/cuts plus the
    sketch's rank epsilon; ties share a rank (≈ exact percent_rank's
    min-rank convention)."""
    qs = [i / cuts for i in range(1, cuts)]
    agg = df.agg(
        *[
            F.percentile_approx(c, F.lit(qs), F.lit(accuracy)).alias(
                f"__cdf_{c}__"
            )
            for c in mapping
        ]
    )
    out = df.crossJoin(F.broadcast(agg))
    for c, o in mapping.items():
        out = out.withColumn(
            o,
            F.size(F.filter(f"__cdf_{c}__", lambda v: v < F.col(c)))
            / float(cuts),
        ).drop(f"__cdf_{c}__")
    return out
