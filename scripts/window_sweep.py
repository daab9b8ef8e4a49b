"""Sweep every registered batch plan for UNPARTITIONED Window nodes.

An unpartitioned window (``Window.orderBy(...)`` with no partitionBy)
funnels its whole input through one task. That is fine on dimension
frames (|weeks|, |days|, |cells|, value ladders) and fatal on
data-grain frames — tests/test_plan_guardrails.py enforces an
allowlist; this script regenerates the offender set after plan
changes.

Parsing: in ``explain("formatted")`` a Window detail block reads
``Arguments: [exprs], [partitionSpec], [orderSpec]`` when partitioned.
The partition group is OMITTED when empty, so 2 groups mean
unpartitioned-with-order unless the second group carries no ASC/DESC
tokens (partitioned-unordered), and 1 group means fully global.
"""

from __future__ import annotations

import contextlib
import io
import re

WINDOW_BLOCK = re.compile(
    r"\(\d+\) (Window|WindowGroupLimit)\n(?:[A-Z][^\n]*\n)*?Arguments: ([^\n]*)"
)


def _top_level_groups(s: str) -> list[str]:
    groups, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(s[start : i + 1])
                start = None
    return groups


def unpartitioned_windows(plan: str) -> int:
    """Count Window nodes in a formatted plan with an empty partition
    spec."""
    limited: set[str] = set()
    windows: list[str | None] = []
    for m in WINDOW_BLOCK.finditer(plan):
        kind, args = m.group(1), m.group(2)
        if "__rank_pid__" in args:
            # operators/rank.py's per-partition offsets window: its
            # input is the |shuffle partitions|-row count frame, a
            # bounded dimension by construction.
            continue
        groups = _top_level_groups(args)
        if kind == "WindowGroupLimit":
            # shape: [partitionSpec], [orderSpec], fn, k, mode — the
            # rank<=k pushdown: per-partition top-k map-side, final
            # top-k over <= k*partitions rows. An unpartitioned Window
            # with this order spec is therefore BOUNDED; remember the
            # spec so the companion Window below is not flagged.
            if groups and groups[0] == "[]" and len(groups) >= 2:
                limited.add(groups[1])
            continue
        if len(groups) >= 3:
            continue  # [exprs], [partition], [order]
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC)\b", groups[1]
        ):
            continue  # [exprs], [partition] (unordered partitioned)
        windows.append(groups[1] if len(groups) == 2 else None)
    return sum(1 for o in windows if o is None or o not in limited)


def main() -> None:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from ojo_daps_mirror_spark import plans

    plans.load_all()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sf = "/root/testdata/sf0.001"
    offenders = []
    for key in sorted(plans.QUERIES):
        if key.startswith("streaming"):
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plans.QUERIES[key](spark, sf).explain("formatted")
        c = unpartitioned_windows(buf.getvalue())
        if c:
            offenders.append((key, c))
    for k, c in offenders:
        print(f"{k}\t{c}")
    print(f"# total: {len(offenders)}")
    spark.stop()


if __name__ == "__main__":
    main()
