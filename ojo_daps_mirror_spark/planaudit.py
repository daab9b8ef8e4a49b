"""Physical-plan audit helpers shared by tests and scripts.

``unpartitioned_windows`` counts Window nodes whose partition spec is
empty in an ``explain("formatted")`` dump — the plan shape that funnels
its whole input through one task. Windows ordered by the rank
operator's ``__rank_pid__`` (a |shuffle partitions|-row frame by
construction) are exempt. See tests/test_plan_guardrails.py for the
policy and scripts/window_sweep.py for the regeneration sweep.
"""

from __future__ import annotations

import re

_EXPR_ID = re.compile(r"#\d+L?")

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
    windows: set[str] = set()
    unordered = 0
    seen_unordered: set[str] = set()
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
        # Dedupe on the expr-id-normalized spec: AQE / reuse sections
        # can print one Window node more than once, and the same
        # logical window re-printed must not inflate the audit count.
        norm = _EXPR_ID.sub("", args)
        if len(groups) == 2:
            windows.add(norm)
        elif norm not in seen_unordered:
            seen_unordered.add(norm)
            unordered += 1
    limited_norm = {_EXPR_ID.sub("", s) for s in limited}
    return unordered + sum(
        1
        for w in windows
        if not any(ln in w for ln in limited_norm)
    )


