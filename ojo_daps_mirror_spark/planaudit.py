"""Physical-plan audit helpers shared by tests and scripts.

``unpartitioned_windows`` counts Window nodes whose partition spec is
empty in an ``explain("formatted")`` dump — the plan shape that funnels
its whole input through one task. Windows ordered by the rank
operator's ``__rank_pid__`` (a |shuffle partitions|-row frame by
construction) are exempt. See tests/test_plan_guardrails.py for the
policy and scripts/window_sweep.py for the regeneration sweep.
"""

from __future__ import annotations

import ast
import re

_EXPR_ID = re.compile(r"#\d+L?")

WINDOW_BLOCK = re.compile(
    r"\(\d+\) (Window|WindowGroupLimit)\n(?:[A-Z][^\n]*\n)*?Arguments: ([^\n]*)"
)

# Order spec that is EXACTLY the rank operator's partition-id column —
# the |shuffle partitions|-row offsets/carry frames of operators/rank.py.
# Deliberately not a substring test: a data-grain window over a frame
# that merely CARRIES the pid column must still be flagged.
_PID_ONLY_ORDER = re.compile(
    r"^\[\s*__rank_pid__#\d+L?"
    r"(\s+(ASC|DESC))?(\s+NULLS\s+(FIRST|LAST))?\s*\]$"
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
        groups = _top_level_groups(args)
        if (
            len(groups) == 2
            and _PID_ONLY_ORDER.match(groups[1])
        ):
            # operators/rank.py's per-partition offsets/carry window:
            # ordered by exactly __rank_pid__, so its input is the
            # |shuffle partitions|-row per-partition aggregate — a
            # bounded dimension by construction.
            continue
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


def _is_mod_zero_compare(node: ast.AST) -> bool:
    """``<expr> % <expr> == 0`` (or ``0 == <expr> % <expr>``) — the
    fixed-FRACTION subset predicate."""
    if not isinstance(node, ast.Compare) or len(node.ops) != 1:
        return False
    if not isinstance(node.ops[0], ast.Eq):
        return False
    left, right = node.left, node.comparators[0]
    for a, b in ((left, right), (right, left)):
        if (
            isinstance(a, ast.BinOp)
            and isinstance(a.op, ast.Mod)
            and isinstance(b, ast.Constant)
            and b.value == 0
        ):
            return True
    return False


def _chain_flags(
    expr: ast.AST, env: dict[str, ast.AST], seen: set[str]
) -> tuple[bool, bool]:
    """Walk a DataFrame method chain (following simple same-function
    assignments) and report (has % CONST == 0 filter, has .limit(k))."""
    has_mod = has_limit = False
    node = expr
    while True:
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            name = node.func.attr
            if name == "limit":
                has_limit = True
            if name in ("where", "filter"):
                for arg in node.args:
                    if any(_is_mod_zero_compare(n) for n in ast.walk(arg)):
                        has_mod = True
            node = node.func.value
        elif isinstance(node, ast.Attribute):
            node = node.value
        elif isinstance(node, ast.Name):
            if node.id in env and node.id not in seen:
                seen.add(node.id)
                m, l = _chain_flags(env[node.id], env, seen)
                has_mod, has_limit = has_mod or m, has_limit or l
            break
        else:
            break
    return has_mod, has_limit


def fraction_collects(source: str) -> list[int]:
    """Line numbers of ``.collect()`` / ``.toPandas()`` calls whose
    receiver chain contains a ``% <CONST> == 0`` subset filter with no
    intervening ``.limit(k)`` cap — a fixed FRACTION of the input
    shipped to the driver, i.e. an O(n) driver OOM at 100 TB (the
    knn_label_eval r3 regression class). Driver-bound panels must go
    through a fixed-count cap (vector_plans.query_panel)."""
    tree = ast.parse(source)
    hits: list[int] = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        env: dict[str, ast.AST] = {}
        collects: list[ast.Call] = []
        for node in ast.walk(fn):
            if isinstance(node, ast.Assign) and len(node.targets) == 1:
                t = node.targets[0]
                if isinstance(t, ast.Name):
                    env[t.id] = node.value
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in ("collect", "toPandas")
            ):
                collects.append(node)
        for call in collects:
            has_mod, has_limit = _chain_flags(call.func.value, env, set())
            if has_mod and not has_limit:
                hits.append(call.lineno)
    return sorted(hits)


