"""Round-over-round bench regression gate.

There is no external wall-time baseline to beat (the reference
pipeline publishes none), so the only real performance signal is
BENCH_r{N} vs BENCH_r{N-1} at equal scale factor. This script diffs
two bench records per query and exits non-zero on any regression
above the threshold.

Accepted file shapes, newest first:
- bench.py's own output line: {"metric", "value", "unit", "queries",
  "sf"}
- the driver's per-round record: {"n", "rc", "sf", "tail", "parsed"}
  where "tail" holds (a possibly front-truncated) bench output line —
  per-query pairs are regex-scavenged from whatever survived.

Usage: python scripts/bench_diff.py OLD.json NEW.json [--threshold 1.5]
Queries faster than FLOOR seconds in both rounds are ignored (JVM /
driver fixed costs dominate there and flap run-to-run).
"""

from __future__ import annotations

import argparse
import json
import re
import sys

FLOOR = 0.5  # s: below this in both rounds, timing is mostly overhead

_PAIR = re.compile(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)')


def load(path: str) -> tuple[dict[str, float], float | None]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: float(v) for k, v in d["queries"].items()}, d.get("sf")
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        p = d["parsed"]
        return {k: float(v) for k, v in p["queries"].items()}, p.get("sf")
    tail = d.get("tail", "")
    qstart = tail.find('"queries"')
    scope = tail[qstart:] if qstart >= 0 else tail
    pairs = {
        k: float(v)
        for k, v in _PAIR.findall(scope)
        if k not in ("metric", "value", "sf", "n", "rc", "cpus")
    }
    return pairs, d.get("sf")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    old_q, old_sf = load(args.old)
    new_q, new_sf = load(args.new)
    if old_sf is not None and new_sf is not None and old_sf != new_sf:
        print(f"sf mismatch ({old_sf} vs {new_sf}) — not comparable")
        return 2
    common = sorted(set(old_q) & set(new_q))
    if not common:
        print("no common queries to compare")
        return 2
    regressions, improved = [], 0
    for k in common:
        o, n = old_q[k], new_q[k]
        if o < FLOOR and n < FLOOR:
            continue
        if n > o * args.threshold and n - o > 0.25:
            regressions.append((k, o, n))
        elif n < o / args.threshold:
            improved += 1
    print(
        f"compared {len(common)} queries at sf={new_sf}: "
        f"{len(regressions)} regressions (> {args.threshold}x), "
        f"{improved} improved (> {args.threshold}x faster)"
    )
    for k, o, n in sorted(regressions, key=lambda t: t[2] / t[1], reverse=True):
        print(f"  REGRESSION {k}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
