#!/usr/bin/env python
"""Split a bench key's timed cost into phases (guide §1):

  build    — calling the plan function (py4j driver work, any eager
             collect/checkpoint inside the plan body)
  analyze  — resolving the logical plan (df.schema touch) + generating
             the executed plan string (optimizer + physical planning)
  exec     — the noop write of the already-planned DataFrame

Protocol mirrors bench.py: one full warm-up (build+write), then a
timed pass, clearCache between keys. The phase split shows WHERE a
key's bench seconds go, which persist()-vs-cut_lineage arguments need.

Usage: python scripts/phase_profile.py --keys k1,k2 [--legs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--legs", type=int, default=2)
    args = ap.parse_args()

    from ojo_daps_mirror_spark import plans
    from ojo_daps_mirror_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="phase-profile")
    keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    unknown = [k for k in keys if k not in plans.QUERIES]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    out: dict[str, dict] = {}
    for key in keys:
        # bench-identical warm-up
        plans.QUERIES[key](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        best = None
        for _ in range(args.legs):
            t0 = time.perf_counter()
            df = plans.QUERIES[key](spark, SF_DIR)
            t1 = time.perf_counter()
            df.schema  # resolve/analyze
            _ = df._jdf.queryExecution().executedPlan().toString()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rec = {
                "build": round(t1 - t0, 3),
                "analyze": round(t2 - t1, 3),
                "exec": round(t3 - t2, 3),
                "total": round(t3 - t0, 3),
            }
            if best is None or rec["total"] < best["total"]:
                best = rec
        out[key] = best
        spark.catalog.clearCache()
        print(f"{key}\t{json.dumps(best)}", flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
