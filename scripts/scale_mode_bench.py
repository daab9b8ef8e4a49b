"""Measure what SPARK_GRAFT_SCALE_MODE=approx actually buys.

Runs every swapped query (SURVEY §6.5) twice at $SPARK_GRAFT_SF_DIR
(default sf0.1) — exact mode then approx mode, warm-up + timed run
each, noop sink like bench.py — and records the per-key speedup.
The approx forms exist for 100 TB shapes (mergeable sketches, no
global sorts); at local SFs the wins are expected to concentrate in
the global-window swaps (NTILE / percent_rank / rank-boundary), where
the exact plan has a single-reducer total sort.

Usage: python scripts/scale_mode_bench.py
Writes bench_out/scale_mode_speedup.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

KEYS = [
    # percentile → percentile_approx
    "weekly_salary_spread",
    "skill_salary_spread",
    "chars_equidepth_histogram",
    "robust_scaling",
    "conversion_latency_quantiles",
    "corpus_stats",
    "mad_outliers",
    "ccnet_perplexity_buckets",
    "winsorized_stats",
    "dwell_time_by_type",
    "join_skew_report",
    "hodges_lehmann",
    # count distinct → HLL
    "data_profile_report",
    "rolling_distinct_users",
    # global-order windows → broadcast cut points
    "lift_table",
    "rfm_features",
    "quality_percentile_blend",
    "range_partition_plan",
]


def timed(plans, spark, key: str) -> float:
    fn = plans.QUERIES[key]
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    from ojo_daps_mirror_spark import plans
    from ojo_daps_mirror_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="ojo-scale-mode-bench")

    results: dict[str, dict] = {}
    for key in KEYS:
        os.environ.pop("SPARK_GRAFT_SCALE_MODE", None)
        exact = timed(plans, spark, key)
        os.environ["SPARK_GRAFT_SCALE_MODE"] = "approx"
        try:
            approx = timed(plans, spark, key)
        finally:
            os.environ.pop("SPARK_GRAFT_SCALE_MODE", None)
        results[key] = {
            "exact_sec": exact,
            "approx_sec": approx,
            "speedup": round(exact / max(approx, 1e-3), 2),
        }
        print(f"{key}: exact={exact}s approx={approx}s "
              f"x{results[key]['speedup']}", flush=True)

    rec = {
        "metric": "scale_mode_exact_vs_approx_seconds",
        "sf_dir": SF_DIR,
        "keys": results,
        "exact_total": round(sum(r["exact_sec"] for r in results.values()), 3),
        "approx_total": round(
            sum(r["approx_sec"] for r in results.values()), 3
        ),
    }
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    path = os.path.join(REPO, "bench_out", "scale_mode_speedup.json")
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps({"metric": rec["metric"],
                      "exact_total": rec["exact_total"],
                      "approx_total": rec["approx_total"]}))
    print(f"# record: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
