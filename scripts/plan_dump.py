#!/usr/bin/env python
"""Dump .explain("formatted") for bench keys and summarize plan shape.

Usage:
    python scripts/plan_dump.py [--keys k1,k2] [--out plans/r07] [--suffix _before]

Writes plans/<out>/<key><suffix>.txt plus a one-line-per-key TSV summary
(exchange count, python-eval nodes, join strategies, scan filter pushdown)
to stdout — the triage surface for the optimization rounds (guide §1/§7.2).
Planning only: no query is executed.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="")
    ap.add_argument("--out", default="plans/r07")
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()

    from ojo_daps_mirror_spark import plans
    from ojo_daps_mirror_spark.session import get_spark

    plans.load_all()
    spark = get_spark(app_name="ojo-plan-dump")

    if args.keys:
        keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    else:
        import bench

        keys = [k for k in bench.BENCH_KEYS if k in plans.QUERIES]

    os.makedirs(args.out, exist_ok=True)
    print("key\texchanges\taqe\tpyeval\tjoins\tscans\tplan_lines")
    for key in keys:
        try:
            df = plans.QUERIES[key](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"{key}\tERROR: {type(exc).__name__}: {exc}"[:300])
            continue
        with open(os.path.join(args.out, f"{key}{args.suffix}.txt"), "w") as fh:
            fh.write(text)
        n_ex = len(re.findall(r"\bExchange\b", text))
        n_py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", text)
        )
        joins = sorted(
            set(
                re.findall(
                    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
                    text,
                )
            )
        )
        n_scan = len(re.findall(r"Scan parquet", text))
        print(
            f"{key}\t{n_ex}\t{'AdaptiveSparkPlan' in text}\t{n_py}\t"
            f"{','.join(j[:4] for j in joins)}\t{n_scan}\t{len(text.splitlines())}"
        )


if __name__ == "__main__":
    main()
