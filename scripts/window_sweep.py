"""Sweep every registered batch plan for UNPARTITIONED Window nodes.

Regenerates the offender set consumed by the allowlist in
tests/test_plan_guardrails.py (see ojo_daps_mirror_spark/planaudit.py
for the parser and the policy rationale). Run after plan changes:

    python scripts/window_sweep.py [SF_DIR]

SF_DIR defaults to $SPARK_GRAFT_SF_DIR, then /root/testdata/sf0.001.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import SparkSession

    from ojo_daps_mirror_spark import plans
    from ojo_daps_mirror_spark.planaudit import unpartitioned_windows

    plans.load_all()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sf = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    )
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
