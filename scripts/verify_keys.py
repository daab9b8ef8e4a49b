"""Verify query keys against their DuckDB oracles at sf0.01.

Usage:
  python scripts/verify_keys.py key1 key2 ...  [--sf DIR]
  python scripts/verify_keys.py --all [--sf DIR] [--json OUT.json]

Comparison shape = the DRIVER'S hash recipe (VERDICT r6 #6): columns
sorted by name, both frames through pandas ``astype(str)`` with NO
local rounding, rows sorted, md5 over the concatenation. Every
cross-engine rounding a query needs must live IN the query (round_eps
on the Spark side, sql_round in the oracle) — a rounding-boundary
drift that would fail the external hash-match now fails here too,
instead of being absorbed by a compare-side 6-dp round. Both value
hashes are recorded per key so a mismatch is diffable.

``--all`` sweeps every registered key (the driver samples only
~50/round; the per-round bench_out/parity_rNN.json artifact produced
with --json gives the judge the rest) and writes one record per key:
{status: ok|rows_only|mismatch..., rows: N, value_hash: ...}.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ojo_daps_mirror_spark import plans
from ojo_daps_mirror_spark.session import get_spark
from ojo_daps_mirror_spark.sources import TABLES

plans.load_all()


def _canon(pdf, columns):
    """Name-sorted columns → stringified values → sorted row tuples:
    the driver's canonicalisation, no compare-side rounding."""
    sub = pdf[columns].astype(str)
    return sorted(map(tuple, sub.values.tolist()))


def _value_hash(rows) -> str:
    h = hashlib.md5()
    for row in rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def verify_one(spark, con, key: str, sf: str) -> dict:
    """One key's parity record (never raises — errors are recorded)."""
    try:
        sdf = plans.QUERIES[key](spark, sf)
        spark_cols = sorted(sdf.columns)
        spark_pdf = sdf.toPandas()
    except Exception as exc:  # noqa: BLE001
        return {"status": "spark_error", "err": f"{type(exc).__name__}: {exc}"[:200]}
    if key not in plans.ORACLES:
        return {"status": "rows_only", "rows": len(spark_pdf)}
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
    if len(spark_pdf) != len(ddf):
        return {
            "status": "rowcount_mismatch",
            "spark_rows": len(spark_pdf),
            "oracle_rows": len(ddf),
        }
    left = _canon(spark_pdf, spark_cols)
    right = _canon(ddf, duck_cols)
    lh, rh = _value_hash(left), _value_hash(right)
    if lh != rh:
        diff = [(a, b) for a, b in zip(left, right) if a != b][:2]
        return {
            "status": "value_mismatch",
            "spark_hash": lh,
            "oracle_hash": rh,
            "example": repr(diff)[:300],
        }
    return {"status": "ok", "rows": len(spark_pdf), "value_hash": lh}


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
