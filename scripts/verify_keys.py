"""Verify specific query keys against their DuckDB oracles at sf0.01.

Usage: python scripts/verify_keys.py key1 key2 ...  [--sf /root/testdata/sf0.01]
Applies the same comparison shape as tests/test_duckdb_parity.py (and the
driver's t2 gate): row count, sorted column names, order-insensitive
6-dp-rounded values.
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


def main() -> int:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    spark = get_spark(app_name="verify-keys", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = 0
    for key in args:
        sdf = plans.QUERIES[key](spark, sf)
        spark_cols = sorted(sdf.columns)
        spark_rows = [r.asDict() for r in sdf.collect()]
        if key not in plans.ORACLES:
            print(f"{key}: rows-only ({len(spark_rows)} rows)")
            continue
        ddf = con.sql(plans.ORACLES[key]).df()
        duck_cols = sorted(ddf.columns)
        if spark_cols != duck_cols:
            print(f"{key}: COLUMN MISMATCH {spark_cols} vs {duck_cols}")
            bad += 1
            continue
        duck_rows = ddf.to_dict("records")
        if len(spark_rows) != len(duck_rows):
            print(f"{key}: ROWCOUNT MISMATCH {len(spark_rows)} vs {len(duck_rows)}")
            bad += 1
            continue
        left = _normalise(spark_rows, spark_cols)
        right = _normalise(duck_rows, duck_cols)
        if left != right:
            diff = [(a, b) for a, b in zip(left, right) if a != b][:3]
            print(f"{key}: VALUE MISMATCH e.g. {diff}")
            bad += 1
        else:
            print(f"{key}: ok ({len(spark_rows)} rows)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
